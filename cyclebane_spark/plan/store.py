"""The value store: node name -> DimArray, plus the global dim catalog.

Enforces the reference's plan-construction invariants
(``/root/reference/src/cyclebane/node_values.py:54-117``):

- a node may not be mapped twice with different data;
- all arrays in one map call must share one shape;
- two occurrences of one index name must carry identical index values
  anywhere in the graph (global dim-catalog consistency).

Validation is eager for driver-memory arrays and deferred for Spark-backed
arrays (comparing lazy coords would require a cluster action; the compiled
plan joins on the index columns, so inconsistencies surface as empty joins
rather than silent wrong answers).
"""

from __future__ import annotations

from collections.abc import Hashable, Iterable, Mapping
from typing import Any

from ..sources.arrays import DimArray, LazyCoords, as_dim_array

IndexName = Hashable
IndexValue = Hashable


def _eager(values: Iterable[IndexValue] | LazyCoords) -> list[IndexValue] | None:
    if isinstance(values, LazyCoords):
        return None
    return list(values)


class ValueStore:
    """Insertion-ordered mapping of node name -> DimArray with validation."""

    def __init__(self) -> None:
        self._arrays: dict[Hashable, DimArray] = {}

    @staticmethod
    def from_mapping(values: Mapping[Hashable, Any], *, axis_zero: int) -> ValueStore:
        arrays = {
            key: as_dim_array(value, axis_zero=axis_zero)
            for key, value in values.items()
        }
        shapes = set()
        for array in arrays.values():
            try:
                shapes.add(array.shape)
            except TypeError:
                pass  # lazy (Spark-backed) arrays don't participate
        if len(shapes) > 1:
            raise ValueError(
                'All value sequences in a map operation must have the same shape. '
                'Use multiple map operations if necessary.'
            )
        store = ValueStore()
        for key, array in arrays.items():
            store.set(key, array)
        return store

    # -- mapping protocol ---------------------------------------------------
    def __contains__(self, key: Hashable) -> bool:
        return key in self._arrays

    def __iter__(self):
        return iter(self._arrays)

    def __len__(self) -> int:
        return len(self._arrays)

    def get(self, key: Hashable) -> DimArray | None:
        return self._arrays.get(key)

    def __getitem__(self, key: Hashable) -> DimArray:
        return self._arrays[key]

    def keys(self):
        return self._arrays.keys()

    def items(self):
        return self._arrays.items()

    def discard(self, key: Hashable) -> None:
        self._arrays.pop(key, None)

    def rename(self, old: Hashable, new: Hashable) -> None:
        if old in self._arrays:
            array = self._arrays.pop(old)
            self._arrays[new] = array

    def copy(self) -> ValueStore:
        out = ValueStore()
        out._arrays = dict(self._arrays)
        return out

    def subset(self, keep: Iterable[Hashable]) -> ValueStore:
        keep_set = set(keep)
        out = ValueStore()
        out._arrays = {k: v for k, v in self._arrays.items() if k in keep_set}
        return out

    def replace(self, key: Hashable, array: DimArray) -> None:
        """Swap a node's array without validation (used by slicing)."""
        assert key in self._arrays
        self._arrays[key] = array

    # -- validated insertion --------------------------------------------------
    def set(self, key: Hashable, array: DimArray) -> None:
        old = self._arrays.get(key)
        if old is not None:
            if old.equals(array):
                return
            if old.dims == array.dims:
                for dim in old.dims:
                    old_idx = _eager(old.coords[dim])
                    new_idx = _eager(array.coords[dim])
                    if old_idx is None or new_idx is None:
                        continue
                    if old_idx != new_idx:
                        raise ValueError(
                            f"Node '{key}' has already been mapped with different "
                            f"indices: existing {old_idx} vs new {new_idx}"
                        )
                self._arrays[key] = array
                return
            raise ValueError(f"Node '{key}' has already been mapped")

        catalog = self.indices
        for dim, new_values in array.coords.items():
            if dim in catalog:
                old_idx = _eager(catalog[dim])
                new_idx = _eager(new_values)
                if old_idx is None or new_idx is None:
                    continue
                if old_idx != new_idx:
                    raise ValueError(
                        f'Conflicting index values for index name "{dim}" of {key}: '
                        f'existing {old_idx} vs new {new_idx}'
                    )
        self._arrays[key] = array

    def merge(self, arrays: Mapping[Hashable, DimArray] | ValueStore) -> ValueStore:
        out = self.copy()
        for key, array in (
            arrays.items() if not isinstance(arrays, ValueStore) else arrays.items()
        ):
            out.set(key, array)
        return out

    # -- dim catalog ----------------------------------------------------------
    @property
    def indices(self) -> dict[IndexName, Iterable[IndexValue]]:
        out: dict[IndexName, Iterable[IndexValue]] = {}
        for array in self._arrays.values():
            for dim, values in array.coords.items():
                if dim not in out:
                    out[dim] = values
        return out
