"""Node-key types for the task-graph plan layer.

These are the public key types a user sees when inspecting a compact plan
(``MappedNode``) or an expanded graph (``NodeName`` carrying ``IndexValues``).

Behavioral parity with the reference library scipp/cyclebane
(``src/cyclebane/graph.py:56-124``): equality/hashing by value, ``merge_index``
prepending the other operand's axes, and the ``name(dim=value, ...)`` string
form. The implementation here is independent; only the observable contract is
shared.
"""

from __future__ import annotations

from collections.abc import Hashable
from dataclasses import dataclass

IndexName = Hashable
IndexValue = Hashable


@dataclass(frozen=True, slots=True)
class IndexValues:
    """An ordered (axes, values) pair locating one instance of a node family."""

    axes: tuple[IndexName, ...]
    values: tuple[IndexValue, ...]

    @staticmethod
    def from_coords(coords: dict[IndexName, IndexValue]) -> IndexValues:
        return IndexValues(axes=tuple(coords), values=tuple(coords.values()))

    def to_tuple(self) -> tuple[tuple[IndexName, IndexValue], ...]:
        return tuple(zip(self.axes, self.values, strict=True))

    def to_dict(self) -> dict[IndexName, IndexValue]:
        return dict(self.to_tuple())

    def merge_index(self, other: IndexValues) -> IndexValues:
        # New (outer) axes go first, matching numpy.stack axis-0 semantics.
        return IndexValues(
            axes=other.axes + self.axes, values=other.values + self.values
        )

    def __str__(self) -> str:
        return ', '.join(
            f'{a}={v}' for a, v in zip(self.axes, self.values, strict=True)
        )

    def __len__(self) -> int:
        return len(self.axes)


@dataclass(frozen=True, slots=True)
class NodeName:
    """Key of one concrete instance of a node family in an expanded graph."""

    name: Hashable
    index: IndexValues

    def merge_index(self, other: IndexValues) -> NodeName:
        return NodeName(name=self.name, index=self.index.merge_index(other))

    def __str__(self) -> str:
        return f'{self.name}({self.index})'


@dataclass(frozen=True, slots=True)
class MappedNode:
    """Compact key for an entire family of mapped nodes (unexpanded).

    ``indices`` is in *prepend* order: the most recently added dimension is
    first, like ``numpy.stack`` along axis 0.
    """

    name: Hashable
    indices: tuple[IndexName, ...]


def mapped(node: Hashable, new_dims: tuple[IndexName, ...]) -> MappedNode:
    """Wrap (or re-wrap) a node key with additional dims prepended."""
    if isinstance(node, MappedNode):
        return MappedNode(name=node.name, indices=new_dims + node.indices)
    return MappedNode(name=node, indices=new_dims)


def base_name(node: Hashable) -> Hashable:
    """The original (pre-map) name of a node key."""
    return node.name if isinstance(node, MappedNode) else node


def node_dims(node: Hashable) -> tuple[IndexName, ...]:
    """Dims of a node key (prepend order); empty for unmapped nodes."""
    return node.indices if isinstance(node, MappedNode) else ()
