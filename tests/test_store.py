"""ValueStore merge/validation matrix, modeled on the reference's
``tests/node_values_test.py``: compatible/conflicting indices, partial
overlap, adapter mixing, order independence.
"""

import numpy as np
import pandas as pd
import pytest

from cyclebane_spark import ValueStore, as_dim_array
from cyclebane_spark.sources.arrays import GroupsArray


def arr(obj, axis_zero=0):
    return as_dim_array(obj, axis_zero=axis_zero)


def test_from_mapping_assigns_shared_default_dim():
    store = ValueStore.from_mapping({'a': [1, 2], 'b': [3, 4]}, axis_zero=0)
    assert list(store.indices) == ['dim_0']
    assert list(store.indices['dim_0']) == [0, 1]


def test_from_mapping_axis_zero_offsets_default_dim_name():
    store = ValueStore.from_mapping({'a': [1, 2]}, axis_zero=2)
    assert list(store.indices) == ['dim_2']


def test_from_mapping_shape_mismatch_raises():
    with pytest.raises(ValueError, match='must have the same shape'):
        ValueStore.from_mapping({'a': [1, 2], 'b': [1, 2, 3]}, axis_zero=0)


def test_merge_identical_readd_is_noop():
    store = ValueStore.from_mapping({'a': [1, 2]}, axis_zero=0)
    merged = store.merge({'a': arr([1, 2])})
    assert len(merged) == 1


def test_merge_same_name_different_values_same_index_replaces():
    store = ValueStore.from_mapping({'a': [1, 2]}, axis_zero=0)
    merged = store.merge({'a': arr([5, 6])})
    assert merged['a'].at({'dim_0': 0}) == 5


def test_merge_same_name_different_index_values_raises():
    store = ValueStore.from_mapping(
        {'a': pd.Series([1, 2], index=pd.Index([10, 20], name='i'))}, axis_zero=0
    )
    with pytest.raises(ValueError, match='already been mapped with different'):
        store.merge(
            {'a': arr(pd.Series([1, 2], index=pd.Index([30, 40], name='i')))}
        )


def test_merge_same_name_different_dims_raises():
    store = ValueStore.from_mapping({'a': [1, 2]}, axis_zero=0)
    with pytest.raises(ValueError, match="Node 'a' has already been mapped"):
        store.merge(
            {'a': arr(pd.Series([1, 2], index=pd.RangeIndex(2, name='x')))}
        )


def test_merge_conflicting_index_values_across_columns_raises():
    store = ValueStore.from_mapping(
        {'a': pd.Series([1, 2], index=pd.Index([0, 1], name='i'))}, axis_zero=0
    )
    with pytest.raises(ValueError, match='Conflicting index values'):
        store.merge(
            {'b': arr(pd.Series([9, 9], index=pd.Index([5, 6], name='i')))}
        )


def test_merge_compatible_index_across_columns_ok():
    store = ValueStore.from_mapping({'a': [1, 2]}, axis_zero=0)
    merged = store.merge({'b': arr([7, 8])})
    assert set(merged.keys()) == {'a', 'b'}
    assert list(merged.indices) == ['dim_0']


def test_merge_order_independence_for_compatible_stores():
    a = arr(pd.Series([1, 2], index=pd.Index([0, 1], name='i')))
    b = arr(pd.Series([3, 4], index=pd.Index([0, 1], name='i')))
    s1 = ValueStore().merge({'a': a}).merge({'b': b})
    s2 = ValueStore().merge({'b': b}).merge({'a': a})
    assert set(s1.keys()) == set(s2.keys())
    assert [list(v) for v in s1.indices.values()] == [
        list(v) for v in s2.indices.values()
    ]


def test_adapter_mixing_numpy_and_list_same_dim():
    store = ValueStore.from_mapping({'a': [1, 2, 3]}, axis_zero=0)
    merged = store.merge({'b': arr(np.array([4, 5, 6]))})
    assert list(merged.indices) == ['dim_0']


def test_2d_numpy_dims_and_indices():
    store = ValueStore.from_mapping({'a': np.arange(6).reshape(2, 3)}, axis_zero=0)
    assert list(store.indices) == ['dim_0', 'dim_1']
    assert list(store.indices['dim_1']) == [0, 1, 2]
    assert store['a'].at({'dim_0': 1, 'dim_1': 2}) == 5


def test_series_grouping_members():
    s = pd.Series(['x', 'x', 'y'], index=pd.RangeIndex(3, name='row'))
    groups = arr(s).grouped('label')
    assert isinstance(groups, GroupsArray)
    assert groups.labels == ['x', 'y']
    assert groups.members == [[0, 1], [2]]
    assert groups.inner_dim == 'row'
    assert list(groups.coords) == ['label']


def test_loc_rejects_non_slice():
    a = arr([1, 2, 3])
    with pytest.raises(ValueError, match='only accepts slices'):
        a.loc({'dim_0': 1})


def test_loc_rejects_unknown_dim():
    a = arr([1, 2, 3])
    with pytest.raises(ValueError, match='not a subset'):
        a.loc({'nope': slice(0, 1)})
