"""Groupby parity tests, ported from ``/root/reference/tests/groupby_test.py``:
group structure, no cross-group edges, chained groupbys, dtypes, topologies,
and 2-D reduce/groupby interplay.
"""

import networkx as nx
import pandas as pd
import pytest

import cyclebane_spark as cb


def idx(name, *index, offset=None, dims=('dim_0', 'dim_1')):
    return cb.NodeName(
        name, cb.IndexValues(dims[offset : len(index) + (offset or 0)], tuple(index))
    )


def chain(*nodes):
    g = nx.DiGraph()
    for u, v in zip(nodes, nodes[1:], strict=False):
        g.add_edge(u, v)
    return g


def test_basic_map_groupby_reduce_structure():
    g = nx.DiGraph([('a', 'c'), ('b', 'c')])
    df = pd.DataFrame({'a': [11, 22, 33], 'b': ['a', 'a', 'b']})
    grouped = cb.Graph(g).map(df).groupby('b').reduce('c', name='d')
    result = grouped.to_networkx()

    assert result.nodes[idx('a', 0)] == {'value': 11}
    assert result.nodes[idx('b', 0)] == {'value': 'a'}
    assert result.nodes[idx('c', 0)] == {}
    assert result.nodes[idx('d', 'a', dims=('b',))] == {}

    assert result.has_edge(idx('c', 0), idx('d', 'a', dims=('b',)))
    assert result.has_edge(idx('c', 1), idx('d', 'a', dims=('b',)))
    assert result.has_edge(idx('c', 2), idx('d', 'b', dims=('b',)))
    assert not result.has_edge(idx('c', 0), idx('d', 'b', dims=('b',)))
    assert not result.has_edge(idx('c', 1), idx('d', 'b', dims=('b',)))
    assert not result.has_edge(idx('c', 2), idx('d', 'a', dims=('b',)))


def test_groupby_group_shapes():
    # uneven groups: 5 + 1
    df = pd.DataFrame(
        {'a': [1, 2, 3, 4, 5, 6], 'param': ['x', 'x', 'x', 'x', 'x', 'y']}
    )
    grouped = cb.Graph(chain('a', 'b')).map(df).groupby('param').reduce('b', name='c')
    result = grouped.to_networkx()
    to_x = [e for e in result.edges if e[1] == idx('c', 'x', dims=('param',))]
    to_y = [e for e in result.edges if e[1] == idx('c', 'y', dims=('param',))]
    assert len(to_x) == 5
    assert len(to_y) == 1


def test_groupby_single_group():
    df = pd.DataFrame({'a': [1, 2, 3, 4], 'param': ['same'] * 4})
    grouped = cb.Graph(chain('a', 'b')).map(df).groupby('param').reduce('b', name='c')
    result = grouped.to_networkx()
    c_nodes = [
        n for n in result.nodes if isinstance(n, cb.NodeName) and n.name == 'c'
    ]
    assert c_nodes == [idx('c', 'same', dims=('param',))]
    for i in range(4):
        assert result.has_edge(idx('b', i), idx('c', 'same', dims=('param',)))


def test_groupby_single_element_per_group():
    df = pd.DataFrame({'a': [1, 2, 3], 'param': ['x', 'y', 'z']})
    grouped = cb.Graph(chain('a', 'b')).map(df).groupby('param').reduce('b', name='c')
    result = grouped.to_networkx()
    assert result.has_edge(idx('b', 0), idx('c', 'x', dims=('param',)))
    assert result.has_edge(idx('b', 1), idx('c', 'y', dims=('param',)))
    assert result.has_edge(idx('b', 2), idx('c', 'z', dims=('param',)))


@pytest.mark.parametrize(
    ('labels', 'expect'),
    [
        ([0, 0, 1, 1], [0, 1]),
        ([1.5, 1.5, 2.5, 2.5], [1.5, 2.5]),
        (['x', 'x', 'y', 'y'], ['x', 'y']),
    ],
)
def test_groupby_label_dtypes(labels, expect):
    df = pd.DataFrame({'a': [10, 20, 30, 40], 'group': labels})
    grouped = cb.Graph(chain('a', 'b')).map(df).groupby('group').reduce('b', name='c')
    result = grouped.to_networkx()
    for label in expect:
        assert idx('c', label, dims=('group',)) in result.nodes
    assert result.has_edge(idx('b', 0), idx('c', expect[0], dims=('group',)))
    assert result.has_edge(idx('b', 3), idx('c', expect[1], dims=('group',)))


def test_groupby_with_named_index():
    df = pd.DataFrame({'a': [10, 20, 30], 'param': ['x', 'x', 'y']})
    df.index.name = 'my_index'
    grouped = cb.Graph(chain('a', 'b')).map(df).groupby('param').reduce('b', name='c')
    result = grouped.to_networkx()
    assert idx('a', 0, dims=('my_index',)) in result.nodes
    assert idx('c', 'x', dims=('param',)) in result.nodes


def test_groupby_error_with_non_pandas_type():
    graph = cb.Graph(chain('a', 'b')).map({'a': [1, 2, 3]})
    with pytest.raises(NotImplementedError, match='only implemented for Pandas'):
        graph.groupby('a')


def test_groupby_on_nonexistent_node_raises_KeyError():
    graph = cb.Graph(chain('a', 'b')).map(pd.DataFrame({'a': [1, 2, 3]}))
    with pytest.raises(KeyError):
        graph.groupby('nonexistent')


def test_groupby_reduce_with_name_conflict():
    df = pd.DataFrame({'a': [1, 2, 3], 'param': ['x', 'x', 'y']})
    graph = cb.Graph(chain('a', 'b')).map(df)
    with pytest.raises(ValueError, match='already been mapped'):
        graph.groupby('param').reduce('b', name='a')


def test_groupby_with_multiple_predecessors():
    g = nx.DiGraph([('a', 'c'), ('b', 'c')])
    df = pd.DataFrame({'a': [1, 2, 3], 'b': [10, 20, 30], 'param': ['x', 'x', 'y']})
    grouped = cb.Graph(g).map(df).groupby('param').reduce('c', name='d')
    result = grouped.to_networkx()
    assert result.has_edge(idx('a', 0), idx('c', 0))
    assert result.has_edge(idx('b', 0), idx('c', 0))
    assert result.has_edge(idx('c', 0), idx('d', 'x', dims=('param',)))
    assert result.has_edge(idx('c', 1), idx('d', 'x', dims=('param',)))
    assert result.has_edge(idx('c', 2), idx('d', 'y', dims=('param',)))


def test_groupby_on_intermediate_node():
    df = pd.DataFrame({'a': [1, 2, 3, 4], 'param': ['x', 'x', 'y', 'y']})
    grouped = (
        cb.Graph(chain('a', 'b', 'c')).map(df).groupby('param').reduce('c', name='d')
    )
    result = grouped.to_networkx()
    assert result.has_edge(idx('a', 0), idx('b', 0))
    assert result.has_edge(idx('b', 0), idx('c', 0))
    assert result.has_edge(idx('c', 0), idx('d', 'x', dims=('param',)))
    assert result.has_edge(idx('c', 1), idx('d', 'x', dims=('param',)))


def test_groupby_with_attrs():
    df = pd.DataFrame({'a': [1, 2, 3], 'param': ['x', 'x', 'y']})
    grouped = (
        cb.Graph(chain('a', 'b'))
        .map(df)
        .groupby('param')
        .reduce('b', name='c', attrs={'custom': 'value'})
    )
    result = grouped.to_networkx()
    assert result.nodes[idx('c', 'x', dims=('param',))]['custom'] == 'value'
    assert result.nodes[idx('c', 'y', dims=('param',))]['custom'] == 'value'


def test_groupby_combined_with_regular_reduce():
    g = nx.DiGraph([('a', 'b'), ('c', 'd')])
    df = pd.DataFrame({'a': [1, 2, 3], 'c': [10, 20, 30], 'param': ['x', 'x', 'y']})
    graph = cb.Graph(g).map(df)
    reduced = graph.reduce('b', name='b_reduced')
    grouped = reduced.groupby('param').reduce('d', name='d_grouped')
    result = grouped.to_networkx()
    assert 'b_reduced' in result.nodes
    assert idx('d_grouped', 'x', dims=('param',)) in result.nodes
    assert idx('d_grouped', 'y', dims=('param',)) in result.nodes


def test_groupby_preserves_node_values():
    g = nx.DiGraph([('a', 'b'), ('param', 'b')])
    df = pd.DataFrame({'a': [11, 22, 33], 'param': ['x', 'x', 'y']})
    grouped = cb.Graph(g).map(df).groupby('param').reduce('b', name='c')
    result = grouped.to_networkx()
    assert result.nodes[idx('a', 0)]['value'] == 11
    assert result.nodes[idx('param', 2)]['value'] == 'y'


def test_groupby_diamond_pattern():
    g = nx.DiGraph([('a', 'b'), ('a', 'c'), ('b', 'd'), ('c', 'd')])
    df = pd.DataFrame({'a': [1, 2, 3, 4], 'param': ['x', 'x', 'y', 'y']})
    grouped = cb.Graph(g).map(df).groupby('param').reduce('d', name='e')
    result = grouped.to_networkx()
    assert result.has_edge(idx('a', 0), idx('b', 0))
    assert result.has_edge(idx('a', 0), idx('c', 0))
    assert result.has_edge(idx('b', 0), idx('d', 0))
    assert result.has_edge(idx('c', 0), idx('d', 0))
    assert idx('e', 'x', dims=('param',)) in result.nodes


def test_groupby_with_multiple_source_nodes():
    g = nx.DiGraph([('a', 'c'), ('b', 'c')])
    df = pd.DataFrame({'a': [1, 2], 'b': [10, 20], 'param': ['x', 'y']})
    grouped = cb.Graph(g).map(df).groupby('param').reduce('c', name='d')
    result = grouped.to_networkx()
    assert result.has_edge(idx('c', 0), idx('d', 'x', dims=('param',)))
    assert result.has_edge(idx('c', 1), idx('d', 'y', dims=('param',)))


def test_group_twice_in_same_path():
    g1 = nx.DiGraph([('a', 'c'), ('param1', 'c'), ('c', 'd')])
    g2 = nx.DiGraph([('e', 'f'), ('param2', 'f')])

    grouped = (
        cb.Graph(g1)
        .map(pd.DataFrame({'a': [11, 22, 33, 44], 'param1': ['x', 'x', 'y', 'z']}))
        .groupby('param1')
        .reduce('d', name='grouped-d')
    )
    mapped = cb.Graph(g2).map(
        pd.DataFrame(
            {'e': [1, 2, 3], 'param2': [0, 1, 1], 'param1': ['x', 'y', 'z']}
        ).set_index('param1')
    )
    mapped['e'] = grouped
    grouped_twice = mapped.groupby('param2').reduce('f', name='grouped-f')
    result = grouped_twice.to_networkx()

    assert result.nodes[idx('grouped-f', 0, dims=('param2',))] == {}
    assert result.nodes[idx('grouped-f', 1, dims=('param2',))] == {}

    assert result.nodes[idx('param2', 'x', dims=('param1',))] == {'value': 0}
    assert result.nodes[idx('param2', 'y', dims=('param1',))] == {'value': 1}
    assert result.nodes[idx('param2', 'z', dims=('param1',))] == {'value': 1}
    assert result.nodes[idx('e', 'x', dims=('param1',))] == {}
    assert idx('grouped-d', 'x', dims=('param1',)) not in result.nodes

    assert result.nodes[idx('a', 0)] == {'value': 11}
    assert result.nodes[idx('param1', 3)] == {'value': 'z'}

    # dim_0 chain structure
    assert result.has_edge(idx('a', 0), idx('c', 0))
    assert result.has_edge(idx('param1', 0), idx('c', 0))
    assert result.has_edge(idx('c', 0), idx('d', 0))

    # param1 structure in the second graph
    assert result.has_edge(
        idx('param2', 'x', dims=('param1',)), idx('f', 'x', dims=('param1',))
    )

    # first grouping: dim_0 -> param1
    assert result.has_edge(idx('d', 0), idx('e', 'x', dims=('param1',)))
    assert result.has_edge(idx('d', 1), idx('e', 'x', dims=('param1',)))
    assert result.has_edge(idx('d', 2), idx('e', 'y', dims=('param1',)))
    assert result.has_edge(idx('d', 3), idx('e', 'z', dims=('param1',)))

    # second grouping: param1 -> param2
    assert result.has_edge(
        idx('f', 'x', dims=('param1',)), idx('grouped-f', 0, dims=('param2',))
    )
    assert result.has_edge(
        idx('f', 'y', dims=('param1',)), idx('grouped-f', 1, dims=('param2',))
    )
    assert result.has_edge(
        idx('f', 'z', dims=('param1',)), idx('grouped-f', 1, dims=('param2',))
    )


def test_three_groupby_operations_in_sequence():
    g1, g2, g3 = chain('a', 'b'), chain('c', 'd'), chain('e', 'f')
    grouped1 = (
        cb.Graph(g1)
        .map(pd.DataFrame({'a': [1, 2, 3, 4], 'p1': ['x', 'x', 'y', 'y']}))
        .groupby('p1')
        .reduce('b', name='gb1')
    )
    mapped2 = cb.Graph(g2).map(
        pd.DataFrame({'c': [10, 20], 'p1': ['x', 'y'], 'p2': [0, 1]}).set_index('p1')
    )
    mapped2['c'] = grouped1['gb1']
    grouped2 = mapped2.groupby('p2').reduce('d', name='gb2')
    mapped3 = cb.Graph(g3).map(
        pd.DataFrame({'e': [100, 200], 'p2': [0, 1], 'p3': ['A', 'B']}).set_index('p2')
    )
    mapped3['e'] = grouped2['gb2']
    grouped3 = mapped3.groupby('p3').reduce('f', name='gb3')
    result = grouped3.to_networkx()
    assert idx('gb3', 'A', dims=('p3',)) in result.nodes
    assert idx('gb3', 'B', dims=('p3',)) in result.nodes


def test_regular_reduce_then_groupby():
    df = pd.DataFrame({'a': [1, 2, 3, 4], 'param': ['x', 'x', 'y', 'y']})
    graph = cb.Graph(chain('a', 'b', 'c')).map(df)
    reduced = graph.reduce('b', name='b_reduced')
    grouped = reduced.groupby('param').reduce('c', name='c_grouped')
    result = grouped.to_networkx()
    assert 'b_reduced' in result.nodes
    assert idx('c_grouped', 'x', dims=('param',)) in result.nodes


def test_2d_node_regular_reduce_then_groupby_reduce():
    g = nx.DiGraph([('a', 'c'), ('b', 'c')])
    mapped = cb.Graph(g).map({'a': [1, 2, 3]}).map({'b': [10, 20]})
    reduced = mapped.reduce('c', name='reduced_c', index='dim_1')
    reduced = reduced.map(
        pd.DataFrame({'param': ['x', 'x', 'y']}).set_index(
            pd.RangeIndex(3, name='dim_0')
        )
    )
    grouped = reduced.groupby('param').reduce('reduced_c', name='final')
    result = grouped.to_networkx()
    assert idx('final', 'x', dims=('param',)) in result.nodes
    assert idx('final', 'y', dims=('param',)) in result.nodes
    assert idx('reduced_c', 0, dims=('dim_0',)) in result.nodes
    assert result.has_edge(
        idx('reduced_c', 0, dims=('dim_0',)), idx('final', 'x', dims=('param',))
    )
    assert result.has_edge(
        idx('reduced_c', 1, dims=('dim_0',)), idx('final', 'x', dims=('param',))
    )
    assert result.has_edge(
        idx('reduced_c', 2, dims=('dim_0',)), idx('final', 'y', dims=('param',))
    )


def test_2d_node_groupby_then_regular_reduce():
    g = nx.DiGraph([('a', 'c'), ('b', 'c')])
    df = pd.DataFrame({'a': [1, 2, 3], 'param': ['x', 'x', 'y']})
    graph = cb.Graph(g).map(df).map({'b': [10, 20]})
    grouped = graph.groupby('param').reduce('c', name='grouped_c')
    final = grouped.reduce('grouped_c', name='final', index='dim_1')
    result = final.to_networkx()

    assert idx('final', 'x', dims=('param',)) in result.nodes
    assert idx('final', 'y', dims=('param',)) in result.nodes
    # NodeName axes follow catalog order: (dim_1, param), not (param, dim_1)
    for d1 in (0, 1):
        for p in ('x', 'y'):
            assert idx('grouped_c', d1, p, dims=('dim_1', 'param')) in result.nodes
            assert result.has_edge(
                idx('grouped_c', d1, p, dims=('dim_1', 'param')),
                idx('final', p, dims=('param',)),
            )
