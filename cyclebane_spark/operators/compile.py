"""Compile a plan-layer Graph into executable Spark DataFrames.

Where the reference expands the compact DAG into driver-memory node clones
(``/root/reference/src/cyclebane/graph.py:367-424``), this compiler keeps
every node *family* as one lazy DataFrame keyed by its dim columns:

- mapped source        -> long-form DataFrame ``(dim..., value)``
- compute node         -> join of parent frames on shared dim columns
                          (cross-join for independent dims — the "broadcast"
                          of chained maps), value = an expression over parent
                          values
- reduce node          -> ``groupBy(remaining dims).agg(...)`` — Catalyst
                          plans partial+final aggregation automatically
- groupby-reduce node  -> join with the label frame on the inner dim, then
                          ``groupBy(remaining dims + label)``
- reduce-all           -> global ``agg`` (single row)

The cartesian instance explosion therefore never materializes anywhere: a
family with dims (a, b) is a DataFrame with |a|x|b| *rows*, distributed.
At 100 TB, source families are :class:`SparkColumn` bindings onto parquet
tables and everything stays on the cluster.

Node implementations (``impls``) are looked up by original node name:

- ``callable(*cols) -> Column``    fast path, stays in whole-stage codegen
- ``str``                          for reduce nodes: a builtin agg name
                                   ('sum', 'mean', 'min', 'max', 'count',
                                   'collect_list', 'first', 'avg')
- ``('pandas', fn)``               vectorized pandas UDF over parent values
- missing                          identity (1 parent) / struct (n parents);
                                   reduce defaults to 'collect_list'
"""

from __future__ import annotations

import re
from collections.abc import Callable, Hashable, Mapping
from typing import Any

from ..plan.graph import Graph
from ..plan.keys import MappedNode
from ..plan.keys import base_name as _base
from ..plan.keys import node_dims as _dims
from ..sources.arrays import GroupsArray, SparkColumn, SparkGroups

_AGGS = {
    'sum', 'mean', 'avg', 'min', 'max', 'count',
    'collect_list', 'collect_set', 'first', 'stddev', 'variance',
}

VALUE_COL = 'value'


def _sanitize(name: Any) -> str:
    s = re.sub(r'[^0-9A-Za-z_]', '_', str(name))
    return s or 'dim'


class DimNames:
    """Stable dim -> column-name mapping (handles non-string dims)."""

    def __init__(self) -> None:
        self._cols: dict[Hashable, str] = {}

    def col(self, dim: Hashable) -> str:
        if dim not in self._cols:
            base = _sanitize(dim)
            if base == VALUE_COL:
                base = f'{base}_dim'
            col = base
            i = 1
            while col in self._cols.values():
                col = f'{base}_{i}'
                i += 1
            self._cols[dim] = col
        return self._cols[dim]


class SparkPlan:
    """Lazily compiled plan: one DataFrame per node family, memoized."""

    def __init__(
        self,
        spark: Any,
        graph: Graph,
        impls: Mapping[Hashable, Any] | None = None,
        *,
        persist_shared: bool = False,
    ):
        self._spark = spark
        self._graph = graph
        self._impls = dict(impls or {})
        self._dims = DimNames()
        self._frames: dict[Hashable, Any] = {}
        # Spark plans duplicate shared subtrees (no subplan sharing), so a
        # node feeding >1 children is recomputed once per consumer. With
        # persist_shared=True such frames are persist()ed — compute-once at
        # the cost of executor storage. Off by default: at small scale
        # recompute is cheaper than materialization.
        self._persist_shared = persist_shared

    # -- public -----------------------------------------------------------
    def frame(self, node: Hashable):
        """The DataFrame of a node family: dim columns + ``value``."""
        key = self._graph._resolve_key(node)
        return self._frame(key)

    __getitem__ = frame

    def dim_column(self, dim: Hashable) -> str:
        return self._dims.col(dim)

    # -- compilation --------------------------------------------------------
    def _frame(self, key: Hashable):
        if key in self._frames:
            return self._frames[key]
        df = self._build(key)
        if self._persist_shared and self._graph.dag.out_degree(key) > 1:
            df = df.persist()
        self._frames[key] = df
        return df

    def _build(self, key: Hashable):
        import pyspark.sql.functions as F

        dag = self._graph.dag
        store = self._graph.node_values
        name = _base(key)
        parents = dag.predecessors(key)
        array = store.get(name)

        if array is not None and array.is_grouping():
            return self._build_groupby_reduce(key, parents[0], array)
        if not parents:
            if array is not None:
                return self._source_frame(key, array)
            impl = self._impls.get(name)
            if impl is None:
                raise ValueError(
                    f"Source node '{name}' has neither mapped values nor an impl"
                )
            if callable(impl):
                return self._spark.range(1).select(impl().alias(VALUE_COL))
            return self._spark.range(1).select(F.lit(impl).alias(VALUE_COL))

        my_dims = set(_dims(key))
        if len(parents) == 1:
            reduced = set(_dims(parents[0])) - my_dims
            if reduced:
                return self._build_reduce(key, parents[0], reduced)
        return self._build_compute(key, parents)

    def _source_frame(self, key: Hashable, array: Any):
        if isinstance(array, SparkColumn):
            cols = [self._dims.col(d) for d in array.dims]
            df = array.df
            selected = [
                df[idx_col].alias(col)
                for idx_col, col in zip(array.index_cols, cols, strict=True)
            ]
            return df.select(*selected, df[array.value_col].alias(VALUE_COL))
        pdf = array.to_pandas_long()
        # to_pandas_long emits __dim{i} in the array's own dim order
        rename = {
            f'__dim{i}': self._dims.col(d) for i, d in enumerate(array.dims)
        }
        pdf = pdf.rename(columns=rename)
        return self._spark.createDataFrame(pdf[[*map(self._dims.col, array.dims), VALUE_COL]])

    def _joined_parents(self, parents: list[Hashable]):
        """Join parent frames on shared dim columns; cross-join when disjoint.

        Parents that are SparkColumn bindings onto the *same* DataFrame with
        the same index columns are coalesced into one projection of that
        DataFrame — no self-join, no shuffle, and no fan-out if the index
        isn't unique.

        Broadcast direction is chosen HERE, not left to the planner: a
        driver-backed source family (a swept param list, a label vector) was
        literally in driver memory, so it is always the build side —
        ``F.broadcast`` pins it. Left to itself the planner sees the
        createDataFrame side as unknown-size (defaultSizeInBytes) and
        happily builds the *parquet* side of a cross join instead; harmless
        on test data, fatal at 100 TB (it would broadcast the fact table).
        Cluster-backed (SparkColumn) and computed families are never hinted
        — AQE decides those from runtime stats.
        """
        frames = []
        consumed: set[int] = set()
        store = self._graph.node_values
        for i, p in enumerate(parents):
            if i in consumed:
                continue
            arr = store.get(_base(p))
            if isinstance(arr, SparkColumn):
                group = [
                    (j, q)
                    for j, q in enumerate(parents)
                    if j not in consumed
                    and isinstance(qa := store.get(_base(q)), SparkColumn)
                    and qa.df is arr.df
                    and qa.index_cols == arr.index_cols
                ]
                if len(group) > 1:
                    cols = [self._dims.col(d) for d in arr.index_cols]
                    sel = [
                        arr.df[c].alias(col)
                        for c, col in zip(arr.index_cols, cols, strict=True)
                    ]
                    for j, q in group:
                        qa = store.get(_base(q))
                        sel.append(
                            arr.df[qa.value_col].alias(self._value_alias(q))
                        )
                        consumed.add(j)
                    frames.append((arr.df.select(*sel), set(cols), False))
                    continue
            df = self._frame(p)
            pdims = [self._dims.col(d) for d in _dims(p)]
            # Driver-backed SOURCE families are known-small (they sat in
            # driver memory; only mapped sources have a store entry) —
            # computed and cluster-backed frames are not.
            small = arr is not None and not isinstance(arr, SparkColumn)
            frames.append(
                (
                    df.select(*pdims, df[VALUE_COL].alias(self._value_alias(p))),
                    set(pdims),
                    small,
                )
            )
        import pyspark.sql.functions as F

        out, out_dims, out_small = frames[0]
        for df, pdims, small in frames[1:]:
            shared = sorted(out_dims & pdims)
            if small and not out_small:
                df = F.broadcast(df)
            elif out_small and not small:
                out = F.broadcast(out)
            if shared:
                out = out.join(df, on=shared, how='inner')
            else:
                out = out.crossJoin(df)
            out_dims |= pdims
            out_small = out_small and small
        return out, [self._value_alias(p) for p in parents]

    def _value_alias(self, parent: Hashable) -> str:
        return f'__v_{_sanitize(_base(parent))}'

    def _build_compute(self, key: Hashable, parents: list[Hashable]):
        import pyspark.sql.functions as F

        df, value_cols = self._joined_parents(parents)
        impl = self._impls.get(_base(key))
        dims = [self._dims.col(d) for d in _dims(key)]
        in_cols = [F.col(c) for c in value_cols]
        if impl is None:
            value = in_cols[0] if len(in_cols) == 1 else F.struct(*in_cols)
        elif isinstance(impl, tuple) and impl[0] == 'pandas':
            from pyspark.sql.pandas.functions import pandas_udf

            fn = impl[1]
            rtype = impl[2] if len(impl) > 2 else 'double'
            udf = pandas_udf(fn, rtype)
            value = udf(*in_cols)
        elif callable(impl):
            value = impl(*in_cols)
        else:
            value = F.lit(impl)
        return df.select(*dims, value.alias(VALUE_COL))

    def _agg_expr(self, key: Hashable):
        import pyspark.sql.functions as F

        impl = self._impls.get(_base(key))
        if impl is None:
            impl = 'collect_list'
        if isinstance(impl, str):
            if impl not in _AGGS:
                raise ValueError(f'Unknown aggregate {impl!r} for node {key!r}')
            return getattr(F, 'avg' if impl == 'mean' else impl)(VALUE_COL)
        if callable(impl):
            return impl(F.col(VALUE_COL))
        raise TypeError(f'Bad reduce impl for {key!r}: {impl!r}')

    def _build_reduce(self, key: Hashable, parent: Hashable, reduced: set):
        df = self._frame(parent)
        keep = [self._dims.col(d) for d in _dims(key)]
        impl = self._impls.get(_base(key))
        if isinstance(impl, tuple) and impl[0] == 'pandas_agg':
            return self._build_pandas_reduce(df, keep, impl)
        agg = self._agg_expr(key).alias(VALUE_COL)
        if keep:
            return df.groupBy(*keep).agg(agg)
        return df.agg(agg)

    def _build_pandas_reduce(self, df, keep: list, impl: tuple):
        """Reduce with an arbitrary Python function over each group's values.

        ``impl = ('pandas_agg', fn[, return_type])`` — fn(pandas.Series) ->
        scalar, applied per group via applyInPandas (grouped Arrow batches).
        This is the UDAF escape hatch for reduce fns Spark's builtins can't
        express (cyclebane's downstream consumers attach arbitrary callables
        to reduce nodes). One shuffle on the kept dims; each group must fit
        in executor memory — for giant groups pre-combine with a builtin or
        use a streaming sketch instead.
        """
        import pandas as pd

        fn = impl[1]
        rtype = impl[2] if len(impl) > 2 else 'double'
        schema_parts = [
            f'`{c}` {df.schema[c].dataType.simpleString()}' for c in keep
        ]
        schema = ', '.join([*schema_parts, f'`{VALUE_COL}` {rtype}'])

        def apply(pdf: 'pd.DataFrame') -> 'pd.DataFrame':
            row = {c: [pdf[c].iloc[0]] for c in keep}
            row[VALUE_COL] = [fn(pdf[VALUE_COL])]
            return pd.DataFrame(row)

        if keep:
            return df.groupBy(*keep).applyInPandas(apply, schema)

        # reduce-all: a single group keyed by a constant, dropped afterwards
        def apply_all(pdf: 'pd.DataFrame') -> 'pd.DataFrame':
            return pd.DataFrame({VALUE_COL: [fn(pdf[VALUE_COL])]})

        return (
            df.withColumn('__g', F_lit_one())
            .groupBy('__g')
            .applyInPandas(
                lambda pdf: apply_all(pdf),
                f'`{VALUE_COL}` {rtype}',
            )
        )

    def _build_groupby_reduce(self, key: Hashable, parent: Hashable, grouping):
        df = self._frame(parent)
        group_col = self._dims.col(grouping.group_dim)
        inner_col = self._dims.col(grouping.inner_dim)
        labels = self._label_frame(grouping, inner_col, group_col)
        remaining = [
            self._dims.col(d)
            for d in _dims(key)
            if d != grouping.group_dim
        ]
        joined = df.join(labels, on=inner_col, how='inner')
        impl = self._impls.get(_base(key))
        if isinstance(impl, tuple) and impl[0] == 'pandas_agg':
            return self._build_pandas_reduce(
                joined.select(*remaining, group_col, VALUE_COL),
                [*remaining, group_col],
                impl,
            )
        agg = self._agg_expr(key).alias(VALUE_COL)
        return joined.groupBy(*remaining, group_col).agg(agg)

    def _label_frame(self, grouping, inner_col: str, group_col: str):
        if isinstance(grouping, SparkGroups):
            df = grouping.label_df
            return df.select(
                df[grouping.inner_col].alias(inner_col),
                df[grouping.label_col].alias(group_col),
            )
        rows = [
            (inner, label)
            for label, members in zip(
                grouping.labels, grouping.members, strict=True
            )
            for inner in members
        ]
        return self._spark.createDataFrame(rows, [inner_col, group_col])


def F_lit_one():
    import pyspark.sql.functions as F

    return F.lit(1)


def compile_graph(
    spark: Any,
    graph: Graph,
    impls: Mapping[Hashable, Any] | None = None,
    *,
    persist_shared: bool = False,
) -> SparkPlan:
    return SparkPlan(spark, graph, impls, persist_shared=persist_shared)


def _graph_compile(
    self: Graph, spark: Any, impls=None, *, persist_shared: bool = False
) -> SparkPlan:
    return SparkPlan(spark, self, impls, persist_shared=persist_shared)


# Attach as a method so users write graph.compile(spark, impls={...}).
Graph.compile = _graph_compile
