"""cyclebane_spark — a PySpark-native task-graph analytics engine.

The plan layer (:class:`Graph`) reproduces the map/reduce/groupby/slicing
algebra of scipp/cyclebane; the Spark compiler executes node families as
DataFrames so the cartesian structure the reference expands in driver memory
stays distributed. The ``operators``/``functions``/``streaming`` subpackages
add the large-scale analytics surface (joins, windows, dedup, similarity
search, text analysis, streaming) on the same tables.
"""

from .operators.compile import SparkPlan, compile_graph
from .plan import graph  # noqa: F401  (submodule alias: cyclebane_spark.graph)
from .plan.graph import Graph, GroupbyGraph, LabelIndexer, PositionalIndexer
from .plan.keys import IndexValues, MappedNode, NodeName
from .plan.store import ValueStore
from .sources.arrays import (
    DimArray,
    GroupsArray,
    NdArray,
    SeqArray,
    SeriesArray,
    SparkColumn,
    SparkGroups,
    as_dim_array,
)

__all__ = [
    'DimArray',
    'Graph',
    'GroupbyGraph',
    'LabelIndexer',
    'GroupsArray',
    'IndexValues',
    'MappedNode',
    'NdArray',
    'NodeName',
    'PositionalIndexer',
    'SeqArray',
    'SeriesArray',
    'SparkColumn',
    'SparkGroups',
    'SparkPlan',
    'ValueStore',
    'compile_graph',
    'as_dim_array',
    'graph',
]

__version__ = '0.1.0'
