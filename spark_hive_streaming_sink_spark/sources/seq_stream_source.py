"""``format("seq-stream")`` — a Python Data Source streaming READER
(Spark 4 API), completing the Python-DS story next to the
``hive-streaming`` WRITER: the engine can both ingest from and land
into user-defined Python sources.

The source is a deterministic replayable sequence (the shape of a
partitioned queue / changelog feed): rows are generated from the
offset alone, so any micro-batch is reproducible after restart —
exactly the contract Structured Streaming expects from a real source
(Kafka's offset+partition model), demonstrated without a broker.

Scale posture: ``partitions()`` splits every offset range into
``N_SPLITS`` independent input partitions, so reads parallelize across
executors like Kafka topic-partitions; generation is O(rows) with no
driver involvement beyond offset arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SEQ_TOTAL = 4000  # rows the bounded stream emits before availableNow drains
N_SPLITS = 8

SEQ_SCHEMA = "id bigint, val bigint, tag string"


def seq_row(i: int) -> tuple:
    """The generating formula — shared by the reader and (re-stated in
    SQL) the DuckDB oracle."""
    return (i, (i * 37) % 1000, f"g{i % 4}")


@dataclass
class RangePartition(InputPartition):
    start: int
    end: int


class SeqStreamReader(DataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        return {"offset": SEQ_TOTAL}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return [RangePartition(lo, lo)]
        step = max(1, (hi - lo) // N_SPLITS)
        bounds = list(range(lo, hi, step)) + [hi]
        return [
            RangePartition(a, b) for a, b in zip(bounds, bounds[1:]) if b > a
        ]

    def read(self, partition: RangePartition):
        for i in range(partition.start, partition.end):
            yield seq_row(i)

    def commit(self, end: dict) -> None:
        pass  # offsets are derivable; nothing to persist


class SeqStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "seq-stream"

    def schema(self) -> str:
        return SEQ_SCHEMA

    def streamReader(self, schema: StructType) -> SeqStreamReader:
        return SeqStreamReader()
