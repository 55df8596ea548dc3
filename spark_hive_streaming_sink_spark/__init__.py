"""PySpark-native streaming-ingest analytics engine.

A from-scratch rebuild of the capabilities of
``jerryshao/spark-hive-streaming-sink`` (a Structured Streaming sink that
writes micro-batches into partitioned warehouse tables transactionally —
see ``/root/reference``, SURVEY.md) re-expressed Spark-first:

- the sink itself (``streaming.sink``) as ``foreachBatch`` with a
  batch-id-keyed idempotent commit ledger (upgrades the reference's
  at-least-once semantics, ``HiveStreamWriter.scala:39-41``, to
  effective exactly-once),
- the full upstream pipeline operator surface (``operators/``),
- streaming ops (``streaming/ops``), and
- LLM-data-pipeline extensions: dedup, text analysis, similarity
  search, multimodal columns (``functions/``).

All query plans are declared with the DataFrame API and optimized by
Catalyst; no RDDs, no row-at-a-time Python in hot paths.
"""

__version__ = "0.1.0"

from .registry import QUERIES, QuerySpec, queries, oracle_sql  # noqa: F401
from .session import get_spark  # noqa: F401
from .io import load_table, register_views, TABLES  # noqa: F401
