"""pyelt_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the load-cycle semantics of the reference ETL framework
(NLHEALTHCARE/PYELT: hash-based change detection, latest-per-key dedup,
hub/link/satellite splitting, SCD2 valid-from/valid-to upserts, delete
detection, additive schema evolution, run bookkeeping) as idiomatic Spark
DataFrame pipelines over change-event streams of multi-turn transcripts.

Package map
-----------
functions/   vectorized hash keys + hashdiffs, text analysis, vector math
operators/   latest-per-key dedup, SCD2 merge-apply, validation, doc dedup
sources/     deterministic change-event generator, CSV / fixed-length readers
storage/     bucket-partitioned copy-on-write lake table with a commit log
             (idempotent batch commits, partition-pruned merges, lineage)
plans/       the hub/sat/link vault pipeline (Pipeline/Pipe analog)
streaming/   microbatch tail runner (Structured Streaming foreachBatch)
"""

__version__ = "0.1.0"

from pyelt_spark.session import get_session  # noqa: F401
