"""fluss_datafusion_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of zuston/fluss-datafusion.

The reference (see /root/reference, SURVEY.md) is a Rust CLI that federates
Apache Fluss tables into Apache DataFusion.  This package rebuilds that
capability surface Spark-first:

- catalog/        table registry with PK / partition / bucket metadata,
                  parquet-backed storage (reference: src/catalog/*.rs)
- sql/            SHOW/DESCRIBE rewriter + dialect helpers
                  (reference: src/sql/*.rs)
- operators/      scan, PK lookup, upsert write path, plus the
                  LLM-data-pipeline operators (dedup, similarity, as-of,
                  sessionize) the reference lacks
- functions/      text analysis, vector math, multimodal column helpers
- streaming/      Structured Streaming layer for log-table semantics
                  (reference models streams as bounded snapshots;
                  we expose real watermark/window streaming)
- cli.py          REPL + -e mode (reference: src/cli.rs, src/main.rs)

Everything here is stock PySpark (DataFrame / SQL / Catalyst / Structured
Streaming); no RDD-level code and no driver-side row loops in any hot path.
"""

from fluss_datafusion_spark.catalog.catalog import ConcurrentWriteConflict
from fluss_datafusion_spark.session import EngineSession, build_spark

__all__ = ["ConcurrentWriteConflict", "EngineSession", "build_spark"]
__version__ = "0.1.0"
