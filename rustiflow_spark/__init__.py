"""rustiflow_spark — a PySpark-native flow-feature extraction engine.

A from-scratch re-expression of the capabilities of idlab-discover/RustiFlow
(reference at /root/reference, studied read-only) as an idiomatic Spark
DataFrame pipeline:

    events -> canonical biflow key -> shuffle by key -> Arrow-vectorized
    sessionization kernel (active/idle timeout + TCP lifecycle cuts) ->
    per-session feature vectors (CIC / CIDDS / NF / RustiFlow schemas) ->
    derived scalar features as Catalyst column expressions -> sink

plus the training-data extensions a 100 TB pipeline needs: as-of joins,
lag/lead/backfill window features, dedup (exact / MinHash-LSH / SimHash),
similarity search, text analysis, and checkpoint/resume manifests.

Nothing here is a port: the reference is a single-threaded-per-shard Rust
dataflow (rustiflow/src/flow_table.rs); this engine expresses the same
semantics as declarative Spark plans with vectorized NumPy kernels only where
per-key ordered state is genuinely required.
"""

from rustiflow_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
