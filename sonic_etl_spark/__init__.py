"""sonic_etl_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine with the capabilities of blockchain-etl/sonic-etl.

The reference (read-only at /root/reference) is a fixed-pipeline native CDC
ingest engine: a coordinator chunks the change log into offset ranges
(indexing_coordinator/publish_ranges.py:122-146), N competing consumers
extract raw hex-quantity JSON and transform it into typed tables
(extractor_transformer/src/sonic_config/transformation/common.rs), results are
appended at-least-once and converged to exactly-one-row-per-key by periodic
MERGE dedupe (daily_qc_airflow/daily_dedupe_mainnet.py:26-81).

This package re-expresses those capabilities Spark-first:

- ``log``        deterministic change-event synthesis (the ordered change log)
- ``functions``  vectorized raw→typed decode (hex quantities, checked i64
                 narrowing, capped+lossless numeric duals, catalog decode)
- ``plans``      offset-range batch planner + checkpoint/manifest protocol
- ``sources``    transactional parquet table (snapshot log, atomic commits,
                 bucket-level copy-on-write MERGE) — Iceberg-shaped fallback
- ``operators``  dedup/LWW, merge-apply with salting, gap audit, count
                 invariants, plus training-data ops (dedup families,
                 similarity search, text analysis, multimodal plumbing)
- ``streaming``  resumable micro-batch replay driver

Nothing here is copied from the reference; file:line citations in docstrings
point at the behavior being re-implemented, not at code being translated.
"""

__version__ = "0.1.0"
