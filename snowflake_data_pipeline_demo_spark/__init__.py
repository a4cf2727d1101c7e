"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ``cstanca1/snowflake_data_pipeline_demo``.

The reference is a declarative Snowflake ELT pipeline (stage -> pipe ->
streams -> tasks -> secure share). This package re-expresses every
construct Spark-first:

- ``session``    : SparkSession factory + session-context functions
- ``sources``    : stage helper (list/read/write/rm), parquet-backed
                   catalog/tables (the Delta-less table layer)
- ``functions``  : scalar/variant function layer (iff, object_construct,
                   variant path-casts, date helpers, masking)
- ``operators``  : merge (insert-only upsert), dedup (exact/MinHash+LSH/
                   SimHash/incremental), similarity search (brute/LSH/
                   IVF), text analysis (stats/quality/TF-IDF/logprob),
                   decontamination, chunking, sequence packing, curation
                   funnel, temporal joins (as-of/range), skew salting,
                   sampling (splits/mixtures), multimodal plumbing
- ``plans``      : reference-parity query builders (star joins, secure
                   view, monitoring dashboard, top-k, set ops)
- ``streaming``  : stream_data producer, pipe (file-stream ingest),
                   CDC streams + scheduled tasks, history ledgers

Everything here targets Spark's execution model: declarative DataFrame
plans for Catalyst, broadcast joins for dims, partitioned writes, and
Structured Streaming with per-consumer checkpoints for CDC.
"""

__version__ = "0.1.0"
