"""manifold_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (Guilherme-B/manifold: an Airflow + EMR-Spark + Redshift real-estate
listings warehouse), rebuilt as one idiomatic Spark substrate:

- ingest: time-partitioned listing JSON with a pinned schema contract
- clean:  null defaulting, HTML stripping, length capping, snake-casing
- stage:  hashed dimension staging sets + weekly stock fact
- scd2:   generic SCD-type-2 merge (expire + insert) on any business key
- dims:   generated 30-year date dimension
- facts:  surrogate-key resolution + fact append
- quality: non-empty and unique-active-row invariants

Beyond reference parity, `operators/` adds the large-scale training-data
pipeline surface: exact and fuzzy deduplication (MinHash-LSH, SimHash,
n-gram Jaccard), similarity search over embeddings, text analysis
(language id, quality scoring, tokenization, fingerprinting), and
multimodal binary-column plumbing.

Everything is DataFrame/Spark-SQL built-ins; Python UDFs appear only in
the Arrow-batched (Pandas UDF) multimodal path. Designed for Catalyst +
AQE at 100 TB scale: broadcast joins for dims, partition-pruned reads,
map-side partial aggregation, no driver-side loops.
"""

__version__ = "0.1.0"
