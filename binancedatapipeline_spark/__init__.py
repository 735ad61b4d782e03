"""binancedatapipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference Binance market-data pipeline
(albusmaxgrangerthu/binancedatapipeline) on Apache Spark:

- relational table model with declared schemas and primary keys
  (``catalog.TableSpec``), stored as parquet;
- incremental PK-upsert ingestion semantics (``operators.upsert``);
- the analytics surface: equi/theta joins, grouped aggregation,
  LAG/LEAD offset windows, rolling weighted-moving-average windows,
  dedup-by-key, CTE pipelines, gap detection (``plans/``);
- scheduled micro-batch lifecycle via Structured Streaming
  (``streaming/``);
- plus large-scale training-data operations (dedup, similarity
  search, text analysis, multimodal plumbing) in ``textops/`` and
  ``operators/``.

Everything is expressed through the DataFrame / Spark SQL API so
Catalyst plans it (predicate pushdown, column pruning, broadcast
joins, whole-stage codegen); pandas appears only inside Arrow-batched
kernels where the built-in operators genuinely cannot express the
semantics.
"""

__version__ = "0.1.0"
