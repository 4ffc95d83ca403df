"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference event-driven e-commerce pipeline
(Vishnukothapalle/Event-driven-Data-Pipeline-for-E-commerce).

Spark-first design: every capability is expressed through the DataFrame /
Spark SQL API so Catalyst + Tungsten plan the physical execution
(broadcast joins, partial aggregation, whole-stage codegen, AQE).
Zero Python UDFs on the hot path.

Layout
------
- ``session``    : SparkSession factory (UTC, AQE, tolerant casts)
- ``sources``    : scans/sinks (CSV dir union w/ lineage, parquet, partitioned writes)
- ``functions``  : scalar function library (tolerant parses, date_sk, row hash, fills)
- ``operators``  : dedup / joins / aggregates / surrogate keys / SCD2 / cleansing
- ``plans``      : the public query corpus (marts) + testdata loader
- ``streaming``  : Structured Streaming realizations (funnel, sessionization, dedup)
- ``llmdata``    : large-scale training-data ops (dedup, similarity, text analysis)
"""

__version__ = "0.1.0"
