"""pyp_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capability surface of the reference ETL application
(``RakeshBobba03/PYP-ETL-Pipeline``): schema mapping, normalization,
validation, multi-value explode, exact + fuzzy entity resolution with
penalty-adjusted scoring and confidence-band routing, review state machine,
MERGE-style upserts, report sinks — plus the scale extensions a large
training-data pipeline needs (dedup, similarity search, text analysis,
event windows, multimodal plumbing).

Everything is expressed as DataFrame / Spark SQL transformations so Catalyst
and Tungsten handle optimization (predicate pushdown, broadcast joins,
whole-stage codegen); Python UDFs appear only where column expressions
genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
