"""trail_condition_etl_spark — a PySpark-native analytics engine.

Re-expresses the dataflow capabilities of the reference ETL pipeline
(`brian-burrows/trail-condition-etl`, surveyed in SURVEY.md) as idiomatic
Spark DataFrame / SQL / Structured Streaming programs, and extends them
with large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): declarative DataFrame plans, Catalyst does
the optimizing; explicit StructType schemas; the reference's resilience
plumbing (outbox/PEL/breakers) is absorbed by Spark's execution model and
only DLQ policy, dedup, idempotent upsert and the rule engine are
reimplemented as first-class operators.
"""

__version__ = "0.1.0"
