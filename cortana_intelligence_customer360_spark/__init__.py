"""PySpark-native Customer-360 feature-engineering engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of Azure/cortana-intelligence-customer360
(the reference is a deployment how-to template for ML-driven customer
profile enrichment; see SURVEY.md §1.1), extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
and designed for 100 TB scale.

Architecture: declarative DataFrame/SQL plans optimized by Catalyst +
AQE; Structured Streaming for stream operators; pyspark.ml for model
training; Arrow-batched Pandas UDFs only where built-ins cannot express
the semantics. No RDDs, no driver-side row loops.

Layout:
  session.py    - tuned SparkSession builder (local test / cluster prod)
  compat.py     - Spark<->DuckDB oracle alignment helpers (SURVEY §5.3)
  sources/      - table schemas + loaders, file-format roundtrips
  operators/    - relational operators (scan/filter/join/agg/window/set)
  functions/    - scalar function families + UDF/UDAF/UDTF surface
  features/     - customer-360 feature engineering (RFM, sessionize,
                  profile join, MLlib pipeline) - the reference's core
  llmops/       - LLM-data-pipeline ops (dedup, ANN, text, multimodal)
  streaming/    - Structured Streaming operators
  plans/        - physical-plan assertions (pushdown/broadcast checks)
  registry.py   - assembles the queries()/oracle_sql() driver contract
"""

__version__ = "0.1.0"
