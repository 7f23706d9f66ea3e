"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference system (a network-anomaly-detection pipeline:
batch ETL, streaming scoring, windowed dashboard analytics, ML scoring), plus
the large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) required at 100 TB scale.

Everything here is built on public Apache Spark APIs only: DataFrame/SQL for
batch, Structured Streaming for streams, MLlib for feature/ML pipelines, and
Arrow-vectorized pandas UDFs where built-ins genuinely cannot express the
semantics. No driver-side collects on the data path (the reference's defining
anti-pattern, see SURVEY.md §4).
"""

__version__ = "0.1.0"
