"""data_pengadaan_agent_spark — PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query / data-processing
capabilities of ``faishaltm/data_pengadaan_agent`` (see SURVEY.md):
keyword-CNF substring filtering, materialize-then-aggregate query
lifecycle, chart-data pipelines with scalar insights, semantic
similarity retrieval — extended with the relational surface (joins,
windows, set ops, rollups) and LLM-training-data operators (dedup,
ANN similarity search, text analysis, multimodal plumbing) that a
100 TB Spark deployment needs.

Everything is expressed through the DataFrame / Spark SQL API so
Catalyst owns optimization; Python UDFs appear only where built-in
operators genuinely cannot express the semantics (and then always as
Arrow-vectorized pandas UDFs).
"""

from data_pengadaan_agent_spark.session import get_spark
from data_pengadaan_agent_spark.sources.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
