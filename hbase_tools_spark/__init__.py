"""hbase_tools_spark: a PySpark-native analytics engine with the query
and data-processing capabilities of NorsaG/hbase-tools, rebuilt
Spark-first (DataFrame/SQL + Catalyst), plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale."""

from .catalog import Model, load_model
from .session import get_spark

__all__ = ["Model", "load_model", "get_spark"]
