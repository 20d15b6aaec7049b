"""dataframework_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capabilities of Alrash/DataFramework
(``/root/reference/``) on Spark DataFrames — plus the full relational
query surface and LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) that a distributed "data process
framework" implies.  See SURVEY.md for the operator-by-operator mapping.
"""

from dataframework_spark.session import get_spark
from dataframework_spark.catalog import load_table, load_tables, register_views

__all__ = ["get_spark", "load_table", "load_tables", "register_views"]
