"""olive_spark — a PySpark-native analytics engine with the capabilities of
steelcake/olive (an Arrow-based columnar file format, reference at
/root/reference, studied for behavior only).

Layout:
    olive_spark.format      — the olive chunk format (pure pyarrow, no Spark)
    olive_spark.datasource  — PySpark Python DataSource V2 ("olive" format)
    olive_spark.ops         — LLM-data-pipeline operators (dedup, similarity,
                              text stats, multimodal) built Spark-first
    olive_spark.queries     — the declared query surface (SURVEY.md §2.7)
"""

__version__ = "0.1.0"

from olive_spark.datasource import register_olive  # noqa: E402,F401
from olive_spark.table import (  # noqa: E402,F401
    OliveTable,
    refresh_table,
    register_table,
)
