"""Declared query surface: name → (callable(spark, sf_dir) -> DataFrame,
oracle SQL | None). See SURVEY.md §2.7 for the capability each exercises."""

from olive_spark.queries.llm import QUERIES as _LLM
from olive_spark.queries.pipeline import QUERIES as _PIPE
from olive_spark.queries.relational import QUERIES as _REL
from olive_spark.queries.relational2 import QUERIES as _REL2
from olive_spark.queries.streaming_q import QUERIES as _STREAM
from olive_spark.queries.tpch import QUERIES as _TPCH
from olive_spark.queries.tpch2 import QUERIES as _TPCH2

ALL_QUERIES: dict[str, tuple] = {
    **_REL, **_REL2, **_TPCH, **_TPCH2, **_LLM, **_PIPE, **_STREAM,
}
