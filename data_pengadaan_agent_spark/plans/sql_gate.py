"""P7: SELECT-only SQL gate + deterministic query preview.

The reference enforces "SELECT only, no DML" purely in the prompt
(openai/basic_functions.py:60, langchain/agent_setup.py:56) and lints
candidate SQL with an LLM (langchain/langchain_tool.py:106-160,
disabled). Here the gate is engine-level and deterministic: a
statement allowlist plus a Catalyst dry-run (``EXPLAIN``), which is a
strictly stronger validity check than LLM opinion.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_FORBIDDEN = re.compile(
    r"^\s*(insert|update|delete|drop|alter|create|truncate|merge|grant|revoke|set|reset)\b",
    re.IGNORECASE,
)
_ALLOWED = re.compile(r"^\s*(select|with|values|table|explain|describe|show)\b", re.IGNORECASE)


class SqlGateError(ValueError):
    pass


def check_select_only(sql: str) -> str:
    """Reject anything that is not a read-only query. Returns the SQL."""
    stripped = sql.strip().rstrip(";")
    if ";" in stripped:
        raise SqlGateError("multiple statements are not allowed")
    if _FORBIDDEN.match(stripped) or not _ALLOWED.match(stripped):
        raise SqlGateError(f"only read-only queries are allowed, got: {stripped[:60]!r}")
    return stripped


def safe_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Gate + compile. Catalyst analysis runs eagerly on spark.sql, so
    invalid references fail here, before any execution."""
    return spark.sql(check_select_only(sql))


def preview(spark: SparkSession, sql: str, n: int = 5) -> dict:
    """V1/V2 engine half: run a candidate query, return schema + first
    n rows (langchain/my_toolkit.py:119-180,487-549). The LLM-judging
    half stays a pluggable callback outside the engine.
    """
    df = safe_sql(spark, sql)
    return {
        "schema": df.schema.jsonValue(),
        "first_rows": [r.asDict(recursive=True) for r in df.limit(n).collect()],
    }


def explain_check(spark: SparkSession, sql: str) -> str:
    """V3 replacement: deterministic EXPLAIN dry-run instead of LLM lint."""
    df = safe_sql(spark, sql)
    return df._jdf.queryExecution().explainString("formatted")
