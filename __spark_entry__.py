"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's secure-view
consumer report through the full batch slice) at sf0.001.
``queries()``/``oracle_sql()`` expose the operator registry from
``snowflake_data_pipeline_demo_spark.plans.queries`` — one entry per
implemented SURVEY.md §2 operator, with a DuckDB oracle wherever the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from snowflake_data_pipeline_demo_spark.plans.queries import QUERIES

    return QUERIES["flagship_secure_report"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from snowflake_data_pipeline_demo_spark.plans.queries import QUERIES

    return {name: q.builder for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    from snowflake_data_pipeline_demo_spark.plans.queries import QUERIES

    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
