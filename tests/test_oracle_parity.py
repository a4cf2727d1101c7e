"""The local replica of the driver's t2 gate: every registry query with
an oracle must match DuckDB at sf0.001 (driver runs sf0.01)."""

from __future__ import annotations

import pytest

from conftest import SF_ORACLE


def _registry():
    from snowflake_data_pipeline_demo_spark.plans.queries import QUERIES

    return QUERIES


@pytest.mark.parametrize("name", list(_registry().keys()))
def test_query_matches_oracle(spark, name):
    from oracle_utils import compare

    q = _registry()[name]
    df = q.builder(spark, SF_ORACLE)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weaker gate)
        return
    problems = compare(df, q.oracle, SF_ORACLE)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"program_name", "acct", "num_trips"} <= set(df.columns)


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)


@pytest.mark.parametrize("name", list(_registry().keys()))
def test_registry_schema_is_driver_hashable(spark, name):
    """The driver's canonicalizer (pandas sort_values over raw object
    columns) crashes on container values — every ORACLE-GATED registry
    query must emit only atomic columns (CORRECTNESS_r04 regression:
    x_token_ids/x_pack_boundaries shipped array<long>). Rows-only
    queries are exempt: the driver never canonicalizes them."""
    from pyspark.sql import types as T

    q = _registry()[name]
    if q.oracle is None:
        return
    df = q.builder(spark, SF_ORACLE)
    bad = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: non-atomic columns {bad} would crash the driver's "
        "canonicalizer — serialize to string in query AND oracle"
    )


def test_stream_minhash_lane_is_deterministic_across_invocations(spark):
    """x_stream_minhash_dedup is rows-only graded (cross-batch stateful
    — no SQL oracle), so its guarantee rests on DETERMINISM: two
    independent invocations (fresh temp tables each) must produce
    byte-identical summary rows. xxhash64 signatures, id-ordered
    batches, and exact-dup re-ingest make this hold by construction;
    this pin keeps it that way."""
    from snowflake_data_pipeline_demo_spark.plans.queries import QUERIES

    b = QUERIES["x_stream_minhash_dedup"].builder
    sf = "/root/testdata/sf0.001"
    r1 = sorted(map(tuple, b(spark, sf).collect()))
    r2 = sorted(map(tuple, b(spark, sf).collect()))
    assert r1 == r2 and len(r1) == 3
