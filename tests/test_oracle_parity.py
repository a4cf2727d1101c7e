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


_ROWS_ONLY = [n for n, q in _registry().items() if q.oracle is None]


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_lane_is_deterministic_across_invocations(spark, name):
    """Every no-oracle lane's driver check is rows-only, so its entire
    guarantee rests on DETERMINISM: two independent invocations (fresh
    temp tables / fresh k-means where applicable) must produce
    identical rows. Derandomized by construction (xxhash64 signatures,
    id-ordered batches and samples, farthest-point k-means init);
    this pin keeps the whole category that way."""
    from snowflake_data_pipeline_demo_spark.plans.queries import QUERIES

    b = QUERIES[name].builder
    sf = "/root/testdata/sf0.001"

    def run():
        return sorted(
            tuple(str(v) for v in row) for row in b(spark, sf).collect()
        )

    r1, r2 = run(), run()
    assert r1 == r2 and r1


class TestComparatorSignedZero:
    """Pins the r08 comparator hardening: the r07 hash-fail class
    (DuckDB round() -> -0.0 vs Spark BigDecimal round -> +0.0) shipped
    silently because the old 'bit-exact' check used IEEE `==`, which
    says -0.0 == 0.0. The hardened check compares float BIT patterns
    and must FAIL on the unfixed divergence; the negative-zero sweep
    must flag -0.0 even when both engines agree."""

    def test_signed_zero_divergence_is_caught(self):
        import pandas as pd
        from oracle_utils import float_column_problems

        a = pd.Series([1.5, 0.0, -2.25])
        b = pd.Series([1.5, -0.0, -2.25])
        probs = float_column_problems("pmi", a, b)
        assert probs, "old `==` blind spot: -0.0 vs +0.0 must be flagged"
        assert "signed-zero" in probs[0] and "WILL fail" in probs[0]

    def test_bit_identical_floats_pass(self):
        import pandas as pd
        from oracle_utils import float_column_problems

        a = pd.Series([1.5, 0.0, float("nan"), -2.25])
        b = pd.Series([1.5, 0.0, float("nan"), -2.25])
        assert float_column_problems("cov", a, b) == []

    def test_nan_mismatch_is_caught(self):
        import pandas as pd
        from oracle_utils import float_column_problems

        a = pd.Series([1.0, float("nan")])
        b = pd.Series([1.0, 0.0])
        assert float_column_problems("x", a, b)

    def test_negative_zero_sweep_flags_agreeing_neg_zero(self):
        import pandas as pd
        from oracle_utils import negative_zero_sweep

        df = pd.DataFrame({"cov": [0.5, -0.0], "n": [1, 2]})
        probs = negative_zero_sweep({"spark": df, "duckdb": df})
        assert len(probs) == 2  # flagged on BOTH sides
        assert all("negative-zero" in p for p in probs)

    def test_negative_zero_sweep_clean_on_positive_zero(self):
        import pandas as pd
        from oracle_utils import negative_zero_sweep

        df = pd.DataFrame({"cov": [0.0, 1.25], "name": ["a", "b"]})
        assert negative_zero_sweep({"spark": df, "duckdb": df}) == []

    def test_unfixed_pmi_covariance_oracles_would_fail(self):
        """End-to-end proof of the verdict's done-criterion: the
        PRE-FIX oracle SQL (no `+ 0`) run on DuckDB emits -0.0 at
        sf0.001+ scales where any rounded value lands in
        (-0.00005, 0); the FIXED oracle never does. Synthesized here
        engine-side so the pin holds even at SFs where the sf0.01
        corpus coincidence doesn't reproduce."""
        import duckdb

        con = duckdb.connect()
        unfixed, fixed = con.execute(
            "SELECT round(CAST(-0.00001 AS DOUBLE), 4),"
            "       round(CAST(-0.00001 AS DOUBLE), 4) + 0"
        ).fetchone()
        import math as m
        assert m.copysign(1, unfixed) < 0, "DuckDB round must emit -0.0"
        assert m.copysign(1, fixed) > 0, "`+ 0` must normalize to +0.0"

    def test_matching_infinities_pass(self):
        """r08 review pass 2: the vectorized closeness check must keep
        math.isclose's non-finite semantics — inf is close ONLY to the
        same-signed inf (inf - inf = nan and 1e-12 * inf = inf would
        otherwise misgrade both directions)."""
        import pandas as pd
        from oracle_utils import float_column_problems

        a = pd.Series([1.0, float("inf"), float("-inf")])
        b = pd.Series([1.0, float("inf"), float("-inf")])
        assert float_column_problems("x", a, b) == []

    def test_inf_vs_finite_is_a_value_mismatch(self):
        import pandas as pd
        from oracle_utils import float_column_problems

        a = pd.Series([float("inf")])
        b = pd.Series([1.0])
        probs = float_column_problems("x", a, b)
        assert probs and "value mismatches" in probs[0]

    def test_opposite_sign_infinities_mismatch(self):
        import pandas as pd
        from oracle_utils import float_column_problems

        a = pd.Series([float("inf")])
        b = pd.Series([float("-inf")])
        probs = float_column_problems("x", a, b)
        assert probs and "value mismatches" in probs[0]
