"""Secure view factory (SURVEY §2.10 G1-G3).

Reproduces ``trips_secure_vw`` (dp_demo.sql:222-239):

- 5-way join: trips x start-station x end-station x programs x security
  — the reference writes ON-less INNER JOINs with all predicates in
  WHERE (dp_demo.sql:230-239); Spark SQL rejects that, so the conditions
  are explicit here (SURVEY J5).
- row-level security: ``s.account = current_account()`` AND
  ``p.program_name LIKE s.filter`` — the LIKE pattern comes from a
  *column*, so it is a theta join (J6): Catalyst plans a broadcast
  nested-loop join, fine because security is rows-scale.
- column masking: station names pass through only for the publisher
  account; others see ``REDACTED (<md5>)`` (G3, dp_demo.sql:226-229).

"Secure" (optimization barrier, hidden definition) has no Spark
enforcement — Catalyst may push consumer predicates into the view.
Results are unaffected; documented non-goal (SURVEY §4).

Scale notes: security/programs/stations are dims -> all three sides
broadcast; the fact table never shuffles. The masking expression is a
codegen'd projection, zero extra passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import iff, md5_mask
from ..session import current_account


def _is_publisher(
    security: DataFrame, account_lit: Column
) -> tuple[DataFrame, Column]:
    """``current_account() IN (SELECT account FROM security WHERE
    name = 'Publisher Account')`` (dp_demo.sql:226-228, P6).

    Evaluated lazily as a scalar subquery over the security frame: the
    publisher-match count is a one-row aggregate, broadcast-joined into
    the consuming plan by :func:`secure_trips_view` — no driver action
    at view-build time, and (matching the reference's re-evaluating
    subquery) the predicate reflects the security frame's state at
    query run, not at view construction.

    Returns (flag_frame, column): join ``flag_frame`` (one row, one
    boolean ``_is_pub``) into the plan and use ``column`` in masking
    expressions.
    """
    flag = security.filter(
        (F.col("name") == "Publisher Account")
        & (F.col("account") == account_lit)
    ).agg((F.count("*") > 0).alias("_is_pub"))
    return flag, F.col("_is_pub")


def secure_trips_view(
    trips: DataFrame,
    stations: DataFrame,
    programs: DataFrame,
    security: DataFrame,
    account: str | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Build the governed view for ``account`` (defaults to the session's
    ``engine.current_account`` conf — the G6 impersonation hook).

    Output columns (dp_demo.sql:225-229 projection):
    ``hour, program_name, acct, start_station, end_station, duration``
    """
    if account is None:
        assert spark is not None, "pass account= or spark= to resolve the session account"
        account = current_account(spark)
    acct = F.lit(account)

    pub_flag, is_pub = _is_publisher(security, acct)
    mask = lambda c: iff(is_pub, c, md5_mask(c))  # noqa: E731

    t = trips.alias("t")
    ss = stations.alias("ss")
    es = stations.alias("es")
    p = programs.alias("p")
    s = security.alias("s")

    return (
        t
        # one-row publisher flag (lazy IN-subquery equivalent; see
        # _is_publisher) — broadcast nested-loop, zero shuffle
        .join(F.broadcast(pub_flag))
        .join(F.broadcast(ss), F.col("t.start_station_id") == F.col("ss.station_id"))
        .join(F.broadcast(es), F.col("t.end_station_id") == F.col("es.station_id"))
        .join(F.broadcast(p), F.col("t.program_id") == F.col("p.program_id"))
        # row security: account row + LIKE theta join (dp_demo.sql:236,239)
        .join(
            F.broadcast(s.filter(F.col("s.account") == acct)),
            F.expr("p.program_name LIKE s.filter"),
        )
        .select(
            F.date_trunc("hour", F.col("t.starttime")).alias("hour"),
            F.col("p.program_name").alias("program_name"),
            # dp_demo.sql:228 projects current_account() AS acct — the
            # session account literal, not the security row's name
            acct.alias("acct"),
            mask(F.col("ss.station_name")).alias("start_station"),
            mask(F.col("es.station_name")).alias("end_station"),
            F.col("t.tripduration").alias("duration"),
        )
    )


def register_secure_view(view: DataFrame, name: str = "trips_secure_vw") -> str:
    """``CREATE SECURE VIEW trips_secure_vw`` surface parity
    (dp_demo.sql:222): expose the governed DataFrame as a session temp
    view so consumers run the demo's literal SQL against it —
    ``SELECT program_name, acct, COUNT(*) FROM trips_secure_vw GROUP BY
    1, 2 ORDER BY 3 DESC`` (dp_demo.sql:267-270; ordinal group/order
    are on by default in Spark SQL). Returns the view name."""
    view.createOrReplaceTempView(name)
    return name


def consumer_report(view: DataFrame) -> DataFrame:
    """The demo's consumer query (dp_demo.sql:267-270): ``GROUP BY 1,2
    ORDER BY 3 DESC`` with a count alias (A5/O3)."""
    return (
        view.groupBy("program_name", "acct")
        .agg(F.count("*").alias("num_trips"))
        .orderBy(F.desc("num_trips"), "program_name")
    )
