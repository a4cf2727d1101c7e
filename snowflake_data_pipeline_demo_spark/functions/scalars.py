"""Scalar function layer (SURVEY §2.7).

Each function is a thin Column builder over pyspark.sql.functions — the
whole layer stays JVM-side / whole-stage-codegen; no Python UDFs.

Reference parity:
- F2  ``iff(c,a,b)``              (dp_setup.sql:46-47)  -> :func:`iff`
- F4  ``to_date`` AUTO parsing    (dp_demo.sql:115 vs dp_setup.sql:45-47)
                                   -> :func:`to_date_auto`
- F10 ``dateadd(part,-n,ts)``     (dp_demo.sql:136,181)  -> :func:`dateadd`
- F11 ``timestampdiff(second,a,b)`` (dp_demo.sql:128)    -> :func:`timestampdiff`
- F12 ``date_trunc(hour, ts)``    (dp_demo.sql:225)      -> :func:`date_trunc_sf`
- G3  MD5 column masking          (dp_demo.sql:226-229)  -> :func:`md5_mask`
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def iff(cond: Column, if_true: Column, if_false: Column) -> Column:
    """Snowflake ``iff`` -> ``when/otherwise`` (dp_setup.sql:46-47)."""
    return F.when(cond, if_true).otherwise(if_false)


def to_date_auto(c: Column | str) -> Column:
    """Snowflake AUTO date parsing: accepts both ``yyyy-MM-dd`` and
    ``M/d/yyyy`` (dp_demo.sql:115 passes '01/10/2020' where setup emits
    'yyyy-mm-dd', SURVEY §7.3)."""
    c = _col(c)
    # try_to_date: ANSI mode (Spark 4 default) makes to_date throw on a
    # format miss; AUTO semantics want fallthrough.
    iso = F.try_to_date(c, "yyyy-MM-dd")
    us = F.try_to_date(c, "M/d/yyyy")
    return F.coalesce(iso, us, F.try_to_date(c))


def dateadd(part: str, n: int, ts: Column | str) -> Column:
    """Snowflake ``dateadd(part, n, ts)`` (dp_setup.sql:111)."""
    return F.timestamp_add(part.upper(), F.lit(n), _col(ts))


def timestampdiff(part: str, a: Column | str, b: Column | str) -> Column:
    """Snowflake ``timestampdiff(part, a, b)`` (dp_demo.sql:128,173)."""
    return F.timestamp_diff(part.upper(), _col(a), _col(b))


def date_trunc_sf(part: str, ts: Column | str) -> Column:
    """Snowflake ``date_trunc(part, ts)`` — Spark flips the arg order
    (dp_demo.sql:225)."""
    return F.date_trunc(part, _col(ts))


def md5_mask(c: Column | str) -> Column:
    """``'REDACTED (' || md5(col) || ')'`` (dp_demo.sql:227,229)."""
    return F.concat(F.lit("REDACTED ("), F.md5(_col(c)), F.lit(")"))
