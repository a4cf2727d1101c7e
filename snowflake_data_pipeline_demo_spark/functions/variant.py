"""VARIANT layer: JSON documents as first-class columns (SURVEY §1.2-1.4).

Reference parity:
- F5 ``object_construct(k1,v1,...)`` -> JSON doc (dp_setup.sql:58-75)
     -> :func:`object_construct_json` (``to_json(struct(...))``)
- F6 ``v:field::type`` path-cast (dp_setup.sql:193-202) -> :func:`variant_get`
- F7 ``parse_json(str):path::number`` (dp_demo.sql:132) -> :func:`parse_json_path`
- §1.4 schema-on-read for the raw table -> :func:`extract_variant`
  (``from_json`` with the declared doc schema — the Spark-preferred path:
  parse once at scan, then every downstream access is a struct-field read,
  which Catalyst prunes into the scan).

Scale notes: ``from_json`` with a pinned schema is codegen'd JVM work —
no inference pass, no Python. ``get_json_object`` per-field would re-parse
the document once per field (17x the parse cost on trips docs); parsing to
a struct once is the right plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: JSON timestamp format pinned for write+read round-trip fidelity
#: (SURVEY §7.3 "VARIANT fidelity": v:starttime::timestamp_ntz must
#: re-cast identically).
JSON_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSS"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ntz_to_epoch_micros(c: Column | str) -> Column:
    """timestamp_ntz -> epoch-micros long, via pure calendar arithmetic
    (datediff + field extraction): no DateTimeFormatter, no session
    timezone — an NTZ value has no zone, so the number is the same on
    any cluster. The scale-path wire encoding for timestamps inside
    JSON docs: formatting/parsing 'yyyy-MM-dd HH:mm:ss.SSS' through the
    formatter was the dominant cost of the doc round-trip.

    Second precision (the pipeline's sources carry none finer); use the
    JSON_TS_FORMAT string encoding where sub-second fidelity matters.
    """
    c = _col(c)
    days = F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
    sod = (F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)).cast("long")
    return (days * 86400 + sod) * 1000000


def epoch_micros_to_ntz(c: Column | str) -> Column:
    """Inverse of :func:`ntz_to_epoch_micros` — rebuilds the
    timestamp_ntz with make_timestamp_ntz (calendar arithmetic, no
    formatter, no timezone)."""
    c = _col(c).cast("long")
    total_sec = F.floor(c / 1000000).cast("long")
    days = F.floor(total_sec / 86400).cast("int")
    sod = (total_sec - days.cast("long") * 86400).cast("int")
    d = F.date_add(F.lit("1970-01-01").cast("date"), days)
    return F.make_timestamp_ntz(
        F.year(d), F.month(d), F.dayofmonth(d),
        F.floor(sod / 3600).cast("int"),
        F.floor((sod % 3600) / 60).cast("int"),
        (sod % 60).cast("int"),
    )


def object_construct_json(pairs: dict[str, Column]) -> Column:
    """``object_construct(k1, v1, ...)`` serialized to a JSON text column
    (the 17-pair build at dp_setup.sql:58-75)."""
    return F.to_json(
        F.struct(*[v.alias(k) for k, v in pairs.items()]),
        {"timestampNTZFormat": JSON_TS_FORMAT, "timestampFormat": JSON_TS_FORMAT},
    )


def extract_variant(json_col: Column | str, schema: T.StructType) -> Column:
    """Parse a JSON text column once into a typed struct (schema-on-read,
    dp_setup.sql:193-202). Downstream ``v.field`` accesses are pruned
    struct reads."""
    return F.from_json(
        _col(json_col), schema,
        {"timestampNTZFormat": JSON_TS_FORMAT, "timestampFormat": JSON_TS_FORMAT},
    )


def variant_get(v: Column | str, path: str, cast_to: str | None = None) -> Column:
    """``v:path::type`` on a parsed variant struct (dp_setup.sql:193-202).

    ``path`` may be dotted for nested docs.
    """
    c = _col(v)
    for part in path.split("."):
        c = c.getField(part)
    return c.cast(cast_to) if cast_to else c


def parse_json_path(json_str: Column | str, path: str,
                    cast_to: str | None = None) -> Column:
    """``parse_json(str):path::type`` for ad-hoc docs with no declared
    schema (dp_demo.sql:132) — single-field extraction, so
    ``get_json_object`` (one parse, one path) is the right primitive."""
    c = F.get_json_object(_col(json_str), f"$.{path}")
    return c.cast(cast_to) if cast_to else c


def parse_json_variant(json_str: Column | str) -> Column:
    """Spark 4 ``VariantType`` parse — the closest engine analog of
    Snowflake's VARIANT (SURVEY §1.3): a binary-encoded semi-structured
    value with schema-free path access via :func:`variant_get_native`.
    Use when the doc shape is NOT declared; when it is, the
    ``extract_variant`` struct path stays preferred (Catalyst prunes
    struct field reads into the scan)."""
    return F.parse_json(_col(json_str))


def variant_get_native(v: Column | str, path: str,
                       cast_to: str = "string") -> Column:
    """``v:path::type`` on a true VariantType column (F6/F7 on Spark 4,
    dp_setup.sql:193-202 / dp_demo.sql:132). ``path`` is dotted,
    without the leading ``$``."""
    return F.variant_get(_col(v), "$." + path, cast_to)


def flatten_variant(df: DataFrame, v: str, schema: T.StructType,
                    casts: dict[str, str] | None = None) -> DataFrame:
    """Extract every field of a JSON text column to top-level typed columns
    — the push_trips projection shape (dp_setup.sql:192-203)."""
    parsed = extract_variant(v, schema)
    casts = casts or {}
    cols = [
        (parsed.getField(f.name).cast(casts[f.name]) if f.name in casts
         else parsed.getField(f.name)).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)
