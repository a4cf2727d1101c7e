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
