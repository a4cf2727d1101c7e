from .stage import Stage
from .catalog import Catalog, Table, TRIPS_SCHEMA, STATIONS_SCHEMA, PROGRAMS_SCHEMA, SECURITY_SCHEMA, TRIP_DOC_SCHEMA
from .shares import Share, ShareRegistry
from .testdata import load_tables, register_views, TESTDATA_TABLES

__all__ = [
    "Stage", "Catalog", "Table", "Share", "ShareRegistry",
    "TRIPS_SCHEMA", "STATIONS_SCHEMA", "PROGRAMS_SCHEMA", "SECURITY_SCHEMA",
    "TRIP_DOC_SCHEMA", "load_tables", "register_views", "TESTDATA_TABLES",
]
