from .citibike import (
    trip_docs, extract_trips, trips_projection, programs_from_raw,
    stations_from_raw, security_fixture,
)
from .secure_view import secure_trips_view
from .dashboard import pipeline_status

__all__ = [
    "trip_docs", "extract_trips", "trips_projection", "programs_from_raw",
    "stations_from_raw", "security_fixture", "secure_trips_view",
    "pipeline_status",
]
