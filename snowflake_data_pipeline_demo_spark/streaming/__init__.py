from .history import COPY_HISTORY_SCHEMA, TASK_HISTORY_SCHEMA
from .metrics import stream_metrics, watermark_lag_seconds
from .stream_data import stream_data
from .pipe import Pipe
from .streams import TableStream
from .tasks import Task, TaskRunner
from .pipeline import CitibikePipeline
from .dedup import (
    dedup_stream, minhash_dedup_batch_fn, semantic_dedup_batch_fn,
)
from .profile import corpus_profile, profile_batch_fn

__all__ = [
    "COPY_HISTORY_SCHEMA", "TASK_HISTORY_SCHEMA", "stream_data", "Pipe",
    "TableStream", "Task", "TaskRunner", "CitibikePipeline",
    "stream_metrics", "watermark_lag_seconds",
    "dedup_stream", "minhash_dedup_batch_fn", "semantic_dedup_batch_fn",
    "corpus_profile", "profile_batch_fn",
]
