from .medallion import MedallionPipeline, clean_frame, ingest_metadata
from .cache import CheckpointCache
from .dag import Dag, DagRun, Task
from .runlog import StageLogger

__all__ = [
    "MedallionPipeline",
    "clean_frame",
    "ingest_metadata",
    "CheckpointCache",
    "Dag",
    "DagRun",
    "Task",
    "StageLogger",
]
