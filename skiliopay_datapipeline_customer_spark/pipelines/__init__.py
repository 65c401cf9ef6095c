from .medallion import MedallionPipeline, clean_frame, ingest_metadata
from .cache import CheckpointCache

__all__ = ["MedallionPipeline", "clean_frame", "ingest_metadata", "CheckpointCache"]
