from .events import IngestEvent, IngestAdapter, StdinJsonlAdapter
from .file_ingest import FileIngest, chunk_text
from .warren import WarrenEvent, warren_event_to_node

__all__ = [
    "IngestEvent", "IngestAdapter", "StdinJsonlAdapter",
    "FileIngest", "chunk_text",
    "WarrenEvent", "warren_event_to_node",
]
