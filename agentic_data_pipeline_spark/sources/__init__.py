from .bronze import read_bronze, write_bronze
from .ingest import IngestError, ingest

__all__ = ["ingest", "IngestError", "write_bronze", "read_bronze"]
