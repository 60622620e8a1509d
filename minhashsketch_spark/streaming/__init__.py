from .ingest import incremental_signatures
