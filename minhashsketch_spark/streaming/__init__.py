from .ingest import incremental_signatures
from .windows import windowed_event_counts, batch_windowed_event_counts
