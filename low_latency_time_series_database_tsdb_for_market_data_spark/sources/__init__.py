from .backfill import ingest_files_idempotent  # noqa: F401
from .csv_ticks import read_tick_csv  # noqa: F401
from .retention import apply_retention, unified_bars  # noqa: F401
from .writer import read_ticks, write_ticks  # noqa: F401
