from .ingest import ingest_available_now, windowed_counts_stream  # noqa: F401
