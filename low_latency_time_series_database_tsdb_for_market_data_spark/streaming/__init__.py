from .incremental_dedup import (  # noqa: F401
    StreamingDedup,
    dedup_stream_available_now,
)
from .ingest import ingest_available_now, windowed_counts_stream  # noqa: F401
from .joins import interval_pair_stream  # noqa: F401
from .rollup import compact_rollup, continuous_ohlc, read_bars  # noqa: F401
from .score import score_vector_stream, train_centroid_model  # noqa: F401
from .stateful import (  # noqa: F401
    burst_alert_stream,
    gap_alert_stream,
    ofi_stream,
    symbol_snapshot_stream,
    volume_bar_stream,
)
from .windows import (  # noqa: F401
    dedup_stream,
    session_window_stream,
    sliding_vwap_stream,
    tick_stream,
)
