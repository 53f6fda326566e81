from .csv_ticks import read_tick_csv  # noqa: F401
