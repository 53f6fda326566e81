"""PySpark-native analytics engine with the query surface of the reference
single-node market-data TSDB (see SURVEY.md), rebuilt Spark-first.

The reference (C++20, /root/reference) is a per-symbol columnar tick store
with a B+ tree time index and a 3-command query surface (range scan, last-N,
count).  This package reproduces that surface on the Spark DataFrame API and
extends it to a full relational + LLM-data-pipeline operator inventory,
declared for driver verification in ``__spark_entry__.py``.

Layout:
    session.py    -- SparkSession builder tuned for local[32] and 100 TB habits
    catalog.py    -- testdata table loader + temp-view registration
    registry.py   -- query registry: name -> (spark_fn, duckdb oracle SQL)
    ticks.py      -- tick view over `events` (symbol/ts/price/volume/seq)
    operators/    -- the declared query set (SURVEY.md §2.3)
    sources/      -- CSV tick source (reference import semantics), writers
    streaming/    -- Structured Streaming ingest (reference writer thread)
    functions/    -- reusable column expressions (vector math, text hashing)
    plans/        -- plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
