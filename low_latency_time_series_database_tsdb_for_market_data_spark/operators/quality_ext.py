"""Market-quality and corpus-quality depth operators (q101-q112).

Extends the microstructure block (q86-q97) and the curation block
(q50-q70, q81-q94) with the screens a market-data warehouse and a
training-corpus pipeline run side by side:

* q101 lead-lag correlation   — directed cross-symbol predictability
* q102 drawdown spells        — gaps-and-islands duration analytics
* q103 Roll spread covariance — bid-ask bounce from serial covariance
* q104 Benford digit screen   — data-quality / fabrication check
* q105 price staleness runs   — stuck-feed detection (islands)
* q106 minute-rate anomaly    — burst detection on tick arrival rates
* q107 Zipf head coverage     — token-distribution health per language
* q108 embedding norm banding — representation drift / outlier screen
* q109 overnight gaps         — open-vs-prev-close report, signed e4
* q110 dispersion screen      — TCA 1%-band outlier prints per day
* q111 causal burst backtest  — burst_alert_stream's replayable oracle
* q112 market beta            — exact-integer OLS vs aggregate flow

The determinism discipline is the repo-wide one (functions.deterministic):
prices are exact integer cents, every ratio leaves the engine through the
integer-decided ratio_e4 helper, window passes use explicit ROWS frames
over the (ts, event_id) total order (SURVEY.md §4.3.4), and the only
doubles that cross an aggregation boundary are per-row ROUND products both
engines compute identically (the q51 precedent).  Every shuffle is keyed
by the natural 100 TB partition key (symbol / lang / label), so each
query is one symbol-keyed window pass and/or one hash aggregation —
shapes that survive a 1000-executor scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import (
    cents,
    ratio_e4,
    ratio_e4_signed,
    ratio_round,
)
from ..registry import query
from .llm.similarity import _dbl, _norm2

# Per-symbol cumulative frame over the (ts, event_id) total order.  ROWS
# is explicit on both engines: with a unique ordering key RANGE==ROWS,
# but ROWS keeps the plan a single streaming frame (no peer scans).
_CUM = "ROWS UNBOUNDED PRECEDING"


def _cum_window():
    return (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


@query(
    "q101_lead_lag",
    oracle="""
    WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h,
                      SUM(CAST(ROUND(value*100) AS BIGINT)) / 100.0 / COUNT(*)
                        AS v
               FROM events GROUP BY 1, 2)
    SELECT a.event_type AS lead_sym, c.event_type AS lag_sym,
           ROUND(corr(a.v, c.v), 4) AS r_leadlag, COUNT(*) AS n_buckets
    FROM b a JOIN b c
      ON a.h + INTERVAL 1 HOUR = c.h AND a.event_type <> c.event_type
    GROUP BY 1, 2
    """,
    category="timeseries-similarity",
)
def q101_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed lead-lag screen: correlation of symbol A's hourly mean
    with symbol B's NEXT-hour mean, for every ordered pair — the
    cross-predictability matrix behind lead-lag strategies (q77's
    contemporaneous matrix, shifted one bucket).

    Shape: the hourly pre-aggregation shrinks the input to
    symbols x buckets rows, so the shifted self-join is broadcast-able
    at any tick volume; corr is single-pass mergeable moments.  The
    bucket means are exact integer-cents sums divided once, so both
    engines correlate identical doubles.  The bucket table feeds both
    branches, so it is localCheckpoint-materialized once (q77's
    single-scan rule): ONE pass over the tape, KB-scale checkpoint."""
    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg((F.sum(cents("value")) / 100.0 / F.count(F.lit(1))).alias("v"))
        .localCheckpoint(eager=False)
    )
    lead = b.select(
        F.col("event_type").alias("lead_sym"),
        (F.col("h") + F.expr("INTERVAL 1 HOUR")).alias("h1"),
        F.col("v").alias("va"),
    )
    lag = b.select(
        F.col("event_type").alias("lag_sym"), "h", F.col("v").alias("vb")
    )
    return (
        lead.join(F.broadcast(lag), lead["h1"] == lag["h"])
        .where(F.col("lead_sym") != F.col("lag_sym"))
        .groupBy("lead_sym", "lag_sym")
        .agg(
            F.round(F.corr("va", "vb"), 4).alias("r_leadlag"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


@query(
    "q102_drawdown_spells",
    oracle=f"""
    WITH s AS (SELECT event_type, ts, event_id,
                      CAST(ROUND(value*100) AS BIGINT) AS c
               FROM events),
    r AS (SELECT event_type, ts, event_id, c,
                 MAX(c) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id {_CUM}) AS runmax
          FROM s),
    f AS (SELECT event_type, ts, event_id,
                 CASE WHEN c < runmax THEN 1 ELSE 0 END AS dd
          FROM r),
    g AS (SELECT event_type, dd,
                 SUM(1 - dd) OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id {_CUM}) AS spell
          FROM f),
    sp AS (SELECT event_type, spell, COUNT(*) AS len
           FROM g WHERE dd = 1 GROUP BY 1, 2)
    SELECT event_type, COUNT(*) AS n_spells,
           CAST(MAX(len) AS BIGINT) AS max_spell,
           CAST(SUM(len) AS BIGINT) AS dd_ticks
    FROM sp GROUP BY 1
    """,
    category="timeseries-microstructure",
)
def q102_drawdown_spells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown DURATION analytics (q76 reports magnitude; this reports
    time-under-water): number of below-running-peak spells, the longest
    spell in ticks, and total ticks spent in drawdown, per symbol.

    Gaps-and-islands without a join: the cumulative count of at-peak
    ticks is constant across a spell, so it IS the spell id — two
    streaming window passes over the same symbol-keyed sort (one
    shuffle; Spark reuses the sort for both frames), then one hash agg.
    All integer cents, hash-stable at any parallelism."""
    ev = table(spark, sf_dir, "events")
    w = _cum_window()
    r = ev.select(
        "event_type", "ts", "event_id", cents("value").alias("c")
    ).withColumn("runmax", F.max("c").over(w))
    f = r.withColumn(
        "dd", F.when(F.col("c") < F.col("runmax"), 1).otherwise(0)
    )
    g = f.withColumn("spell", F.sum(1 - F.col("dd")).over(w))
    sp = (
        g.where(F.col("dd") == 1)
        .groupBy("event_type", "spell")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return sp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_spells"),
        F.max("len").alias("max_spell"),
        F.sum("len").alias("dd_ticks"),
    )


@query(
    "q103_roll_spread",
    oracle="""
    WITH s AS (SELECT event_type, ts, event_id,
                      CAST(ROUND(value*100) AS BIGINT) AS c,
                      lag(CAST(ROUND(value*100) AS BIGINT)) OVER (
                          PARTITION BY event_type ORDER BY ts, event_id) AS pc
               FROM events),
    d AS (SELECT event_type, ts, event_id, c - pc AS d
          FROM s WHERE pc IS NOT NULL),
    d2 AS (SELECT event_type, d,
                  lag(d) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id) AS d1
           FROM d),
    v AS (SELECT event_type, d, d1 FROM d2 WHERE d1 IS NOT NULL)
    SELECT event_type, COUNT(*) AS n_pairs,
           CAST(COUNT(*) * SUM(d * d1) - SUM(d) * SUM(d1) AS BIGINT)
             AS ncov_scaled,
           CASE WHEN COUNT(*) * SUM(d * d1) - SUM(d) * SUM(d1) < 0
                THEN 'bounce' ELSE 'trend' END AS regime
    FROM v GROUP BY 1
    """,
    category="timeseries-microstructure",
)
def q103_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll effective-spread input: the serial covariance of successive
    price changes per symbol (Roll 1984: spread = 2*sqrt(-cov) when the
    covariance is negative — bid-ask bounce).  Emitted sqrt-free as the
    exact integer numerator n*Sum(d*d1) - Sum(d)*Sum(d1) in cents^2 so
    the result hashes identically at any parallelism; the sign alone
    classifies the regime.

    Shape: one symbol-keyed window sort feeds both lags (Spark collapses
    the two lag projections into a single Window exec), then one hash
    agg of four integer sums.  DECIMAL(38,0) products give the same
    headroom as DuckDB's HUGEINT before the final BIGINT cast."""
    ev = table(spark, sf_dir, "events")
    wl = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", "ts", "event_id", cents("value").alias("c")
    ).withColumn("pc", F.lag("c").over(wl))
    d = s.where(F.col("pc").isNotNull()).withColumn(
        "d", F.col("c") - F.col("pc")
    )
    v = d.withColumn("d1", F.lag("d").over(wl)).where(
        F.col("d1").isNotNull()
    )
    agg = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("d") * F.col("d1")).alias("s_dd1"),
        F.sum("d").alias("s_d"),
        F.sum("d1").alias("s_d1"),
    )
    ncov = F.expr(
        "CAST(CAST(n_pairs AS DECIMAL(38,0)) * s_dd1 "
        "- CAST(s_d AS DECIMAL(38,0)) * s_d1 AS BIGINT)"
    )
    return agg.select(
        "event_type",
        "n_pairs",
        ncov.alias("ncov_scaled"),
        F.when(ncov < 0, "bounce").otherwise("trend").alias("regime"),
    )


@query(
    "q104_benford_digits",
    oracle="""
    WITH d AS (SELECT event_type,
                      SUBSTR(CAST(CAST(ROUND(value*100) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS digit
               FROM events),
    g AS (SELECT event_type, digit, COUNT(*) AS n FROM d GROUP BY 1, 2),
    t AS (SELECT event_type, digit, n,
                 SUM(n) OVER (PARTITION BY event_type) AS tot
          FROM g)
    SELECT event_type, digit, n,
           ((n * 20000 + tot) // (2 * tot)) / 10000.0 AS share
    FROM t
    """,
    category="data-quality",
)
def q104_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of tick prices per symbol — the
    Benford's-law screen auditors run against fabricated or truncated
    feeds (organic price levels skew toward low leading digits; a
    uniform digit histogram flags synthetic or clipped data).

    Shape: narrow map to the leading digit of the integer cents, one
    hash agg to symbol x digit (<= 9 rows per symbol), then a window
    over the tiny aggregate for the per-symbol share.  The share is the
    integer-decided 4-decimal ratio (ratio_e4)."""
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type",
        F.substring(cents("value").cast("string"), 1, 1).alias("digit"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = g.withColumn(
        "tot", F.sum("n").over(Window.partitionBy("event_type"))
    )
    return t.select(
        "event_type", "digit", "n", ratio_e4("n", "tot").alias("share")
    )


@query(
    "q105_staleness_runs",
    oracle=f"""
    WITH s AS (SELECT event_type, ts, event_id,
                      CAST(ROUND(value*100) AS BIGINT) AS c,
                      lag(CAST(ROUND(value*100) AS BIGINT)) OVER (
                          PARTITION BY event_type ORDER BY ts, event_id) AS pc
               FROM events),
    f AS (SELECT event_type, ts, event_id,
                 CASE WHEN pc IS NULL OR c <> pc THEN 1 ELSE 0 END AS chg
          FROM s),
    g AS (SELECT event_type,
                 SUM(chg) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id {_CUM}) AS run
          FROM f),
    r AS (SELECT event_type, run, COUNT(*) AS len
          FROM g GROUP BY 1, 2)
    SELECT event_type, COUNT(*) AS n_runs,
           CAST(MAX(len) AS BIGINT) AS max_run,
           CAST(SUM(len) - COUNT(*) AS BIGINT) AS stale_ticks
    FROM r GROUP BY 1
    """,
    category="data-quality",
)
def q105_staleness_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-staleness report per symbol: number of distinct price runs,
    the longest run of consecutive unchanged prices, and the total count
    of zero-move ticks — the stuck-feed / crossed-session screen a data
    vendor runs before publishing a tape.

    Islands by cumulative change-count (each run starts at its chg=1
    tick, so stale ticks = total - n_runs — one identity instead of a
    second pass).  Same single symbol-keyed sort as q102, reused by the
    lag and the cumulative sum; two hash aggs over shrinking keys."""
    ev = table(spark, sf_dir, "events")
    wl = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", "ts", "event_id", cents("value").alias("c")
    ).withColumn("pc", F.lag("c").over(wl))
    f = s.withColumn(
        "chg",
        F.when(
            F.col("pc").isNull() | (F.col("c") != F.col("pc")), 1
        ).otherwise(0),
    )
    g = f.withColumn("run", F.sum("chg").over(_cum_window()))
    r = g.groupBy("event_type", "run").agg(F.count(F.lit(1)).alias("len"))
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max("len").alias("max_run"),
        (F.sum("len") - F.count(F.lit(1))).alias("stale_ticks"),
    )


@query(
    "q106_minute_rate_anomaly",
    oracle="""
    WITH m AS (SELECT event_type, date_trunc('minute', ts) AS minute,
                      COUNT(*) AS cnt
               FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, cnt,
                 COUNT(*) OVER (PARTITION BY event_type) AS nm,
                 SUM(cnt) OVER (PARTITION BY event_type) AS tot
          FROM m)
    SELECT event_type, COUNT(*) AS n_minutes,
           CAST(MAX(tot) AS BIGINT) AS n_ticks,
           CAST(MAX(cnt) AS BIGINT) AS peak_rate,
           CAST(SUM(CASE WHEN cnt * nm > 2 * tot THEN 1 ELSE 0 END)
                AS BIGINT) AS n_burst_minutes,
           ((MAX(tot) * 20000 + MAX(nm)) // (2 * MAX(nm))) / 10000.0
             AS mean_rate
    FROM w GROUP BY 1
    """,
    category="data-quality",
)
def q106_minute_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-arrival burst detection: per symbol, the count of minutes
    whose tick rate exceeds 2x the symbol's mean minute rate, plus peak
    and mean rates — the feed-health dashboard behind throttling alerts
    (q93 screens value spikes; this screens RATE spikes).

    The burst comparison cnt*nm > 2*tot is the mean threshold decided in
    exact integer cross-multiplication — no float division anywhere.
    Shape: one hash agg to symbol x minute, one window over that (small)
    aggregate, one final agg.  At 100 TB the symbol x minute grid is
    ~5 orders smaller than the tape."""
    ev = table(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    ws = Window.partitionBy("event_type")
    w = m.select(
        "event_type",
        "cnt",
        F.count(F.lit(1)).over(ws).alias("nm"),
        F.sum("cnt").over(ws).alias("tot"),
    )
    agg = w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_minutes"),
        F.max("tot").alias("n_ticks"),
        F.max("cnt").alias("peak_rate"),
        F.sum(
            F.when(F.col("cnt") * F.col("nm") > 2 * F.col("tot"), 1).otherwise(
                0
            )
        ).alias("n_burst_minutes"),
        F.max("nm").alias("_nm"),
    )
    return agg.select(
        "event_type",
        "n_minutes",
        "n_ticks",
        "peak_rate",
        "n_burst_minutes",
        ratio_e4("n_ticks", "_nm").alias("mean_rate"),
    )


@query(
    "q107_zipf_coverage",
    oracle="""
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    t AS (SELECT lang, token, COUNT(*) AS cnt
          FROM tok WHERE token <> '' GROUP BY 1, 2),
    r AS (SELECT lang, cnt,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY cnt DESC, token) AS rk,
                 SUM(cnt) OVER (PARTITION BY lang) AS total,
                 COUNT(*) OVER (PARTITION BY lang) AS n_distinct
          FROM t)
    SELECT lang, CAST(MAX(total) AS BIGINT) AS total_tokens,
           CAST(MAX(n_distinct) AS BIGINT) AS distinct_tokens,
           CAST(SUM(CASE WHEN rk <= 100 THEN cnt ELSE 0 END) AS BIGINT)
             AS top100_tokens,
           ((SUM(CASE WHEN rk <= 100 THEN cnt ELSE 0 END) * 20000
             + MAX(total)) // (2 * MAX(total))) / 10000.0 AS coverage
    FROM r GROUP BY 1
    """,
    category="llm-curation",
)
def q107_zipf_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head coverage per language: the fraction of all token
    occurrences claimed by the 100 most frequent tokens — the
    distribution-health metric curation pipelines track (a natural
    corpus follows Zipf with heavy head coverage; template/boilerplate
    floods push it toward 1, adversarial noise toward 0).

    Ranking ties break (cnt DESC, token ASC) so the top-100 cut is a
    total order on both engines.  Shape: explode -> map-side partial
    count to lang x token (the vocabulary, orders smaller than the
    corpus), one per-lang window over the vocab rows, final agg to one
    row per lang.  The corpus-scale shuffle is the token count's partial
    agg — the same shape as q69/q92."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    t = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    wr = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    wl = Window.partitionBy("lang")
    r = t.select(
        "lang",
        "cnt",
        F.row_number().over(wr).alias("rk"),
        F.sum("cnt").over(wl).alias("total"),
        F.count(F.lit(1)).over(wl).alias("n_distinct"),
    )
    agg = r.groupBy("lang").agg(
        F.max("total").alias("total_tokens"),
        F.max("n_distinct").alias("distinct_tokens"),
        F.sum(
            F.when(F.col("rk") <= 100, F.col("cnt")).otherwise(F.lit(0))
        ).alias("top100_tokens"),
    )
    return agg.select(
        "lang",
        "total_tokens",
        "distinct_tokens",
        "top100_tokens",
        ratio_e4("top100_tokens", "total_tokens").alias("coverage"),
    )


@query(
    "q108_norm_band",
    oracle="""
    WITH idx AS (SELECT unnest(range(1, 65)) AS i),
    n2 AS (SELECT e.vec_id, e.label,
                  SUM(CAST(e.embedding[i] AS DOUBLE)
                      * CAST(e.embedding[i] AS DOUBLE)) AS nn
           FROM embeddings e, idx GROUP BY 1, 2),
    r AS (SELECT label, CAST(ROUND(nn * 1000000) AS BIGINT) AS r6 FROM n2),
    w AS (SELECT label, r6,
                 COUNT(*) OVER (PARTITION BY label) AS n,
                 SUM(r6) OVER (PARTITION BY label) AS sr
          FROM r)
    SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(CASE WHEN r6 * n > sr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above_mean,
           ((MAX(sr) * 20000 + MAX(n) * 1000000)
            // (2 * MAX(n) * 1000000)) / 10000.0 AS mean_norm2
    FROM w GROUP BY 1
    """,
    category="llm-embedding",
)
def q108_norm_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm banding per label: vectors whose squared L2 norm
    sits above their label's mean, plus the mean itself — the cheap
    representation-drift / outlier screen run before similarity search
    (anomalous norms break cosine/IP interchangeability and flag encoder
    regressions).

    Norm^2 is the same sequential JVM fold as q51 (bitwise-identical to
    the oracle's ordered SUM); each row then rounds it ONCE to a scaled
    BIGINT so every cross-row aggregate is exact integer arithmetic —
    the above-mean test is cross-multiplied, never divided.  Shape: one
    narrow map, one label-keyed window, one hash agg; label is the
    natural partition key at scale."""
    e = table(spark, sf_dir, "embeddings")
    r = e.select(
        "label",
        cents(_norm2(_dbl(F.col("embedding"))), scale=1_000_000).alias("r6"),
    )
    wl = Window.partitionBy("label")
    w = r.select(
        "label",
        "r6",
        F.count(F.lit(1)).over(wl).alias("n"),
        F.sum("r6").over(wl).alias("sr"),
    )
    agg = w.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(
            F.when(F.col("r6") * F.col("n") > F.col("sr"), 1).otherwise(0)
        ).alias("n_above_mean"),
        F.max("sr").alias("_sr"),
        F.max("n").alias("_n"),
    )
    return agg.select(
        "label",
        "n_vecs",
        "n_above_mean",
        ratio_round("_sr", "_n * 1000000", 4).alias("mean_norm2"),
    )


@query(
    "q109_overnight_gap",
    oracle="""
    WITH s AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
                      ts, event_id,
                      CAST(ROUND(value*100) AS BIGINT) AS c
               FROM events),
    r AS (SELECT event_type, d, c,
                 row_number() OVER (PARTITION BY event_type, d
                                    ORDER BY ts, event_id) AS rn_o,
                 row_number() OVER (PARTITION BY event_type, d
                                    ORDER BY ts DESC, event_id DESC) AS rn_c
          FROM s),
    o AS (SELECT event_type, d,
                 MAX(CASE WHEN rn_o = 1 THEN c END) AS open_c,
                 MAX(CASE WHEN rn_c = 1 THEN c END) AS close_c
          FROM r GROUP BY 1, 2),
    g AS (SELECT event_type, d, open_c, close_c,
                 lag(close_c) OVER (PARTITION BY event_type
                                    ORDER BY d) AS pclose
          FROM o)
    SELECT event_type, d, open_c, close_c,
           open_c - pclose AS gap_cents,
           CASE WHEN open_c - pclose < 0
                THEN -((-(open_c - pclose) * 20000 + pclose)
                       // (2 * pclose))
                ELSE ((open_c - pclose) * 20000 + pclose)
                     // (2 * pclose)
           END / 10000.0 AS gap_ret
    FROM g WHERE pclose IS NOT NULL
    """,
    category="timeseries-microstructure",
)
def q109_overnight_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overnight gap report: each symbol-day's open vs the PREVIOUS
    day's close (both picked by the (ts, event_id) total order — q22's
    deterministic open/close rule), the gap in exact cents, and the gap
    return rounded 4-decimal by the sign-splitting integer helper
    (ratio_e4_signed — gaps go both ways).

    Shape: one (symbol, day) exchange carries both row_number passes and
    the open/close agg; the day-over-day lag then runs on the day grid
    (orders of magnitude smaller than the tape) partitioned by symbol.
    The day rides the plan as a 4-byte DATE (shuffle key, sort payload)
    and becomes the ISO string only on the day-grid output — the 30M
    tape soak showed per-row date strings costing ~6x on this shape."""
    w = Window.partitionBy("event_type", "d")
    s = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("d"),
            "ts",
            "event_id",
            cents("value").alias("c"),
        )
        .withColumn(
            "rn_o",
            F.row_number().over(w.orderBy(F.asc("ts"), F.asc("event_id"))),
        )
        .withColumn(
            "rn_c",
            F.row_number().over(w.orderBy(F.desc("ts"), F.desc("event_id"))),
        )
    )
    o = s.groupBy("event_type", "d").agg(
        F.max(F.when(F.col("rn_o") == 1, F.col("c"))).alias("open_c"),
        F.max(F.when(F.col("rn_c") == 1, F.col("c"))).alias("close_c"),
    )
    g = o.withColumn(
        "pclose",
        F.lag("close_c").over(
            Window.partitionBy("event_type").orderBy("d")
        ),
    ).where(F.col("pclose").isNotNull())
    return g.select(
        "event_type",
        F.col("d").cast("string").alias("d"),
        "open_c",
        "close_c",
        (F.col("open_c") - F.col("pclose")).alias("gap_cents"),
        ratio_e4_signed("open_c - pclose", "pclose").alias("gap_ret"),
    )


@query(
    "q110_dispersion_screen",
    oracle="""
    WITH s AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
                      CAST(ROUND(value*100) AS BIGINT) AS c
               FROM events),
    w AS (SELECT event_type, d, c,
                 COUNT(*) OVER (PARTITION BY event_type, d) AS n,
                 SUM(c) OVER (PARTITION BY event_type, d) AS sc
          FROM s)
    SELECT event_type, d, COUNT(*) AS n_ticks,
           CAST(SUM(CASE WHEN 100 * abs(c * n - sc) > sc
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_disperse,
           (SUM(CASE WHEN 100 * abs(c * n - sc) > sc THEN 1 ELSE 0 END)
            * 20000 + COUNT(*)) // (2 * COUNT(*)) / 10000.0 AS disp_share
    FROM w GROUP BY 1, 2
    """,
    category="data-quality",
)
def q110_dispersion_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday dispersion screen: per symbol-day, the count and share
    of ticks printing more than 1% away from the day's mean price — the
    execution-quality / crossed-print check a TCA desk runs.  The 1%
    band test |c - mean| > mean/100 is cross-multiplied to
    100*|c*n - sum| > sum, so the whole screen is exact BIGINT
    arithmetic (c*n peaks ~1e10 at sf0.1 day sizes; DECIMAL headroom is
    only needed beyond ~1e14 ticks/day).

    Shape: one (symbol, day) exchange carries the count/sum window and
    the final agg — the same single-shuffle islands shape as q102."""
    ev = table(spark, sf_dir, "events")
    wd = Window.partitionBy("event_type", "d")
    s = ev.select(
        "event_type",
        F.to_date("ts").alias("d"),
        cents("value").alias("c"),
    ).select(
        "event_type",
        "d",
        "c",
        F.count(F.lit(1)).over(wd).alias("n"),
        F.sum("c").over(wd).alias("sc"),
    )
    disperse = F.when(
        100 * F.abs(F.col("c") * F.col("n") - F.col("sc")) > F.col("sc"), 1
    ).otherwise(0)
    agg = s.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(disperse).alias("n_disperse"),
    )
    return agg.select(
        "event_type",
        F.col("d").cast("string").alias("d"),
        "n_ticks",
        "n_disperse",
        ratio_e4("n_disperse", "n_ticks").alias("disp_share"),
    )


@query(
    "q111_causal_bursts",
    oracle="""
    WITH m AS (SELECT event_type, date_trunc('minute', ts) AS minute,
                      COUNT(*) AS cnt
               FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, minute, cnt,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY minute) - 1 AS nm,
                 COALESCE(SUM(cnt) OVER (PARTITION BY event_type
                                         ORDER BY minute
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS tot
          FROM m)
    SELECT event_type, minute, cnt AS n_ticks,
           CAST(nm AS BIGINT) AS prior_minutes,
           CAST(tot AS BIGINT) AS prior_ticks
    FROM w WHERE nm >= 5 AND cnt * nm > 2 * tot
    """,
    category="data-quality",
)
def q111_causal_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAUSAL burst screen: minutes whose tick count exceeds 2x the
    running mean of the minutes BEFORE them (warmup 5) — exactly the
    decision rule the live monitor (`streaming/stateful.py::
    burst_alert_stream`) applies as minutes close, so this batch query
    is the stream's replayable oracle: a historical backtest produces
    the alert stream production would have emitted (q106 is the
    retrospective variant — its mean sees the whole day).

    Same integer cross-multiplication (cnt·nm > 2·tot), with the prior
    totals from a growing ROWS frame ending 1 PRECEDING.  Shape: one
    (symbol, minute) hash agg, then one symbol-keyed window over the
    minute grid."""
    ev = table(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wo = Window.partitionBy("event_type").orderBy("minute")
    w = m.select(
        "event_type",
        "minute",
        "cnt",
        (F.row_number().over(wo) - 1).alias("nm"),
        F.coalesce(
            F.sum("cnt").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("tot"),
    )
    return w.where(
        (F.col("nm") >= 5) & (F.col("cnt") * F.col("nm") > 2 * F.col("tot"))
    ).select(
        "event_type",
        "minute",
        F.col("cnt").alias("n_ticks"),
        F.col("nm").cast("bigint").alias("prior_minutes"),
        F.col("tot").cast("bigint").alias("prior_ticks"),
    )


@query(
    "q112_market_beta",
    oracle="""
    WITH r AS (SELECT event_type, date_trunc('hour', ts) AS h, value,
                      row_number() OVER (
                          PARTITION BY event_type, date_trunc('hour', ts)
                          ORDER BY ts DESC, event_id DESC) AS rn
               FROM events),
    c AS (SELECT event_type, h, CAST(ROUND(value*100) AS BIGINT) AS c
          FROM r WHERE rn = 1),
    d AS (SELECT event_type, h,
                 c - lag(c) OVER (PARTITION BY event_type ORDER BY h) AS dx
          FROM c),
    dx AS (SELECT event_type, h, dx FROM d WHERE dx IS NOT NULL),
    m AS (SELECT h, SUM(dx) AS dm FROM dx GROUP BY h),
    j AS (SELECT dx.event_type, dx.dx, m.dm FROM dx JOIN m USING (h)),
    a AS (SELECT event_type, COUNT(*) AS n, SUM(dx) AS sx, SUM(dm) AS sm,
                 SUM(dx * dm) AS sxm, SUM(dm * dm) AS smm
          FROM j GROUP BY 1),
    nb AS (SELECT event_type, CAST(n AS BIGINT) AS n_hours,
                  CAST(n * sxm - sx * sm AS BIGINT) AS ncov_scaled,
                  CAST(n * smm - sm * sm AS BIGINT) AS nvar_scaled
           FROM a)
    SELECT event_type, n_hours, ncov_scaled, nvar_scaled,
           CASE WHEN ncov_scaled < 0
                THEN -((-ncov_scaled * 20000 + nvar_scaled)
                       // (2 * nvar_scaled))
                ELSE (ncov_scaled * 20000 + nvar_scaled)
                     // (2 * nvar_scaled)
           END / 10000.0 AS beta
    FROM nb WHERE nvar_scaled > 0
    """,
    category="timeseries-microstructure",
)
def q112_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol market beta over hourly close-to-close changes: the
    OLS slope of the symbol's hourly price change against the aggregate
    market flow (the SUM of every symbol's change that hour — an
    integer, unlike a mean, so the whole regression stays in exact
    BIGINT).  beta = (nΣxy − ΣxΣy) / (nΣy² − (Σy)²) with the 4-decimal
    round sign-split integer-decided; the scaled numerator/denominator
    are emitted too, so a portfolio layer can re-aggregate without
    precision loss.

    Shape: (symbol, hour) close picks ride one exchange (row_number
    desc, q22's endpoint rule); everything after runs on the hour grid —
    symbol-keyed lag, one hour-keyed agg for the market flow, a
    broadcast-able grid join, one final symbol agg.  The corpus-scale
    work is the close pick; the regression is grid-scale.  The dx grid
    feeds BOTH the market agg and the probe side, so it is checkpoint-
    materialized once (q77's single-scan rule): one pass over the
    tape, KB-scale checkpoint."""
    ev = table(spark, sf_dir, "events")
    wb = Window.partitionBy("event_type", "h").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    c = (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("h"),
            "ts",
            "event_id",
            cents("value").alias("c"),
        )
        .withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
    )
    d = (
        c.withColumn(
            "dx",
            F.col("c")
            - F.lag("c").over(Window.partitionBy("event_type").orderBy("h")),
        )
        .where(F.col("dx").isNotNull())
        .select("event_type", "h", "dx")
        .localCheckpoint(eager=False)
    )
    m = d.groupBy("h").agg(F.sum("dx").alias("dm"))
    j = d.select("event_type", "h", "dx").join(F.broadcast(m), "h")
    a = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dm").alias("sm"),
        F.sum(F.col("dx") * F.col("dm")).alias("sxm"),
        F.sum(F.col("dm") * F.col("dm")).alias("smm"),
    )
    nb = a.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * sxm"
            " - CAST(sx AS DECIMAL(38,0)) * sm AS BIGINT)"
        ).alias("ncov_scaled"),
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * smm"
            " - CAST(sm AS DECIMAL(38,0)) * sm AS BIGINT)"
        ).alias("nvar_scaled"),
    ).where(F.col("nvar_scaled") > 0)
    return nb.select(
        "event_type",
        "n_hours",
        "ncov_scaled",
        "nvar_scaled",
        ratio_e4_signed("ncov_scaled", "nvar_scaled").alias("beta"),
    )
