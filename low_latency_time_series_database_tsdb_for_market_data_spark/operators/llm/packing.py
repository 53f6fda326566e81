"""Training-batch preparation operators (q121-q124): chunking, context
packing, lexical diversity, corpus-frequency scoring.

These are the last mile of an LLM data pipeline — after dedup (q50-q70)
and curation (q81-q94) decide WHAT survives, these decide how the
survivors become model inputs: fixed-size overlapping chunks, documents
packed into context windows, and the per-document lexical statistics
(type-token ratio, corpus-frequency score) that CCNet-style quality
bucketing keys on.

Determinism: everything is integer arithmetic over exact character/token
counts; ordering keys are md5 hashes both engines compute identically;
ratios leave through the integer-decided ratio_e4.  Shapes: chunking is
a pure narrow map (sequence + explode, in-row codegen); packing is one
window pass partitioned by source (the 100 TB parallelism axis — one
running sum per source shard, no global order); the lexical stats are
one (doc_id, token)-keyed hash-agg; the DF score reuses a single
exploded postings table for both sides of its join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ...catalog import table
from ...functions.deterministic import ratio_e4
from ...functions.texthash import tokens
from ...registry import query

# Chunking: 200-char windows advancing 150 chars (50-char overlap) — the
# shape of a fixed-context encoder's sliding input.
_CHUNK = 200
_STRIDE = 150

# Packing: greedy contiguous fill of 4096-char context windows.
_CAPACITY = 4096


@query(
    "q121_chunk_overlap",
    oracle=f"""
    WITH s AS (SELECT doc_id, text,
                      unnest(generate_series(1, len(text), {_STRIDE}))
                        AS chunk_start
               FROM documents)
    SELECT doc_id,
           CAST((chunk_start - 1) / {_STRIDE} AS BIGINT) AS chunk_id,
           CAST(chunk_start AS BIGINT) AS chunk_start,
           CAST(len(substring(text, chunk_start, {_CHUNK})) AS BIGINT)
             AS chunk_len,
           md5(substring(text, chunk_start, {_CHUNK})) AS chunk_md5
    FROM s
    """,
    category="llm-packing",
)
def q121_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: each document becomes 200-char
    chunks advancing by 150 (50-char overlap), the standard prep for
    fixed-context encoders and retrieval indexing.  Chunks are reported
    as (start, length, md5) — position-addressable without shipping the
    text twice.

    Shape: sequence(1, len, stride) + posexplode-free explode is
    entirely in-row whole-stage codegen — a narrow map with ZERO
    shuffles; output partitioning inherits the input's.  At 100 TB this
    is the ideal operator: embarrassingly parallel, no state.  Both
    engines' substring is 1-based and end-clamped, and md5 over
    identical bytes is identical."""
    d = table(spark, sf_dir, "documents")
    # Spark's sequence(1, 0, +step) raises (illegal boundaries) where
    # DuckDB's generate_series returns the empty set — guard so an empty
    # document yields zero chunks instead of crashing the job (same
    # short-input discipline as texthash.ngrams)
    starts = F.when(
        F.length("text") > 0,
        F.sequence(F.lit(1), F.length("text"), F.lit(_STRIDE)),
    ).otherwise(F.array().cast("array<int>"))
    c = F.expr(f"substring(text, chunk_start, {_CHUNK})")
    return (
        d.select("doc_id", "text", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            ((F.col("chunk_start") - 1) / _STRIDE)
            .cast("bigint")
            .alias("chunk_id"),
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.length(c).cast("bigint").alias("chunk_len"),
            F.md5(c).alias("chunk_md5"),
        )
    )


@query(
    "q122_pack_contexts",
    oracle=f"""
    WITH o AS (SELECT doc_id, source, n_chars,
                      md5(CAST(doc_id AS VARCHAR)) AS okey
               FROM documents),
    c AS (SELECT doc_id, source, n_chars,
                 SUM(n_chars) OVER (PARTITION BY source
                                    ORDER BY okey, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
          FROM o)
    SELECT doc_id, source,
           CAST((cum - n_chars) // {_CAPACITY} AS BIGINT) AS pack_window,
           CAST((cum - n_chars) % {_CAPACITY} AS BIGINT) AS window_offset,
           CAST(CASE WHEN (cum - 1) // {_CAPACITY}
                          > (cum - n_chars) // {_CAPACITY}
                     THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
    FROM c
    """,
    category="llm-packing",
)
def q122_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: documents are shuffled into a
    deterministic pseudo-random order (md5 of doc_id — the standard
    corpus shuffle) and packed contiguously into 4096-char context
    windows per source; each doc reports its window id, offset, and
    whether it straddles a boundary (the truncation/continuation the
    loader must handle).  This is the sequence-packing step that turns a
    curated corpus into dense training batches.

    Shape: ONE window pass partitioned by source — the packing order is
    per-source, so parallelism scales with sources, never a global
    total order (for a giant single source the same recipe re-keys on a
    salted split of the md5 ordering key — window ids then offset by a
    per-salt base exactly like cmd_import's per-split seq bases).  All
    arithmetic is exact nonnegative integers: Spark's div/% and
    DuckDB's //- agree on that domain."""
    d = table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("okey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("okey"),
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.sum("n_chars").over(w).alias("cum"),
    )
    start = F.col("cum") - F.col("n_chars")
    return c.select(
        "doc_id",
        "source",
        F.expr(f"(cum - n_chars) div {_CAPACITY}")
        .cast("bigint")
        .alias("pack_window"),
        (start % _CAPACITY).cast("bigint").alias("window_offset"),
        F.when(
            F.expr(f"(cum - 1) div {_CAPACITY}")
            > F.expr(f"(cum - n_chars) div {_CAPACITY}"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("spans_boundary"),
    )


@query(
    "q123_lexical_diversity",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
               FROM documents),
    g AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM t GROUP BY 1, 2),
    a AS (SELECT doc_id,
                 CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct,
                 CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
          FROM g GROUP BY 1)
    SELECT doc_id, n_tokens, n_distinct, n_hapax,
           (n_distinct * 20000 + n_tokens) // (2 * n_tokens) / 10000.0
             AS ttr_e4,
           (n_hapax * 20000 + n_tokens) // (2 * n_tokens) / 10000.0
             AS hapax_e4
    FROM a
    """,
    category="llm-quality",
)
def q123_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio and hapax
    (once-only word) share — the repetitiveness signals that separate
    natural prose from boilerplate/spam and complement q82's surface
    repetition filter with vocabulary-level evidence.

    Shape: explode + ONE hash-agg keyed by (doc_id, token) with
    map-side partials (a doc's tokens co-locate, so the second
    doc_id-keyed agg is nearly shuffle-free under the same hash), then
    integer-decided ratios.  The (doc, token) key is the same posting
    shape as q92's vocabulary — at 100 TB the agg output is bounded by
    corpus vocabulary, not corpus size."""
    d = table(spark, sf_dir, "documents")
    g = (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        g.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "n_hapax",
            ratio_e4("n_distinct", "n_tokens").alias("ttr_e4"),
            ratio_e4("n_hapax", "n_tokens").alias("hapax_e4"),
        )
    )


@query(
    "q124_df_score",
    oracle="""
    WITH ts AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                FROM documents),
    t AS (SELECT DISTINCT doc_id, token FROM ts),
    v AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY 1)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(v.df) AS BIGINT) AS sum_df,
           (SUM(v.df) * 20000 + COUNT(*)) // (2 * COUNT(*)) / 10000.0
             AS mean_df
    FROM t JOIN v USING (token)
    GROUP BY 1
    """,
    category="llm-quality",
)
def q124_df_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency score: each document's mean document-frequency
    over its distinct tokens — the cheap CCNet-style commonness proxy
    (low mean DF = rare/jargon/garbage vocabulary, high = boilerplate)
    used to bucket corpora by quality before expensive model scoring.

    Shape: the distinct (doc_id, token) postings table is computed ONCE
    and localCheckpoint-reused for both its aggregation into the
    vocabulary DF table and the scoring join back onto itself — one
    corpus-scale explode, not two (the q56/q77 reuse discipline).  The
    join keys on token; at 100 TB the vocabulary side is the
    aggregate's output (vocab-sized, heavy-tailed) and the join
    shuffles both sides on token — the posting list for a hot token is
    handled by the same AQE skew split as any hot key."""
    d = table(spark, sf_dir, "documents")
    t = (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    v = t.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        t.join(v, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("df").alias("sum_df"),
        )
        .select(
            "doc_id",
            "n_distinct",
            "sum_df",
            ratio_e4("sum_df", "n_distinct").alias("mean_df"),
        )
    )


@query(
    "q142_tokenizer_fertility",
    oracle="""
    WITH d AS (SELECT lang, CAST(n_chars AS BIGINT) AS nc,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
               FROM documents)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nc) AS BIGINT) AS total_chars,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           (SUM(nc) * 20000 + SUM(nt)) // (2 * SUM(nt)) / 10000.0
             AS chars_per_token,
           (SUM(nt) * 20000 + COUNT(*)) // (2 * COUNT(*)) / 10000.0
             AS tokens_per_doc
    FROM d GROUP BY 1
    """,
    category="llm-quality",
)
def q142_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: characters per token and
    tokens per document — the compression-rate table that decides
    whether a tokenizer (here the whitespace baseline) treats every
    language fairly; high chars/token languages pay more compute per
    byte of text.

    Shape: the token count is in-row array length (no explode — the
    cheapest of the token family), one hash-agg to |langs| rows,
    integer-decided ratios."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            F.col("n_chars").alias("nc"),
            F.size(tokens("text")).cast("bigint").alias("nt"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nc").alias("total_chars"),
            F.sum("nt").alias("total_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "total_chars",
            "total_tokens",
            ratio_e4("total_chars", "total_tokens").alias(
                "chars_per_token"
            ),
            ratio_e4("total_tokens", "n_docs").alias("tokens_per_doc"),
        )
    )


@query(
    "q143_length_percentiles",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(quantile_cont(n_chars, 0.25), 4) AS p25,
           ROUND(quantile_cont(n_chars, 0.50), 4) AS p50,
           ROUND(quantile_cont(n_chars, 0.75), 4) AS p75,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY 1
    """,
    category="llm-curation",
)
def q143_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution per source: exact interpolated
    quartiles plus the extremes — the first chart every corpus audit
    draws (truncated scrapes show as collapsed p75/max, boilerplate
    floods as a spiked p25).  Spark `percentile` and DuckDB
    `quantile_cont` share linear-interpolation semantics (the q27
    precedent), so the quartiles match exactly on integer inputs.

    Shape: one source-keyed percentile agg (exact form — the
    oracle-checkable twin of the mergeable approx_percentile q73
    surfaces for 100 TB)."""
    d = table(spark, sf_dir, "documents")
    ps = F.percentile(
        "n_chars", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            ps.alias("ps"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            "source",
            "n_docs",
            *[
                F.round(F.col("ps")[i], 4).alias(name)
                for i, name in enumerate(("p25", "p50", "p75"))
            ],
            "min_chars",
            "max_chars",
        )
    )
