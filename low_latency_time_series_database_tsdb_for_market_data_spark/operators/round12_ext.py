"""Round-12 depth additions (q247+): substring/span-level exact dedup
and BM25 top-k lexical retrieval — the two first-class LLM-pipeline
operators the round-11 verdict ranked highest (all shipped dedup was
document-level; q124's DF scores had no per-query ranking twin).

Same discipline as every extension block: exact integer arithmetic for
every published number (BM25's ln terms quantize to integer micro-nats
on integer counts before any accumulation — the q194 rule), shuffle
shapes that carry digests/term-ids rather than text, and per-stage
notes on what each shuffle weighs at 100 TB.  Reference parity: the
reference stops at scan/count (`timeseries_db.cpp:29-233`); these
extend SURVEY §2.2's LLM-pipeline rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.deterministic import ratio_e4
from ..functions.texthash import tokens
from ..registry import query

# ---------------------------------------------------------------------------
# q247: substring/span-level exact dedup (fixed-width rolling windows)
# ---------------------------------------------------------------------------

# Span width in TOKENS.  The public method this re-expresses is
# suffix-array substring dedup (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): remove/flag spans that
# repeat ACROSS documents even when the documents as wholes are unique.
# A full suffix array is replaced by the scale-safe Spark shape: every
# width-W token window becomes a rolling fingerprint (md5 of the
# window text — computed in-row, so only 16-byte digests ever
# shuffle), and a window repeated in >= 2 distinct documents marks a
# duplicated span.  W = 8 at the fixture's 10-100-token documents
# corresponds to the ~50-token threshold of the paper at web-document
# lengths: long enough that natural re-use is implausible, short
# enough that planted near-dups overlap in many windows.
SPAN_W = 8


@query(
    "q247_span_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    w AS (SELECT doc_id,
                 md5(list_aggr(toks[i:i+{SPAN_W - 1}], 'string_agg', ' '))
                   AS fp
          FROM t, unnest(generate_series(1, len(toks) - {SPAN_W} + 1))
                    AS u(i)
          WHERE len(toks) >= {SPAN_W}),
    g1 AS (SELECT fp, doc_id, CAST(COUNT(*) AS BIGINT) AS occ
           FROM w GROUP BY 1, 2),
    g2 AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM g1 GROUP BY 1),
    tot AS (SELECT doc_id, CAST(SUM(occ) AS BIGINT) AS n_windows
            FROM g1 GROUP BY 1),
    dup AS (SELECT g1.doc_id, CAST(SUM(occ) AS BIGINT) AS n_dup
            FROM g1 JOIN g2 USING (fp)
            WHERE g2.n_docs >= 2 GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(t.n_windows, 0) AS n_windows,
           COALESCE(p.n_dup, 0) AS n_dup_windows,
           CASE WHEN COALESCE(t.n_windows, 0) = 0 THEN 0.0
                ELSE ((COALESCE(p.n_dup, 0) * 20000 + t.n_windows)
                      // (2 * t.n_windows)) / 10000.0
           END AS dup_span_e4
    FROM documents d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN dup p USING (doc_id)
    """,
    category="llm-dedup",
)
def q247_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring/span-level exact dedup (round-12 verdict item #2 —
    the one LLM-pipeline dedup granularity the doc-level family
    misses): every width-{SPAN_W} token window becomes a rolling
    fingerprint; a fingerprint seen in >= 2 DISTINCT documents marks a
    cross-document repeated span (boilerplate, licence blocks,
    templated paragraphs — Lee et al. 2022's target).  Per document:
    total windows, windows lying inside a repeated span, and the
    duplicated-span ratio — the span-trim decision signal (a document
    with dup_span_e4 near 1 is pure boilerplate even if no WHOLE-doc
    twin exists, invisible to minhash at doc granularity).

    Shape: the window explode + md5 is in-row codegen (the q121 chunk
    machinery generalized to stride 1), and ONLY (doc_id, fp) digest
    pairs leave the scan — text never shuffles.  Cost ladder:
    one (fp, doc_id)-keyed hash-agg (corpus-token-scale, the honest
    price of looking at every token, ~16+8 bytes/row with map-side
    partials), then everything downstream is SPAN-VOCABULARY-scale:
    the n_docs agg, the fp-keyed join back (both sides
    vocabulary-sized), two |docs|-row aggs, two doc-keyed joins.
    Never corpus^2: no pair generation at any stage — span identity is
    resolved by the groupBy, exactly how exact-dedup (q50) resolves
    document identity.  At 100 TB the fp agg is the same shape as
    q194's vocabulary table; a hot span (per-site boilerplate repeated
    1e6 x) is one heavy fp key handled by AQE skew split, never a
    pair explosion.  Empty/short documents (< {SPAN_W} tokens) emit
    zero windows but keep their row (left joins + coalesce — the q227
    disjoint-group edge rule)."""
    d = table(spark, sf_dir, "documents")
    x = span_fingerprints(d)
    g1 = x.groupBy("fp", "doc_id").agg(F.count(F.lit(1)).alias("occ"))
    g1 = g1.localCheckpoint(eager=False)  # 3 consumers, one shuffle
    g2 = g1.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = g1.groupBy("doc_id").agg(F.sum("occ").alias("n_windows"))
    dup = (
        g1.join(g2.where(F.col("n_docs") >= 2), "fp")
        .groupBy("doc_id")
        .agg(F.sum("occ").alias("n_dup"))
    )
    return (
        d.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup_windows"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0)
            )
            .otherwise(
                ratio_e4("COALESCE(n_dup, 0)", "n_windows")
            )
            .alias("dup_span_e4"),
        )
    )


def span_fingerprints(d: DataFrame, width: int = SPAN_W) -> DataFrame:
    """q247's window pass as a reusable transform: (doc_id, fp) rolling
    fingerprint rows, one per width-``width`` token window — the input
    to any span-level policy (report, trim, cross-corpus contamination
    probe).  In-row codegen; only digests leave the scan.

    POSITIONS-FIRST, not ngrams()+explode: exploding the position
    sequence and building each window string as a TOP-LEVEL projection
    (concat_ws over ``width`` element_at lookups) keeps the whole pass
    inside whole-stage codegen, where the equivalent higher-order
    ``transform`` lambda runs INTERPRETED per window — measured 24x
    (8.1 s -> 0.34 s for sf0.1's 236k windows on the fixture's single
    split), value-identical."""
    toks = tokens("text")
    return (
        d.select("doc_id", toks.alias("__toks"))
        .where(F.size("__toks") >= width)
        .select(
            "doc_id",
            "__toks",
            F.explode(
                F.sequence(F.lit(1), F.size("__toks") - (width - 1))
            ).alias("__i"),
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ",
                    *[
                        F.element_at("__toks", F.col("__i") + k)
                        for k in range(width)
                    ],
                )
            ).alias("fp"),
        )
    )


# ---------------------------------------------------------------------------
# q248: BM25 top-k lexical retrieval
# ---------------------------------------------------------------------------

# Okapi BM25 with the standard k1 = 1.2, b = 0.75.  The per-term score
#
#   idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
#
# multiplied through by 10*T (T = total corpus tokens, avgdl = T/N)
# becomes the ALL-INTEGER rational
#
#   idf_micro * 22*tf*T / (10*tf*T + 3*T + 9*dl*N)
#
# so the only float is idf's ln — computed by both engines on
# IDENTICAL integer counts and quantized to micro-nats (the q194
# rule), after which each term's contribution is one exact integer
# division and the document score is an order-free BIGINT sum.  The
# products are widened BEFORE multiplying (q162 rule): idf_micro ~ 2e7
# x 22 x tf x T overflows int64 past ~1e9 corpus tokens.
_BM25_TOPK = 10

_BM25_IDF_SQL = (
    "CAST(ROUND(ln((CAST(nn AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)"
    " * 1000000) AS BIGINT)"
)


def _bm25_contrib_sql(big: str, intdiv: str) -> str:
    """The per-(query-term, doc) BM25 contribution in exact integer
    arithmetic — IDENTICAL expression text on both engines (the q227
    shared-fragment rule) modulo the wide type (DECIMAL(38,0) vs
    HUGEINT) and the integer-division spelling (div vs //)."""
    return (
        f"CAST((CAST(idf AS {big}) * 22 * tf * tt) {intdiv} "
        f"(CAST(10 AS {big}) * tf * tt + 3 * tt"
        f" + 9 * CAST(dl AS {big}) * nn) AS BIGINT)"
    )


@query(
    "q248_bm25_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
           FROM tf GROUP BY 1),
    dfv AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
            FROM tf GROUP BY 1),
    sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                  CAST(SUM(dl) AS BIGINT) AS tt FROM dl),
    qt AS (SELECT doc_id AS query_id, token FROM tf WHERE doc_id < 4),
    idf AS (SELECT qt.query_id, qt.token, {_BM25_IDF_SQL} AS idf
            FROM qt JOIN dfv USING (token), sc),
    j AS (SELECT i.query_id, tf.doc_id,
                 {_bm25_contrib_sql("HUGEINT", "//")} AS contrib
          FROM idf i
          JOIN tf USING (token)
          JOIN dl ON tf.doc_id = dl.doc_id, sc),
    s AS (SELECT query_id, doc_id,
                 CAST(SUM(contrib) AS BIGINT) AS score_e6
          FROM j GROUP BY 1, 2),
    r AS (SELECT query_id, doc_id, score_e6,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY score_e6 DESC, doc_id)
                   AS rnk
          FROM s)
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score_e6
    FROM r WHERE rnk <= {_BM25_TOPK}
    """,
    category="llm-retrieval",
)
def q248_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{_BM25_TOPK} lexical retrieval (round-12 verdict item
    #3 — the lexical twin of the ANN family): a 4-query panel (the
    distinct token sets of documents 0-3, the deterministic stand-in
    for user queries) is scored against the whole corpus with Okapi
    BM25 (k1 = 1.2, b = 0.75) and the top {_BM25_TOPK} documents per
    query are ranked (score desc, doc_id tie-break).  Closed-form and
    fully oracle-able: idf quantizes to integer micro-nats on integer
    (N, df) counts, the tf-normalization is an exact integer rational
    (header note), scores are order-free BIGINT sums.

    Shape: ONE corpus explode feeds the (doc, token) tf agg, reused
    (pinned) for dl, df, and the postings join — the q124 single-
    postings-table discipline.  The query panel and its idf table are
    KB-sized broadcasts, so the only corpus-scale work is the postings
    join on token, which touches ONLY the query terms' posting lists
    (a broadcast hash join prunes every other token map-side — the
    inverted-index probe, not a corpus scan); the per-(query, doc)
    partial scores agg on (query_id, doc_id) — output bounded by the
    matched postings — and the top-k is a WindowGroupLimit map-side
    heap per query (q243's pattern), never a global sort.  At 100 TB
    a hot query term's posting list is one heavy join key (AQE skew
    split); batch retrieval with thousands of queries is the same
    plan with a bigger broadcast panel."""
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # feeds dl, df, and the probe
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfv = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    sc = dl.agg(
        F.count(F.lit(1)).alias("nn"), F.sum("dl").alias("tt")
    )
    qt = tf.where(F.col("doc_id") < 4).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    idf = (
        qt.join(dfv, "token")
        .crossJoin(F.broadcast(sc))
        .select("query_id", "token", F.expr(_BM25_IDF_SQL).alias("idf"))
    )
    j = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(sc))
        .select(
            "query_id",
            "doc_id",
            F.expr(_bm25_contrib_sql("DECIMAL(38,0)", "div")).alias(
                "contrib"
            ),
        )
    )
    s = j.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").cast("bigint").alias("score_e6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_e6"), F.asc("doc_id")
    )
    return (
        s.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _BM25_TOPK)
        .select(
            "query_id", F.col("rnk").cast("bigint").alias("rnk"),
            "doc_id", "score_e6",
        )
    )


# ---------------------------------------------------------------------------
# q250: span-TRIM survivors — the removal step q247's report feeds
# ---------------------------------------------------------------------------


def span_fingerprints_pos(d: DataFrame, width: int = SPAN_W) -> DataFrame:
    """(doc_id, i, fp): span_fingerprints keeping the 1-based window
    start position — the trim path needs to know WHERE the duplicated
    window sits.  Same codegen-positions shape."""
    toks = tokens("text")
    return (
        d.select("doc_id", toks.alias("__toks"))
        .where(F.size("__toks") >= width)
        .select(
            "doc_id",
            "__toks",
            F.explode(
                F.sequence(F.lit(1), F.size("__toks") - (width - 1))
            ).alias("i"),
        )
        .select(
            "doc_id",
            "i",
            F.md5(
                F.concat_ws(
                    " ",
                    *[
                        F.element_at("__toks", F.col("i") + k)
                        for k in range(width)
                    ],
                )
            ).alias("fp"),
        )
    )


@query(
    "q250_span_trim",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    w AS (SELECT doc_id, i,
                 md5(list_aggr(toks[i:i+{SPAN_W - 1}], 'string_agg', ' '))
                   AS fp
          FROM t, unnest(generate_series(1, len(toks) - {SPAN_W} + 1))
                    AS u(i)
          WHERE len(toks) >= {SPAN_W}),
    g1 AS (SELECT fp, doc_id FROM w GROUP BY 1, 2),
    g2 AS (SELECT fp FROM g1 GROUP BY 1 HAVING COUNT(*) >= 2),
    cov AS (SELECT DISTINCT w.doc_id, u.idx
            FROM w JOIN g2 USING (fp),
                 unnest(generate_series(w.i, w.i + {SPAN_W - 1})) u(idx)),
    tok AS (SELECT doc_id, idx, toks[idx] AS tk
            FROM t, unnest(generate_series(1, len(toks))) u(idx)),
    kept AS (SELECT tok.doc_id,
                    CAST(COUNT(*) AS BIGINT) AS n_kept,
                    md5(string_agg(tok.tk, ' ' ORDER BY tok.idx))
                      AS kept_md5
             FROM tok ANTI JOIN cov
               ON tok.doc_id = cov.doc_id AND tok.idx = cov.idx
             GROUP BY 1)
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           COALESCE(k.n_kept, 0) AS n_kept,
           CAST(len(string_split(d.text, ' ')) AS BIGINT)
             - COALESCE(k.n_kept, 0) AS n_removed,
           COALESCE(k.kept_md5, md5('')) AS kept_md5
    FROM documents d LEFT JOIN kept k USING (doc_id)
    """,
    category="llm-dedup",
)
def q250_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-TRIM survivors: the removal step of substring-level dedup
    (Lee et al. 2022 §4 delete the repeated span, not the document) —
    every token covered by a cross-document duplicated width-{SPAN_W}
    window is cut, and the trimmed document is published as (token
    counts, md5 of the kept text) so the rewrite is hash-verifiable
    without shipping text to the driver.  q247 reports the decision
    signal; this executes the policy — together they are the full
    span-dedup surface.

    Shape: dup-window starts come from the q247 pipeline (positions
    kept, digests only); the covered-index set explodes ONLY duplicated
    windows x {SPAN_W} (proportional to the duplication found, not the
    corpus), distinct-ed on (doc_id, idx).  The rewrite is one
    corpus-token posexplode anti-joined against the covered set on
    (doc_id, idx) — the one honest corpus-token shuffle a text rewrite
    costs — then per-doc reassembly via array_sort(collect_list) (kept
    tokens of one doc collapse to one row before md5).  Docs below the
    window width or with every token removed keep their row
    (left join + md5('') — the q227 edge rule).  At 100 TB: both heavy
    frames key on doc_id with map-side combine; a boilerplate-heavy doc
    is ONE key, never a pair explosion."""
    d = table(spark, sf_dir, "documents")
    fpw = span_fingerprints_pos(d).localCheckpoint(eager=False)
    g2 = (
        fpw.select("fp", "doc_id")
        .distinct()
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("fp")
    )
    cov = (
        fpw.join(g2, "fp")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + (SPAN_W - 1))
            ).alias("idx"),
        )
        .distinct()
    )
    tok = d.select(
        "doc_id",
        F.posexplode(tokens("text")).alias("pos0", "tk"),
    ).select("doc_id", (F.col("pos0") + 1).alias("idx"), "tk")
    # ONE corpus-token pass: mark covered tokens with a left join
    # (cov is distinct, so no fan-out) and compute kept count/hash in
    # the same per-doc agg — collect_list skips the NULLed covered
    # entries, so the kept text assembles directly.  The kept-token
    # reassembly is pure codegen: array_sort on the (idx, tk) structs,
    # then GetArrayStructFields (.tk) + array_join + md5 as top-level
    # projections — no higher-order lambda anywhere (ADVICE r12 /
    # the round-12 24x interpreted-HOF finding; the old F.transform
    # here ran interpreted once per output doc).
    marked = tok.join(
        cov.withColumn("__cov", F.lit(1)), ["doc_id", "idx"], "left"
    )
    kept_struct = F.when(
        F.col("__cov").isNull(), F.struct("idx", "tk")
    )
    agg = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count(kept_struct).alias("n_kept"),
        F.md5(
            F.array_join(
                F.array_sort(F.collect_list(kept_struct)).getField("tk"),
                " ",
            )
        ).alias("kept_md5"),
    ).localCheckpoint(eager=False)  # |docs|-row frame; pins the one
    # corpus-token pass so the doc_id spine below is the plan's only
    # live documents scan (single-scan contract — the q247 g1 shape)
    # final frame LEFT JOINS from documents (ADVICE r12: q247 and the
    # oracle both do; deriving rows from the posexplode alone would
    # silently drop a NULL-text doc — posexplode of NULL emits no row —
    # where the oracle keeps it with NULL n_tokens / 0 kept).  The
    # spine reads doc_id ONLY (text is never scanned twice); n_tokens
    # rides the token-pass agg, so a NULL-text doc has no agg row and
    # keeps NULL n_tokens / NULL n_removed, exactly the oracle's
    # len(string_split(NULL)) semantics; '' still counts 1 (split('')
    # is ['']) on both engines.
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
    )
