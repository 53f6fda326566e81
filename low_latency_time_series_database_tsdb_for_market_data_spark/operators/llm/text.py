"""Text-analysis operators over `documents` (q52, q53, q57-q61):
language-ID heuristic, quality scoring, token counting, simhash,
document fingerprinting.  All single-pass, JVM-side expression pipelines —
one narrow map + one hash agg each; nothing here shuffles document bodies
except the initial scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...catalog import table
from ...functions.deterministic import ratio_e4
from ...functions.texthash import SIMHASH_BITS, simhash16, tokens
from ...registry import query

# language-ID marker words (heuristic; priority order breaks ties)
_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "las"),
}
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")

# BPE-ish token regex: letter runs, digit runs, single other non-space
_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "q52_text_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           (SUM(n_chars) * 20000 + COUNT(*)) // (2 * COUNT(*)) / 10000.0
               AS avg_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
    category="llm-text",
)
def q52_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per language (exact integer sums; 4-decimal average
    decided in integer arithmetic — functions.ratio_e4, see q21)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .select(
            "lang",
            "n_docs",
            ratio_e4("sum_chars", "n_docs").alias("avg_chars"),
            "n_sources",
        )
    )


@query(
    "q53_doc_filter",
    oracle="""
    WITH bands AS (SELECT n_chars // 100 AS band, COUNT(*) AS band_total
                   FROM documents GROUP BY 1),
    f AS (SELECT doc_id, source, n_chars // 100 AS band
          FROM documents WHERE regexp_matches(text, 'data|query'))
    SELECT f.source, CAST(f.band AS BIGINT) AS band,
           COUNT(*) AS n, MAX(b.band_total) AS band_total
    FROM f JOIN bands b ON f.band = b.band
    GROUP BY f.source, f.band
    """,
    category="llm-text",
)
def q53_doc_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp-filtered docs joined to their length-band population — the
    band dimension is tiny and broadcast."""
    d = table(spark, sf_dir, "documents")
    band = F.expr("n_chars div 100")
    bands = d.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("band_total")
    )
    f = d.where(F.col("text").rlike("data|query")).select(
        "doc_id", "source", band.alias("band")
    )
    return (
        f.join(F.broadcast(bands), "band")
        .groupBy("source", F.col("band").cast("bigint").alias("band"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("band_total").alias("band_total"))
    )


def simhash_cte() -> str:
    """DuckDB CTE chain ending in ``sim(doc_id, simhash)`` — the 16-bit
    simhash per document, mirroring functions.texthash.simhash16
    bit-for-bit.  Shared by q57's oracle and q95's pair oracle."""
    sums = []
    for b in range(SIMHASH_BITS):
        nib = f"('0x' || substr(hh, {b // 4 + 1}, 1))::INT"
        bit = f"(({nib}) // {2 ** (3 - b % 4)}) % 2"
        sums.append(f"SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s{b}")
    assemble = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2 ** (SIMHASH_BITS - 1 - b)} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    h AS (SELECT doc_id, md5(w) AS hh FROM tok),
    bits AS (SELECT doc_id, {", ".join(sums)} FROM h GROUP BY doc_id),
    sim AS (SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM bits)"""


def _simhash_oracle() -> str:
    return f"WITH {simhash_cte()} SELECT doc_id, simhash FROM sim"


@query("q57_simhash", oracle=_simhash_oracle(), category="llm-dedup")
def q57_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from md5(token) bit votes.  Docs whose
    simhashes are within a small Hamming distance are near-dup candidates;
    the signature groupBy is the only shuffle."""
    return simhash_df(table(spark, sf_dir, "documents"))


def _simhash_votes_df(d: DataFrame, bits: int) -> DataFrame:
    """(doc_id, simhash) for a ``bits``-wide signature — the shared body
    of :func:`simhash_df` / :func:`simhash_df_wide`.

    Round-13 optimization (driver-side, guide §1.2 "per-task work"
    applied to the DRIVER): the old per-bit Column-object construction
    (5+ py4j round-trips per bit x 60 bits for the agg, another 3/bit
    for the assembly) cost ~1.5 s of pure Python/py4j time per build —
    more than the query's own executor time.  Building the identical
    expressions as SQL strings (one ``F.expr`` per vote column, ONE
    parse for the whole assembly) collapses that to a handful of parser
    calls.  The parsed trees are the same shift/and/case shapes, so
    values — and the DuckDB oracle equivalence — are bit-identical."""
    tok = d.select("doc_id", F.explode(tokens("text")).alias("w"))
    h = tok.selectExpr(
        "doc_id",
        f"CAST(CONV(SUBSTRING(md5(w), 1, {bits // 4}), 16, 10) AS BIGINT)"
        " AS pre",
    )
    votes = h.groupBy("doc_id").agg(
        *[
            F.expr(
                f"SUM(CASE WHEN ((pre >> {bits - 1 - b}) & 1) = 1"
                f" THEN 1 ELSE -1 END) AS s{b}"
            )
            for b in range(bits)
        ]
    )
    assemble = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({2 ** (bits - 1 - b)} AS BIGINT)"
        " ELSE 0 END)"
        for b in range(bits)
    )
    return votes.selectExpr(
        "doc_id", f"CAST({assemble} AS BIGINT) AS simhash"
    )


def simhash_df(d: DataFrame) -> DataFrame:
    """(doc_id, simhash): the q57 signature as a reusable transform —
    one explode + one doc-keyed hash-agg (map-side partial votes), the
    Spark twin of ``simhash_cte``.  q95 builds its banded pair search on
    top of this."""
    return _simhash_votes_df(d, SIMHASH_BITS)


def _langid_counts():
    return {
        lang: F.sum(F.when(F.col("w").isin(*words), 1).otherwise(0)).alias(f"c_{lang}")
        for lang, words in _MARKERS.items()
    }


@query(
    "q58_lang_id",
    oracle=f"""
    WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
    c AS (SELECT doc_id, lang,
          {", ".join(
              "SUM(CASE WHEN w IN (%s) THEN 1 ELSE 0 END) AS c_%s"
              % (", ".join(f"'{w}'" for w in words), lang)
              for lang, words in _MARKERS.items()
          )}
          FROM tok GROUP BY doc_id, lang)
    SELECT lang, CASE
        WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
        WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
        WHEN c_fr >= c_es THEN 'fr'
        ELSE 'es' END AS pred_lang,
        COUNT(*) AS n
    FROM c GROUP BY 1, 2
    """,
    category="llm-text",
)
def q58_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic; output is the (true lang x
    predicted lang) confusion count.  Priority order en>de>fr>es breaks
    ties deterministically."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens("text")).alias("w"))
    c = tok.groupBy("doc_id", "lang").agg(*_langid_counts().values())
    pred = (
        F.when(
            (F.col("c_en") >= F.col("c_de"))
            & (F.col("c_en") >= F.col("c_fr"))
            & (F.col("c_en") >= F.col("c_es")),
            "en",
        )
        .when((F.col("c_de") >= F.col("c_fr")) & (F.col("c_de") >= F.col("c_es")), "de")
        .when(F.col("c_fr") >= F.col("c_es"), "fr")
        .otherwise("es")
    )
    return (
        c.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q59_quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents),
    m AS (SELECT doc_id, n_chars,
                 CAST(len(toks) AS BIGINT) AS n_tok,
                 CAST(len(list_filter(toks, w -> w IN ({", ".join(f"'{w}'" for w in _STOPWORDS)}))) AS BIGINT) AS n_stop
          FROM t)
    SELECT doc_id, n_tok,
           (n_stop * 20000 + n_tok) // (2 * n_tok) / 10000.0 AS stop_ratio,
           ((600 * n_stop + 4 * n_tok * LEAST(n_tok, 100)) * 20000
            + 1000 * n_tok) // (2000 * n_tok) / 10000.0 AS score
    FROM m
    """,
    category="llm-text",
)
def q59_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score from stopword ratio + length saturation — the
    classic cheap pre-filter before expensive LLM processing.

    Both outputs are rationals of the integer counts, so the 4-decimal
    rounds are integer-decided (functions.ratio_e4, see q21):
    0.6*(s/t) + 0.4*min(t/100, 1) == (600s + 4*t*min(t,100)) / (1000t)
    exactly."""
    d = table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*_STOPWORDS))).cast("bigint")
    m = d.select("doc_id", n_tok.alias("n_tok"), n_stop.alias("n_stop"))
    return m.select(
        "doc_id",
        "n_tok",
        ratio_e4("n_stop", "n_tok").alias("stop_ratio"),
        ratio_e4(
            "600 * n_stop + 4 * n_tok * least(n_tok, 100)", "1000 * n_tok"
        ).alias("score"),
    )


@query(
    "q60_token_count",
    oracle=f"""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT)) AS BIGINT) AS n_re_tokens
    FROM documents GROUP BY source
    """,
    category="llm-text",
)
def q60_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per source: whitespace tokens + a BPE-ish regex
    tokenizer (letter runs / digit runs / single punctuation)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text")).cast("bigint")).alias("n_ws_tokens"),
        F.sum(F.regexp_count("text", F.lit(_TOKEN_RE)).cast("bigint")).alias(
            "n_re_tokens"
        ),
    )


@query(
    "q69_bigram_topk",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM toks)
    SELECT bigram, COUNT(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20
    """,
    category="llm-text",
)
def q69_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 bigrams — the n-gram frequency pass behind
    tokenizer training and contamination screens.  Explode is in-row
    codegen; the count's map-side partial agg collapses each partition
    to its distinct bigrams before the single shuffle, and the top-20 is
    TakeOrdered (per-partition heaps), so driver traffic is 20 rows no
    matter the corpus size."""
    d = table(spark, sf_dir, "documents")
    toks = tokens("text")
    # guard 1-token docs: sequence(1, size-1) would step DOWN to [1, 0]
    # when size == 1 and element_at(toks, 0) throws under ANSI mode
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # spread the explode ONLY when the input is under-split (a local
    # single-file parquet is ONE split; on a cluster the input arrives
    # pre-split and this branch never fires).  Fan-out is capped at
    # 8 x splits: exploding a few small splits across the full
    # defaultParallelism buys nothing and pays per-task overhead
    # (measured at sf0.1: 1 split -> x8 0.62 s vs x32 0.78 s vs none 2.6 s)
    par = spark.sparkContext.defaultParallelism
    splits = d.rdd.getNumPartitions()
    spread = d if splits >= par else d.repartition(min(par, 8 * splits))
    return (
        spread
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "q61_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fp,
           substr(md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))), 1, 8) AS fp8
    FROM documents
    """,
    category="llm-text",
)
def q61_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (whitespace-collapsed, lowercased
    md5) — the join key for cross-corpus exact dedup."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", " +", " ")))
    fp = F.md5(norm)
    return d.select("doc_id", fp.alias("fp"), F.substring(fp, 1, 8).alias("fp8"))


def simhash_df_wide(d: DataFrame, bits: int = 60) -> DataFrame:
    """(doc_id, simhash): the WIDE signature (default 60-bit — the q95
    docstring's documented 100 TB path: more signature bits -> more band
    values -> smaller buckets at the same recall).  Same one-explode +
    one-doc-keyed-agg shape as :func:`simhash_df`; the vote agg is just
    `bits` columns wide (expr-string built — see _simhash_votes_df)."""
    if bits % 4 or bits > 60:
        raise ValueError("bits must be a multiple of 4, at most 60")
    return _simhash_votes_df(d, bits)


def simhash_cte_wide(bits: int = 60) -> str:
    """DuckDB twin of :func:`simhash_df_wide` (generalized
    ``simhash_cte``): CTE chain ending in ``sim(doc_id, simhash)``."""
    sums = []
    for b in range(bits):
        nib = f"('0x' || substr(hh, {b // 4 + 1}, 1))::INT"
        bit = f"(({nib}) // {2 ** (3 - b % 4)}) % 2"
        sums.append(f"SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s{b}")
    assemble = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({2 ** (bits - 1 - b)} AS BIGINT)"
        f" ELSE 0 END)"
        for b in range(bits)
    )
    return f"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    h AS (SELECT doc_id, md5(w) AS hh FROM tok),
    bits AS (SELECT doc_id, {", ".join(sums)} FROM h GROUP BY doc_id),
    sim AS (SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM bits)"""
