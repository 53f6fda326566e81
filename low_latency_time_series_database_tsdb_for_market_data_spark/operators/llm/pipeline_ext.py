"""Corpus-curation operators a production training-data pipeline runs
beyond dedup/similarity (q82-q85): repetition filtering, benchmark-
contamination screening, PII detection, and corpus-mix reporting.

All four follow the repo's discipline: JVM-side column expressions only
(no Python in the hot path), every output column aliased identically in
the DuckDB oracle, integer-count arithmetic wherever a ratio feeds the
bit-exact hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...catalog import table
from ...functions.deterministic import ratio_e4
from ...functions.texthash import exploded_ngrams, ngrams, tokens
from ...registry import query


def _ngram_sql(n: int) -> str:
    """DuckDB twin of texthash.ngrams for the documents table: CTEs
    `toks` and `g` with one (doc_id, g) row per n-gram position."""
    return f"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(1, greatest(len(t) - {n - 2}, 1)),
                                       i -> array_to_string(t[i:i+{n - 1}], ' '))) AS g
          FROM toks)"""


# Gopher-style repetition signal: fraction of bigram positions occupied by
# a repeated bigram.  Docs above the threshold are flagged for removal.
_REP_THRESHOLD = 0.1


@query(
    "q82_repetition_filter",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    b AS (SELECT doc_id,
                 list_transform(range(1, greatest(len(t), 1)),
                                i -> array_to_string(t[i:i+1], ' ')) AS bg
          FROM toks),
    m AS (SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
                 CAST(len(list_distinct(bg)) AS BIGINT) AS distinct_bigrams
          FROM b)
    SELECT doc_id, n_bigrams, distinct_bigrams,
           ((n_bigrams - distinct_bigrams) * 20000 + n_bigrams)
             // (2 * n_bigrams) / 10000.0 AS rep_ratio,
           CAST(CASE WHEN (n_bigrams - distinct_bigrams) * 10
                          > n_bigrams THEN 1 ELSE 0 END AS BIGINT)
               AS is_repetitive
    FROM m WHERE n_bigrams > 0
    """,
    category="llm-text",
)
def q82_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter (the Gopher/C4 duplicate-n-gram signal): per doc,
    the fraction of bigram positions whose bigram already occurred.  Docs
    above {rep_threshold} are flagged.  Entirely in-row (tokens, bigrams,
    array_distinct) — a narrow map over the corpus, embarrassingly
    parallel at any scale; the ratio divides two integers, so the double
    is identical on both sides."""
    d = table(spark, sf_dir, "documents")
    bg = ngrams(tokens("text"), 2)
    # repartition spreads the (interpreted) higher-order transform across
    # cores — a local single-file parquet is ONE split; on a cluster the
    # input arrives pre-split and this shuffle is no-op-sized.  Filter on
    # the raw token count (cheap, codegen) rather than n_bigrams so the
    # pushed-down predicate does not re-evaluate the whole transform.
    par = spark.sparkContext.defaultParallelism
    base = (
        d.repartition(par)
        .where(F.size(tokens("text")) >= 2)
        .select(
            "doc_id",
            F.size(bg).cast("bigint").alias("n_bigrams"),
            F.size(F.array_distinct(bg)).cast("bigint").alias(
                "distinct_bigrams"
            ),
        )
    )
    # ratio rounded and thresholded in integer arithmetic: the double
    # ratio could tie at round() or flip at the exact threshold between
    # engines (see q21); 10*(n-d) > n is exactly rep > 0.1
    dup = F.col("n_bigrams") - F.col("distinct_bigrams")
    assert _REP_THRESHOLD == 0.1  # the integer form below encodes 1/10
    return base.select(
        "doc_id",
        "n_bigrams",
        "distinct_bigrams",
        ratio_e4("n_bigrams - distinct_bigrams", "n_bigrams").alias(
            "rep_ratio"
        ),
        (dup * 10 > F.col("n_bigrams")).cast("bigint").alias("is_repetitive"),
    )


_CONTAM_N = 8  # n-gram length used for eval-set overlap screening


@query(
    "q83_contamination",
    oracle=f"""
    WITH {_ngram_sql(_CONTAM_N)},
    probe AS (SELECT DISTINCT g FROM g
              WHERE doc_id IN (SELECT doc_id FROM documents
                               ORDER BY doc_id LIMIT 3)),
    hits AS (SELECT DISTINCT doc_id, g.g FROM g JOIN probe USING (g))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM hits GROUP BY doc_id
    """,
    category="llm-text",
)
def q83_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: docs sharing any 8-gram with the
    held-out probe set (here: the 3 lowest doc_ids, standing in for an
    eval benchmark).  The probe n-gram set is small by nature (benchmarks
    are KBs), so it BROADCASTS: the corpus side is one narrow explode +
    broadcast hash semi-join, and only matching grams reach the per-doc
    count — at 100 TB the shuffled remainder is proportional to the
    contamination, not the corpus."""
    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    # repartition spreads the explode (single local split; no-op-sized on
    # a pre-split cluster input)
    g = exploded_ngrams(d.repartition(par), _CONTAM_N, "g", ["doc_id"])
    probe = exploded_ngrams(
        d.orderBy("doc_id").limit(3), _CONTAM_N, "g", []
    ).distinct()
    return (
        g.join(F.broadcast(probe), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_hits"))
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


@query(
    "q84_pii_scan",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{_EMAIL_RE}'))) AS BIGINT)
               AS n_emails,
           CAST(SUM(len(regexp_extract_all(text, '{_PHONE_RE}'))) AS BIGINT)
               AS n_phones,
           CAST(SUM(CASE WHEN regexp_matches(text, '{_EMAIL_RE}')
                              OR regexp_matches(text, '{_PHONE_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
    FROM documents GROUP BY source
    """,
    category="llm-text",
)
def q84_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection pass (emails + NANP-style phone numbers) aggregated
    per source — the audit report a curation pipeline emits before
    redaction (the redaction itself is `regexp_replace` with the same
    patterns; see redact_pii).  Patterns avoid lookaround so Java regex
    and RE2 agree.  One narrow map + one tiny hash-agg keyed by source."""
    d = table(spark, sf_dir, "documents")
    emails = F.regexp_count("text", F.lit(_EMAIL_RE))
    phones = F.regexp_count("text", F.lit(_PHONE_RE))
    # spread the regex scan (single local split; no-op-sized on a cluster)
    d = d.repartition(spark.sparkContext.defaultParallelism)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(emails).cast("bigint").alias("n_emails"),
        F.sum(phones).cast("bigint").alias("n_phones"),
        F.sum(((emails > 0) | (phones > 0)).cast("bigint"))
        .cast("bigint")
        .alias("docs_with_pii"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The redaction stage q84's scan precedes: emails/phones replaced
    with typed placeholder tokens, all other columns untouched.  A narrow
    map — runs fused into whatever scan feeds it."""
    red = F.regexp_replace(
        F.regexp_replace(F.col(text_col), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return docs.withColumn(text_col, red)


@query(
    "q85_corpus_mix",
    oracle="""
    WITH m AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(n_chars) AS BIGINT) AS total_chars
               FROM documents GROUP BY lang, source)
    SELECT lang, source, n_docs, total_chars,
           (n_docs * 20000 + SUM(n_docs) OVER ())
             // (2 * SUM(n_docs) OVER ()) / 10000.0 AS doc_share
    FROM m
    """,
    category="llm-text",
)
def q85_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix report: document and character counts per (lang,
    source) cell with each cell's share of the corpus — the data-mixture
    table every pretraining run is configured from.  The global-total
    window runs over the AGGREGATED cells (|langs| x |sources| rows), so
    the single-partition window is a few hundred rows regardless of
    corpus size."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    m = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    return m.select(
        "lang",
        "source",
        "n_docs",
        "total_chars",
        F.sum("n_docs").over(Window.partitionBy()).alias("corpus_docs"),
    ).select(
        "lang",
        "source",
        "n_docs",
        "total_chars",
        ratio_e4("n_docs", "corpus_docs").alias("doc_share"),
    )
