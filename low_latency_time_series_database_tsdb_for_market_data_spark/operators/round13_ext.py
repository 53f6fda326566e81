"""Round-13 depth additions (q252+): maximal-span reporting for the
substring-dedup trim path.

Same discipline as every extension block: exact integer arithmetic for
every published number, shuffle shapes that carry digests/indexes
rather than text, per-stage 100 TB notes.  Reference parity: the
reference stops at scan/count (`timeseries_db.cpp:29-233`); these
extend SURVEY §2.2's LLM-pipeline rows.  (q251_bpe_fertility lives in
``llm/bpe.py`` beside its trainer; q253_ann_filtered_verdict beside
the ANN machinery in ``llm/similarity.py``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .round12_ext import SPAN_W, span_fingerprints_pos

# ---------------------------------------------------------------------------
# q252: maximal duplicated spans (gaps-and-islands over q250's covered set)
# ---------------------------------------------------------------------------


@query(
    "q252_span_islands",
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
    isl AS (SELECT doc_id, idx,
                   idx - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY idx) AS grp
            FROM cov),
    sp AS (SELECT doc_id, grp,
                  CAST(COUNT(*) AS BIGINT) AS span_len,
                  CAST(MIN(idx) AS BIGINT) AS span_start
           FROM isl GROUP BY 1, 2),
    a AS (SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_spans,
                 CAST(SUM(span_len) AS BIGINT) AS n_covered,
                 CAST(MAX(span_len) AS BIGINT) AS longest_span,
                 CAST(MIN(span_start) AS BIGINT) AS first_span_start
          FROM sp GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(a.n_spans, 0) AS n_spans,
           COALESCE(a.n_covered, 0) AS n_covered,
           COALESCE(a.longest_span, 0) AS longest_span,
           COALESCE(a.first_span_start, 0) AS first_span_start
    FROM documents d LEFT JOIN a USING (doc_id)
    """,
    category="llm-dedup",
)
def q252_span_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL duplicated spans per document (round-12 verdict item #4
    — the Lee et al. 2022 §4 reporting shape the fixed-width family
    lacked): q250 decides WHICH tokens are covered by a cross-document
    duplicated width-{SPAN_W} window; this merges the covered-index
    set into maximal contiguous intervals via gaps-and-islands (q37's
    sessionization machinery on token indexes: idx - row_number is
    constant exactly within a contiguous run) and reports, per
    document, the span count, covered-token total, longest maximal
    span, and first span start — "N maximal spans, longest L", the
    duplication PROFILE a trim policy reviews before executing q250.
    (The corpus-level span-length histogram is one further groupBy
    over the same islands frame.)

    Shape: REUSES the q247/q250 fingerprint pass — the only
    corpus-token work is the window fingerprint scan; the covered set
    explodes ONLY duplicated windows x {SPAN_W} (proportional to
    duplication found), and the islands window partitions by doc_id
    over that duplication-sized frame (never the corpus tape).  Final
    frame LEFT JOINS from documents so clean documents keep their
    all-zero row (the q227 disjoint-group edge rule, and the q250
    NULL-text rule).  At 100 TB every shuffle after the scan carries
    (doc_id, idx) pairs bounded by the duplication actually present."""
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
    isl = cov.withColumn(
        "grp",
        F.col("idx")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("idx")),
    )
    sp = isl.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("span_len"),
        F.min("idx").alias("span_start"),
    )
    a = sp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("n_covered"),
        F.max("span_len").alias("longest_span"),
        F.min("span_start").alias("first_span_start"),
    )
    return (
        d.select("doc_id")
        .join(a, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("n_covered", F.lit(0))
            .cast("bigint")
            .alias("n_covered"),
            F.coalesce("longest_span", F.lit(0))
            .cast("bigint")
            .alias("longest_span"),
            F.coalesce("first_span_start", F.lit(0))
            .cast("bigint")
            .alias("first_span_start"),
        )
    )
