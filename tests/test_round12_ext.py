"""Round-12 additions: span-level dedup (q247), BM25 top-k (q248),
persisted pruned IVFPQ (q249 — plan contract in test_plan_contracts).
Planted-fixture semantics here; cross-engine exactness is covered by
the registry oracles (exact-audited at sf0.001/0.01/0.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.operators.round12_ext import (
    SPAN_W,
    _BM25_TOPK,
    q247_span_dedup,
    q248_bm25_topk,
    span_fingerprints,
)

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows], DOCS_SCHEMA
    )


def test_span_fingerprints_window_count_and_share(spark):
    """A doc with n tokens yields n - W + 1 windows; two docs sharing
    a W-token run share exactly the fingerprints of that run."""
    shared = " ".join(f"s{i}" for i in range(SPAN_W))  # exactly W tokens
    d = _docs(
        spark,
        [
            (0, shared + " tail0 tail1"),
            (1, "head0 head1 " + shared),
            (2, " ".join(f"u{i}" for i in range(SPAN_W + 2))),
            (3, "too short"),
        ],
    )
    fp = span_fingerprints(d)
    counts = {
        r["doc_id"]: r["n"]
        for r in fp.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # W + 2 tokens -> 3 windows each for docs 0-2; doc 3 has none
    assert counts == {0: 3, 1: 3, 2: 3}
    both = (
        fp.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .count()
    )
    # docs 0 and 1 share ONLY the exact shared run's single window
    assert both == 1


def test_q247_flags_cross_doc_spans_not_within_doc_repeats(spark, sf_dir):
    """The dup flag is CROSS-document (n_docs >= 2): a span repeated
    twice inside one doc does not mark it; every doc keeps its row
    (zero-window docs included) and the ratio is integer-decided."""
    shared = " ".join(f"s{i}" for i in range(SPAN_W))
    rep = " ".join(f"r{i}" for i in range(SPAN_W))
    rows = [
        (0, shared),                      # 1 window, duplicated in doc 1
        (1, shared),                      # exact twin
        (2, rep + " " + rep),             # self-repeat only
        (3, "tiny"),                      # no windows
    ]
    from low_latency_time_series_database_tsdb_for_market_data_spark.operators import (
        round12_ext as r12,
    )

    d = _docs(spark, rows)
    import unittest.mock as mock

    with mock.patch.object(r12, "table", lambda s, p, t: d):
        out = {r["doc_id"]: r for r in r12.q247_span_dedup(spark, sf_dir).collect()}
    assert out[0]["n_windows"] == 1 and out[0]["n_dup_windows"] == 1
    assert out[0]["dup_span_e4"] == 1.0
    assert out[1]["n_dup_windows"] == 1
    # within-doc repeat: both windows of the repeated span live in ONE
    # doc -> n_docs = 1 -> not flagged
    assert out[2]["n_dup_windows"] == 0
    assert out[3]["n_windows"] == 0 and out[3]["dup_span_e4"] == 0.0


def test_q248_query_doc_retrieves_itself(spark, sf_dir):
    """Each query is a real document's token set — BM25 must place the
    query document itself in the top-k (it matches every term; note a
    LONGER doc repeating the query's rare terms can legitimately
    outscore it — tf saturation times more matched postings — so
    rank 1 is not guaranteed, and at the fixtures it lands top-3).
    Ranks are dense 1..k, scores non-increasing and positive."""
    out = q248_bm25_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= _BM25_TOPK
        assert any(r["doc_id"] == qid for r in rows)
        scores = [r["score_e6"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_q248_rare_term_outweighs_common(spark):
    """IDF sanity on a planted corpus: a doc matching the query's RARE
    term must outscore a doc matching only the query's common term."""
    from low_latency_time_series_database_tsdb_for_market_data_spark.operators import (
        round12_ext as r12,
    )
    import unittest.mock as mock

    rows = [
        (0, "rare common"),            # the query doc
        (1, "rare alpha beta gamma"),  # matches the rare term
        (2, "common alpha beta gamma"),  # matches the common term
        (3, "common delta epsilon zeta"),
        (4, "common eta theta iota"),
        (5, "kappa lambda mu nu"),
    ]
    d = _docs(spark, rows)
    with mock.patch.object(r12, "table", lambda s, p, t: d):
        out = r12.q248_bm25_topk(spark, "unused").collect()
    s = {r["doc_id"]: r["score_e6"] for r in out if r["query_id"] == 0}
    assert s[1] > s[2], s


def test_q247_windows_match_duckdb_slice_semantics():
    """The oracle's DuckDB list slice toks[i:i+W-1] must mean exactly
    the W-element window the Spark ngrams() helper builds — pin the
    1-based-inclusive-both-ends reading so an engine upgrade that
    changes slice semantics fails HERE, not as a silent hash drift."""
    import duckdb

    got = duckdb.sql(
        f"SELECT ['a','b','c','d','e'][2:2+{SPAN_W - 1}] AS s"
    ).fetchone()[0]
    # W = 8 > remaining elements: clamped, like Spark's guarded ngrams
    assert got == ["b", "c", "d", "e"]
    got2 = duckdb.sql("SELECT ['a','b','c','d','e'][2:4] AS s").fetchone()[0]
    assert got2 == ["b", "c", "d"]


def test_q250_trims_cross_doc_spans_only(spark):
    """Trim semantics on a planted corpus: the shared span's tokens
    vanish from BOTH docs (kept text = the residue, hash-checked), a
    within-doc repeat survives untouched, a doc that IS the shared span
    trims to empty (md5('')), short docs pass through whole."""
    import hashlib

    import unittest.mock as mock

    from low_latency_time_series_database_tsdb_for_market_data_spark.operators import (
        round12_ext as r12,
    )

    shared = " ".join(f"s{i}" for i in range(SPAN_W))
    rep = " ".join(f"r{i}" for i in range(SPAN_W))
    rows = [
        (0, shared + " tail0"),         # shared span + residue
        (1, shared),                    # exactly the shared span
        (2, rep + " " + rep),           # self-repeat only: untouched
        (3, "tiny doc"),                # below W: untouched
    ]
    d = _docs(spark, rows)
    with mock.patch.object(r12, "table", lambda s, p, t: d):
        out = {r["doc_id"]: r for r in r12.q250_span_trim(spark, "x").collect()}

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # doc 0: windows at i=1 (shared, dup) and i=2 (unique) — i=1 covers
    # tokens 1..8, so only token 9 ("tail0") survives
    assert out[0]["n_removed"] == SPAN_W
    assert out[0]["n_kept"] == 1
    assert out[0]["kept_md5"] == md5("tail0")
    # doc 1: fully boilerplate -> empty survivor
    assert out[1]["n_kept"] == 0 and out[1]["kept_md5"] == md5("")
    # doc 2: its repeated span never crosses a document -> untouched
    assert out[2]["n_removed"] == 0
    assert out[2]["kept_md5"] == md5(rows[2][1])
    # doc 3: no windows at all -> untouched
    assert out[3]["n_removed"] == 0 and out[3]["kept_md5"] == md5("tiny doc")
