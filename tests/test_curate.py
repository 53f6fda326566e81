"""End-to-end curation runner (operators/llm/curate.py): a planted
corpus exercises every stage — PII redaction, repetition gate,
decontamination, exact dedup — and the audit report must reconcile
exactly with what survived.
"""

from __future__ import annotations

from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.curate import (
    curate_corpus,
)

# 8+ shared consecutive tokens with PROBE -> contaminated (q83's n=8)
_PROBE = "held out benchmark question about alpha beta gamma delta epsilon"

_DOCS = [
    # survives; email must ship redacted
    (1, "quick brown fox jumps over lazy dog near the river contact bob@example.com today"),
    # exact duplicate of doc 1 -> dedup loser (canonical = min doc_id)
    (2, "quick brown fox jumps over lazy dog near the river contact bob@example.com today"),
    # repetition gate: every bigram repeats
    (3, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    # contaminated: contains the probe's 8-gram run
    (4, "leaked copy held out benchmark question about alpha beta gamma delta epsilon end"),
    # survives: disjoint vocabulary from doc 1
    (5, "entirely different words describing machine learning corpora and tokenizer vocabularies here"),
]


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def _probe_df(spark):
    return spark.createDataFrame([(100, _PROBE)], "doc_id long, text string")


def test_curate_corpus_stages_and_report(spark):
    curated, report = curate_corpus(_docs_df(spark), probes=_probe_df(spark))
    rows = {r.doc_id: r for r in curated.collect()}
    assert set(rows) == {1, 5}
    r = report.collect()[0]
    assert (r.n_input, r.n_removed_gates, r.n_removed_dedup, r.n_curated) == (
        5,
        2,  # doc 3 (repetitive) + doc 4 (contaminated)
        1,  # doc 2 (exact dup of doc 1)
        2,
    )
    assert r.n_train + r.n_val + r.n_test == r.n_curated
    # PII left the corpus, split column assigned
    assert "<EMAIL>" in rows[1].text and "bob@example.com" not in rows[1].text
    assert all(v.split in ("train", "val", "test") for v in rows.values())


def test_curate_corpus_without_probes_keeps_contaminated(spark):
    curated, report = curate_corpus(_docs_df(spark))
    assert {r.doc_id for r in curated.collect()} == {1, 4, 5}
    assert report.collect()[0].n_removed_gates == 1  # only the repetitive doc


def test_curate_corpus_idempotent(spark):
    curated, _ = curate_corpus(_docs_df(spark), probes=_probe_df(spark))
    again, report2 = curate_corpus(curated.drop("split"))
    r2 = report2.collect()[0]
    assert (r2.n_removed_gates, r2.n_removed_dedup) == (0, 0)
    assert {x.doc_id for x in again.collect()} == {
        x.doc_id for x in curated.collect()
    }
