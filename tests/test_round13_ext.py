"""Round-13 additions: deterministic BPE trainer (q251), maximal-span
islands (q252), filtered persisted ANN (q253 machinery).  Planted-
fixture semantics here; cross-engine exactness is covered by the
registry oracles (exact-audited at sf0.001/0.01/0.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.bpe import (
    _apply_merge,
    _word_vocab,
    bpe_train,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.operators.round13_ext import (
    q252_span_islands,
)
from low_latency_time_series_database_tsdb_for_market_data_spark.operators.round12_ext import (
    SPAN_W,
)

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows], DOCS_SCHEMA
    )


# ---------------------------------------------------------------------------
# BPE trainer
# ---------------------------------------------------------------------------


def _vocab(spark, rows):
    return spark.createDataFrame(rows, "word string, freq bigint")


def test_bpe_first_merge_is_argmax_pair_with_tie_break(spark):
    """Pair counts weight by word frequency; ties break on the
    lexicographically smallest (left, right)."""
    # pairs: (a,b) freq 3 (from 'ab' x3); (b,a)+(a,b)... keep it exact:
    # 'ab' x3 -> (a,b):3 ; 'cd' x2 -> (c,d):2 ; 'ba' x3 -> (b,a):3
    # argmax count 3 tie between (a,b) and (b,a) -> (a,b) wins
    v = _vocab(spark, [("ab", 3), ("cd", 2), ("ba", 3)])
    state, merges = bpe_train(v, n_merges=1)
    assert merges[0] == ("a", "b", 3)
    got = {r["word"]: r["syms"] for r in state.collect()}
    assert got["ab"] == ["ab"]
    assert got["ba"] == ["b", "a"]  # (b,a) untouched by the (a,b) merge
    assert got["cd"] == ["c", "d"]


def test_bpe_greedy_merge_is_leftmost_non_overlapping(spark):
    """'aaaa' under (a,a) must become [aa, aa]; 'aaa' -> [aa, a] —
    the fresh token never re-merges within the same pass."""
    v = _vocab(spark, [("aaaa", 5), ("aaa", 1)])
    state, merges = bpe_train(v, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    # pair count includes overlapping adjacencies: 3*5 + 2*1 = 17
    assert merges[0][2] == 17
    got = {r["word"]: r["syms"] for r in state.collect()}
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]


def test_bpe_successive_merges_compose_and_stop_when_exhausted(spark):
    """Merged symbols participate in later steps; training stops
    early (short merge table) once no adjacent pair remains."""
    v = _vocab(spark, [("abab", 4)])
    state, merges = bpe_train(v, n_merges=10)
    # step1 (a,b)->ab x2 ; step2 (ab,ab)->abab ; then exhausted
    assert [m[:2] for m in merges] == [("a", "b"), ("ab", "ab")]
    assert [r["syms"] for r in state.collect()] == [["abab"]]


def test_apply_merge_fold_handles_carry_and_tail(spark):
    """The fold flushes its carry correctly at merges and at the end
    of the array (tail symbol after a merge, lone trailing symbol)."""
    df = spark.createDataFrame(
        [(["x", "a", "b", "a"],), (["a", "b"],), (["b"],), ([],)],
        "syms array<string>",
    )
    got = [
        r["m"]
        for r in df.select(
            _apply_merge(F.col("syms"), "a", "b").alias("m")
        ).collect()
    ]
    assert got == [["x", "ab", "a"], ["ab"], ["b"], []]


def test_bpe_driver_and_distributed_paths_agree(spark):
    """The size-dispatched driver trainer and the distributed loop
    produce identical merge tables and final symbolizations on the
    same vocabulary (the connected_components dual-path discipline)."""
    rows = [
        ("abab", 4), ("aaab", 3), ("bbaa", 2), ("cab", 7), ("x", 1),
    ]
    v = _vocab(spark, rows)
    st_drv, m_drv = bpe_train(v, n_merges=6)  # under threshold
    st_dist, m_dist = bpe_train(v, n_merges=6, driver_vocab_max=0)
    assert m_drv == m_dist
    got_drv = {r["word"]: r["syms"] for r in st_drv.collect()}
    got_dist = {r["word"]: r["syms"] for r in st_dist.collect()}
    assert got_drv == got_dist


def test_word_vocab_excludes_empty_words(spark):
    d = _docs(spark, [(0, "aa bb aa"), (1, "bb")])
    got = {r["word"]: r["freq"] for r in _word_vocab(d).collect()}
    assert got == {"aa": 2, "bb": 2}


# ---------------------------------------------------------------------------
# q252 span islands
# ---------------------------------------------------------------------------


def test_q252_merges_overlapping_windows_into_maximal_spans(spark, sf_dir, monkeypatch):
    """Two overlapping duplicated windows merge into ONE maximal span
    of W+1 tokens; a second disjoint duplicated run is its own span;
    clean docs keep an all-zero row."""
    import low_latency_time_series_database_tsdb_for_market_data_spark.operators.round13_ext as r13

    run1 = " ".join(f"s{i}" for i in range(SPAN_W + 1))  # W+1 shared tokens
    run2 = " ".join(f"t{i}" for i in range(SPAN_W))  # W shared tokens
    d = _docs(
        spark,
        [
            (0, run1 + " u0 u1 u2 " + run2),
            (1, "v0 " + run1 + " w0 w1 " + run2),
            (2, "clean " + " ".join(f"c{i}" for i in range(SPAN_W))),
        ],
    )
    monkeypatch.setattr(
        r13, "table", lambda spark_, sf_dir_, name: d
    )
    got = {
        r["doc_id"]: (
            r["n_spans"], r["n_covered"], r["longest_span"],
            r["first_span_start"],
        )
        for r in q252_span_islands(spark, sf_dir).collect()
    }
    # doc 0: run1 covers tokens 1..W+1 (one island from 2 overlapping
    # windows), run2 covers its own W tokens
    assert got[0] == (2, (SPAN_W + 1) + SPAN_W, SPAN_W + 1, 1)
    assert got[1] == (2, (SPAN_W + 1) + SPAN_W, SPAN_W + 1, 2)
    assert got[2] == (0, 0, 0, 0)


# ---------------------------------------------------------------------------
# q253 machinery: metadata columns in the index + filtered probe
# ---------------------------------------------------------------------------


def test_ivfpq_index_extra_cols_roundtrip_and_prefilter(spark, tmp_path):
    """extra_cols ride the index rows through the partitioned write and
    re-open; a prefilter restricts scoring to matching rows only."""
    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.similarity import (
        ivfpq_index,
        ivfpq_search,
        ivfpq_train,
        read_ivfpq_index,
        train_centroids,
        write_ivfpq_index,
    )

    rows = [
        (i, [float(i % 7) / 7.0, float((i * 3) % 5) / 5.0], i % 2)
        for i in range(64)
    ]
    e = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    cents = train_centroids(e, k=2, iters=2)
    books = ivfpq_train(e, cents, m=2, k=4, iters=2, sample=64)
    path = str(tmp_path / "idx")
    write_ivfpq_index(
        ivfpq_index(e, cents, books, extra_cols=("label",)), path
    )
    persisted = read_ivfpq_index(spark, path, extra_cols=("label",))
    assert persisted.columns == ["vec_id", "centroid", "code", "label"]
    assert persisted.count() == 64
    got = ivfpq_search(
        persisted, cents, books, [0.5, 0.5], nprobe=2, topk=64,
        prefilter=F.col("label") == 1,
    ).collect()
    ids = {r["vec_id"] for r in got}
    assert ids == {i for i in range(64) if i % 2 == 1}
