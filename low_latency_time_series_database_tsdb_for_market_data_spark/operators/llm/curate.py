"""End-to-end training-corpus curation runner: the composition a real
preprocessing pipeline executes over the individual operators this
package ships — PII redaction (q84's regexes), repetition gate (q82's
duplicate-bigram signal), benchmark decontamination (q83's probe-gram
screen), exact + near dedup (q70's MinHash/LSH/connected-components
survivors), and the deterministic split assignment (q90).

This is a §2.4 non-query surface (a multi-job RUNNER, not a single
declarative query): it returns the curated corpus plus a one-row audit
report of per-stage removals.  The composition preserves each stage's
scale shape — every gate is a narrow map or a broadcast anti-join, the
only corpus-scale shuffles are the dedup pipeline's own, and stage
ordering is load-bearing (dedup runs AFTER the cheap in-row gates so
the expensive stage sees the smallest corpus; redaction runs first so
fingerprints and splits key on the text that actually ships).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ...functions.texthash import exploded_ngrams, ngrams, tokens
from .curation_ext import split_assign
from .dedup import candidate_edges, connected_components
from .pipeline_ext import _CONTAM_N, redact_pii


def _repetitive(text_col: str = "text") -> F.Column:
    """q82's integer-decided duplicate-bigram gate as a boolean column:
    more than 10% of bigram positions repeat an earlier bigram.  Docs
    too short to form a bigram are kept (they carry no signal)."""
    bg = ngrams(tokens(text_col), 2)
    n = F.size(bg)
    dup = n - F.size(F.array_distinct(bg))
    return (n >= 1) & (dup * 10 > n)


def contaminated_ids(docs: DataFrame, probes: DataFrame) -> DataFrame:
    """doc_ids sharing any {n}-gram with the probe texts (q83's screen
    as a reusable gate).  The probe gram set broadcasts — eval
    benchmarks are KBs — so the corpus side is one narrow explode +
    broadcast semi-join."""
    probe_grams = exploded_ngrams(probes, _CONTAM_N, "g", []).distinct()
    return (
        exploded_ngrams(docs, _CONTAM_N, "g", ["doc_id"])
        .join(F.broadcast(probe_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )


def curate_corpus(
    docs: DataFrame,
    probes: DataFrame | None = None,
    par: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation pipeline over a (doc_id, text, ...) corpus.

    Returns ``(curated, report)``: the surviving documents with their
    text redacted and a ``split`` column assigned, and a one-row audit
    frame with per-stage counts (the numbers a data lead signs off on
    before a training run).

    Stage order and cost model (100 TB framing):

    1. ``redact_pii`` — narrow map, fused into the scan.
    2. repetition gate — in-row bigram stats, narrow map.
    3. decontamination — broadcast anti-join against the probe grams
       (skipped when ``probes`` is None).
    4. exact + near dedup — the q70 pipeline on the already-thinned
       corpus; its own strict-cap/bounded-bucket guards apply.  The
       loser set (near-dup non-canonicals only) broadcasts into a
       left-anti join, so the subtraction is one narrow pass.
    5. ``split_assign`` — narrow map on the immutable doc_id.

    The intermediate corpus is localCheckpoint'd after the cheap gates:
    the dedup pipeline iterates over it (MinHash + connected-components
    fixpoint), and the report's stage counts reuse it instead of
    re-running the gates."""
    spark = docs.sparkSession
    if par is None:
        par = spark.sparkContext.defaultParallelism

    n_input = docs.count()

    base = redact_pii(docs)
    clean = base.where(~_repetitive())
    if probes is not None:
        bad = contaminated_ids(clean, redact_pii(probes))
        clean = clean.join(F.broadcast(bad), "doc_id", "left_anti")
    # materialize the thinned corpus once: dedup's iterative passes and
    # the report counts both read it
    clean = clean.localCheckpoint()
    n_gated = clean.count()

    edges = candidate_edges(clean, par)
    losers = (
        connected_components(edges)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    curated = clean.join(F.broadcast(losers), "doc_id", "left_anti")
    curated = curated.withColumn("split", split_assign())
    n_curated = curated.count()

    splits = {
        r["split"]: r["n"]
        for r in curated.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    report = spark.createDataFrame(
        [
            (
                n_input,
                n_input - n_gated,
                n_gated - n_curated,
                n_curated,
                splits.get("train", 0),
                splits.get("val", 0),
                splits.get("test", 0),
            )
        ],
        "n_input long, n_removed_gates long, n_removed_dedup long, "
        "n_curated long, n_train long, n_val long, n_test long",
    )
    return curated, report
