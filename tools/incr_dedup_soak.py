"""Incremental-dedup scale soak (round 10): fold a nightly batch into a
persisted 1M-doc dedup state and compare the cost against rebuilding
from scratch — the number that justifies the incremental path.

Usage:
    python tools/incr_dedup_soak.py [n_templates] [batch_templates] [--full]
    # default 100_000 templates -> 1M corpus docs, 10_000 -> 100k batch
    # --full additionally times dedup_state_build(A | B) and checks the
    # incremental survivors match it exactly

Corpus shape: dedup_soak.py's template recipe (10 docs/template: one
exact-dup pair, one near-dup, 7 distinct).  The batch mixes (a) NEW
templates (fresh clusters), (b) one extra near-dup doc attached to each
of the first batch_templates EXISTING templates (exercises the
cross-probe path against state), and (c) exact copies of existing
template heads (exercises the text-fingerprint match path).

Prints ONE JSON line with build/save/apply timings and the
apply-vs-full speedup.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.dedup_soak import N_TOKENS, gen_docs  # noqa: E402

from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.incremental import (  # noqa: E402,E501
    dedup_state_apply,
    dedup_state_build,
    dedup_survivors,
    load_dedup_state,
    save_dedup_state,
)


def gen_batch(
    spark: SparkSession, n_templates: int, batch_templates: int, id_base: int
) -> DataFrame:
    """Batch = new templates (disjoint vocab) + per-existing-template
    attachments: a SECOND near-dup (token flipped at a different
    position than the corpus's) and an exact copy of the template head."""
    new = gen_docs(spark, batch_templates).select(
        (F.col("doc_id") + id_base).alias("doc_id"),
        F.regexp_replace(
            F.regexp_replace("text", "d(\\d+)_", "d$1b_"),
            "t(\\d+)_",
            "t$1b_",
        ).alias("text"),
    )
    attach_base = spark.range(batch_templates).select(
        F.col("id").alias("tpl")
    )
    tok = F.concat(F.lit("t"), F.col("tpl").cast("string"), F.lit("_"))
    shared2 = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
            lambda j: F.when(
                j == 7,
                F.concat(F.lit("y"), F.col("tpl").cast("string")),
            ).otherwise(F.concat(tok, j.cast("string"))),
        ),
        " ",
    )
    head = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
            lambda j: F.concat(tok, j.cast("string")),
        ),
        " ",
    )
    near = attach_base.select(
        (F.col("tpl") + id_base + 10 * batch_templates).alias("doc_id"),
        shared2.alias("text"),
    )
    copies = attach_base.select(
        (F.col("tpl") + id_base + 11 * batch_templates).alias("doc_id"),
        head.alias("text"),
    )
    return new.unionByName(near).unionByName(copies)


def main() -> int:
    n_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch_templates = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    run_full = "--full" in sys.argv
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("incr-dedup-soak")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    tmp = tempfile.mkdtemp(prefix="incr_dedup_")

    docs_a = gen_docs(spark, n_templates).repartition(par).persist()
    n_a = docs_a.count()
    batch = gen_batch(spark, n_templates, batch_templates, n_a).persist()
    n_b = batch.count()

    t0 = time.perf_counter()
    state = dedup_state_build(docs_a, par)
    save_dedup_state(state, f"{tmp}/state")
    build_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    loaded = load_dedup_state(spark, f"{tmp}/state")
    new_state, delta = dedup_state_apply(loaded, batch, par)
    save_dedup_state(new_state, f"{tmp}/state2")
    apply_sec = time.perf_counter() - t0
    incr_survivors = dedup_survivors(
        load_dedup_state(spark, f"{tmp}/state2")
    ).count()

    out = {
        "docs_corpus": n_a,
        "docs_batch": n_b,
        "build_save_sec": round(build_sec, 1),
        "apply_save_sec": round(apply_sec, 1),
        "batch_docs_per_sec": round(n_b / apply_sec),
        "survivors_incr": incr_survivors,
    }
    if "--bucketed" in sys.argv:
        # round-11 point: state saved BUCKETED on the probe join keys,
        # fold with broadcast_probe=False — the big-batch regime where
        # the corpus-sized state side must stay exchange-free
        from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.incremental import (  # noqa: E501
            load_dedup_state_bucketed,
            save_dedup_state_bucketed,
        )
        from low_latency_time_series_database_tsdb_for_market_data_spark.sources.bucketing import (  # noqa: E501
            drop_table,
        )

        t0 = time.perf_counter()
        save_dedup_state_bucketed(state, "soak_dstate", n_buckets=64)
        bsave_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        bloaded = load_dedup_state_bucketed(spark, "soak_dstate")
        bstate, _ = dedup_state_apply(
            bloaded, batch, par, broadcast_probe=False
        )
        save_dedup_state(bstate, f"{tmp}/bstate2")
        bapply_sec = time.perf_counter() - t0
        b_survivors = dedup_survivors(
            load_dedup_state(spark, f"{tmp}/bstate2")
        ).count()
        out["bucketed_save_sec"] = round(bsave_sec, 1)
        out["bucketed_apply_sec"] = round(bapply_sec, 1)
        out["bucketed_survivors_match"] = b_survivors == incr_survivors
        for t in (
            "soak_dstate_texts", "soak_dstate_bands", "soak_dstate_members"
        ):
            drop_table(spark, t)
        assert out["bucketed_survivors_match"], out
    if run_full:
        t0 = time.perf_counter()
        full = dedup_state_build(docs_a.unionByName(batch), par)
        save_dedup_state(full, f"{tmp}/full")
        full_sec = time.perf_counter() - t0
        full_survivors = dedup_survivors(
            load_dedup_state(spark, f"{tmp}/full")
        ).count()
        out["full_rebuild_sec"] = round(full_sec, 1)
        out["speedup_vs_full"] = round(full_sec / apply_sec, 2)
        out["survivors_full"] = full_survivors
        out["survivors_match"] = full_survivors == incr_survivors
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)
    if run_full:
        assert out["survivors_match"], out
    return 0


if __name__ == "__main__":
    sys.exit(main())
