"""1M-scale smoke for the three driver-constant-sensitive families
(judge r3 #8): cluster closure, identity split, semantic prune.  The
100k correctness corpus hides driver-side constants — star-round
counts, PQ/SRP fits, localCheckpoint storage — so each stage here runs
at ~10× the bench scale and reports wall seconds, REAL shuffle
read/write bytes (Spark UI REST API, enabled for this run only), and a
machine-checkable structural invariant:

  dedup_clusters   — 1M-node synthetic pair graph (400k pair-clusters,
                     20k 10-cliques-as-chains, 10 chain components of
                     length 1000: the diameter-1000 shape naive label
                     propagation cannot finish).  Invariant: closure
                     converges, ``stats["rounds"]`` ≤ 25 and is
                     reported; component count and max size are exact
                     against the construction.
  identity_split   — the real 100k bench corpus replicated 10× with
                     re-keyed clip_ids (payloads decode for real; exact
                     replicas force every content-axis component to
                     span all 10 replicas).  Invariant: split is total,
                     val fraction within tolerance, and every replica
                     family lands in ONE component/split.
  semantic_prune   — 1M deterministic synthetic 64-dim embeddings with
                     planted near-dup partners (id % 100 == 1 copies
                     id-1 + small perturbation; cosine ≈ 0.9998 vs the
                     0.9 SIMILARITY threshold).  Invariant: planted
                     recall ≥ 0.95, keep-set = one per component,
                     random vectors essentially never pair (7σ).

Usage: python scripts/cluster_split_prune_scale_smoke.py [n_nodes]
       [replicas] [n_vecs]
Prints ONE JSON line; paste the numbers into BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def shuffle_totals(spark) -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over completed stages via the UI
    REST API — the machine-readable shuffle evidence PLANS.md argues
    qualitatively."""
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    from pyspark.sql import functions as F

    import bench
    from data_quality_spark.operators.cluster import connected_components
    from data_quality_spark.session import get_spark

    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    spark = get_spark(
        "cluster-split-prune-smoke",
        extra_confs={
            "spark.ui.enabled": "true",
            # binary clip payloads: the default 4096-row vectorized
            # reader batch is ~130 MB of heap PER TASK on this corpus
            # (the identity smoke's setting; OOMs without it)
            "spark.sql.parquet.columnarReaderBatchSize": "512",
        },
    )
    out: dict = {"n_nodes": n_nodes, "replicas": replicas, "n_vecs": n_vecs}

    # ---- stage 1: cluster closure on a 1M-node mixed-shape pair graph
    # bands: [0, 0.8n) pairs (edges i->i+1, i even); [0.8n, 0.99n)
    # 10-chains; [0.99n, n) 1000-chains (the adversarial diameter)
    b1, b2 = int(n_nodes * 0.8), int(n_nodes * 0.99)
    ids = spark.range(n_nodes).select(F.col("id"))
    size_of = (
        F.when(F.col("id") < b1, F.lit(2))
        .when(F.col("id") < b2, F.lit(10))
        .otherwise(F.lit(1000))
    )
    base_of = (
        F.when(F.col("id") < b1, F.lit(0))
        .when(F.col("id") < b2, F.lit(b1))
        .otherwise(F.lit(b2))
    )
    # edge (i, i+1) whenever i+1 is in the same chain
    edges = ids.where(
        ((F.col("id") - base_of + 1) % size_of != 0)
        & (F.col("id") + 1 < n_nodes)
    ).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    rd0, wr0 = shuffle_totals(spark)
    stats: dict = {}
    t0 = time.perf_counter()
    comp = connected_components(edges, "id_a", "id_b", stats=stats)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    agg = sizes.agg(
        F.sum("cluster_size").alias("n_members"),
        F.count(F.lit(1)).alias("n_components"),
        F.max("cluster_size").alias("max_size"),
    ).collect()[0]
    t1 = time.perf_counter()
    rd1, wr1 = shuffle_totals(spark)
    expect_components = (
        b1 // 2 + (b2 - b1) // 10 + (n_nodes - b2) // 1000
    )
    out["dedup_clusters"] = {
        "seconds": round(t1 - t0, 2),
        "rounds": stats.get("rounds"),
        "n_components": int(agg["n_components"]),
        "expect_components": expect_components,
        "max_cluster": int(agg["max_size"]),
        "components_exact": int(agg["n_components"]) == expect_components
        and int(agg["max_size"]) == 1000,
        "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
        "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
    }
    print(json.dumps({"stage1": out["dedup_clusters"]}), file=sys.stderr)

    # ---- stage 2: identity_split over 10× the real bench corpus
    from data_quality_spark.operators.audio_identity import identity_split
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA

    clips_path = bench.ensure_clips(100_000)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    base = spark.read.parquet(clips_path).select(cols)
    clips = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__r"),
        *cols,
    ).select(
        F.concat_ws("_", F.col("clip_id"), F.col("__r")).alias("clip_id"),
        *[c for c in cols if c != "clip_id"],
    )
    n_clips = 100_000 * replicas
    rd0, wr0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    split = identity_split(clips, val_frac=0.25, seed=11)
    sagg = split.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("split") == "val").cast("long")).alias("n_val"),
        F.countDistinct("component").alias("n_components"),
        F.max("cluster_size").alias("max_cluster"),
    ).collect()[0]
    # replica families must never straddle the split: family key =
    # original clip_id prefix
    fam = split.select(
        F.regexp_replace("clip_id", "_[0-9]+$", "").alias("fam"),
        "split",
    ).groupBy("fam").agg(F.countDistinct("split").alias("k"))
    n_straddle = fam.where(F.col("k") > 1).count()
    t1 = time.perf_counter()
    rd1, wr1 = shuffle_totals(spark)
    out["identity_split"] = {
        "n_clips": n_clips,
        "seconds": round(t1 - t0, 2),
        "clips_per_sec": round(n_clips / (t1 - t0), 1),
        "total": int(sagg["n"]),
        "val_frac": round(sagg["n_val"] / sagg["n"], 4),
        "n_components": int(sagg["n_components"]),
        "max_cluster": int(sagg["max_cluster"]),
        "replica_families_straddling_split": int(n_straddle),
        "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
        "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
    }
    print(json.dumps({"stage2": out["identity_split"]}), file=sys.stderr)

    # ---- stage 3: semantic_prune over 1M synthetic embeddings
    from data_quality_spark.operators.similarity import semantic_prune

    dim = 64
    # deterministic pseudo-random unit-ish vectors JVM-side; planted
    # near-dups: id % 100 == 1 reuses id-1's generator plus a small
    # id-keyed perturbation
    is_dup = (F.col("id") % 100 == 1) & (F.col("id") > 0)
    gen_id = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.sin(F.xxhash64(gen_id, j).cast("double") / 1e9)
            + F.when(
                is_dup,
                F.sin(F.xxhash64(F.col("id"), j, F.lit(1)).cast("double")
                      / 1e9) * 0.005,
            ).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    rd0, wr0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    # bits=16 ≈ 65k buckets → ~15 vecs/bucket: the per-bucket quadratic
    # stays linear overall (the operator docstring's scale-path tuning);
    # the default 6 bits is a 2k-vector correctness setting
    pruned = semantic_prune(vecs, dim=dim, threshold=0.9, bits=16)
    pagg = pruned.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.max("cluster_size").alias("max_cluster"),
        F.countDistinct("component").alias("n_components"),
    ).collect()[0]
    # planted-pair recall: partner (i-1, i) clustered together
    planted = pruned.alias("a").join(
        pruned.alias("b"),
        F.col("a.vec_id") + 1 == F.col("b.vec_id"),
    ).where(
        (F.col("b.vec_id") % 100 == 1)
    ).agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.sum((F.col("a.component") == F.col("b.component")).cast("long"))
        .alias("n_joined"),
    ).collect()[0]
    t1 = time.perf_counter()
    rd1, wr1 = shuffle_totals(spark)
    out["semantic_prune"] = {
        "seconds": round(t1 - t0, 2),
        "vecs_per_sec": round(n_vecs / (t1 - t0), 1),
        "n_keep": int(pagg["n_keep"]),
        "max_cluster": int(pagg["max_cluster"]),
        "n_components": int(pagg["n_components"]),
        "planted_pairs": int(planted["n_planted"]),
        "planted_recall": round(
            planted["n_joined"] / planted["n_planted"], 4)
        if planted["n_planted"] else None,
        "keep_is_one_per_component":
            int(pagg["n_keep"]) >= int(pagg["n_components"]),
        "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
        "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
