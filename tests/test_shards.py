"""Training-shard packing (operators/shards.py).

Correctness model: the distributed two-phase prefix sum (per-bucket
totals + broadcast offsets + per-bucket windows) must be EXACTLY the
naive single-global-window law — every row's shard_id identical — and
assignment must be a pure function of (id, seed): repartitioning the
input cannot move a single row between shards.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.shards import (
    pack_sequences,
    sequence_manifest,
    shard_assign,
    shard_manifest,
)


def _docs(spark, n=400, n_langs=4, seed=3, with_nulls=True):
    import numpy as np

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "lang": rng.choice([f"l{i}" for i in range(n_langs)], size=n),
        "sz": rng.integers(1, 900, size=n).astype("float64"),
    })
    if with_nulls:
        pdf.loc[pdf.index % 37 == 5, "sz"] = None  # NULL packs as 0
        pdf.loc[pdf.index % 53 == 7, "sz"] = -4.0  # negative packs as 0
    return spark.createDataFrame(pdf), pdf


def _naive_shards(pdf, target, strata, seed):
    """The single-global-window law, in plain Python."""
    rows = []
    for _, r in pdf.iterrows():
        h = hashlib.md5(f"{int(r.doc_id)}:{seed}".encode()).hexdigest()
        sz = 0 if pd.isna(r.sz) else max(int(r.sz), 0)
        key = tuple(r[s] for s in strata)
        rows.append((key, h, int(r.doc_id), sz))
    out = {}
    by_key = {}
    for key, h, did, sz in rows:
        by_key.setdefault(key, []).append((h, did, sz))
    for key, items in by_key.items():
        run = 0
        for h, did, sz in sorted(items):
            out[did] = run // target
            run += sz
    return out


class TestShardAssign:
    def test_matches_naive_global_window(self, spark):
        df, pdf = _docs(spark)
        got = shard_assign(
            df, "sz", 5000, strata=["lang"], id_col="doc_id",
            seed=7, portable=True,
        ).select("doc_id", "shard_id").toPandas().set_index("doc_id")[
            "shard_id"]
        want = _naive_shards(pdf, 5000, ["lang"], 7)
        for did, sid in want.items():
            assert got[did] == sid, did

    def test_unstratified_and_partition_invariance(self, spark):
        df, pdf = _docs(spark, with_nulls=False)
        a = shard_assign(df, "sz", 3000, id_col="doc_id", seed=1,
                         portable=True)
        b = shard_assign(df.repartition(13), "sz", 3000, id_col="doc_id",
                         seed=1, portable=True)
        pa = a.select("doc_id", "shard_id").toPandas().set_index("doc_id")
        pb = b.select("doc_id", "shard_id").toPandas().set_index("doc_id")
        assert pa["shard_id"].sort_index().equals(
            pb["shard_id"].sort_index())
        want = _naive_shards(pdf, 3000, [], 1)
        for did, sid in want.items():
            assert pa["shard_id"][did] == sid

    def test_bucket_chars_is_an_implementation_knob(self, spark):
        # 16 vs 4096 buckets must give the identical assignment
        df, _ = _docs(spark, n=200)
        a = shard_assign(df, "sz", 4000, strata=["lang"], seed=5,
                         portable=True, bucket_chars=1)
        c = shard_assign(df, "sz", 4000, strata=["lang"], seed=5,
                         portable=True, bucket_chars=3)
        pa = a.select("doc_id", "shard_id").toPandas().set_index("doc_id")
        pc = c.select("doc_id", "shard_id").toPandas().set_index("doc_id")
        assert pa["shard_id"].sort_index().equals(
            pc["shard_id"].sort_index())

    def test_fast_xxhash_order_consistent(self, spark):
        # portable=False path: same two-formulation equivalence
        df, _ = _docs(spark, n=150, with_nulls=False)
        a = shard_assign(df, "sz", 2500, seed=2, bucket_chars=1)
        b = shard_assign(df.repartition(7), "sz", 2500, seed=2,
                         bucket_chars=3)
        pa = a.select("doc_id", "shard_id").toPandas().set_index("doc_id")
        pb = b.select("doc_id", "shard_id").toPandas().set_index("doc_id")
        assert pa["shard_id"].sort_index().equals(
            pb["shard_id"].sort_index())

    def test_rejects_bad_target(self, spark):
        df, _ = _docs(spark, n=10)
        with pytest.raises(ValueError):
            shard_assign(df, "sz", 0)


class TestShardManifest:
    def test_manifest_reconciles_and_pins_boundaries(self, spark):
        df, pdf = _docs(spark)
        assigned = shard_assign(df, "sz", 5000, strata=["lang"], seed=7,
                                portable=True, keep_order=True)
        man = shard_manifest(assigned, "sz", strata=["lang"], seed=7,
                             portable=True).toPandas()
        # totals reconcile with the input
        sizes = pdf["sz"].fillna(0).clip(lower=0).astype(int)
        assert man["n_items"].sum() == len(pdf)
        assert man["shard_bytes"].sum() == sizes.sum()
        # every shard except a stratum's last is >= target at its end:
        # the boundary row law means shard k starts strictly under
        # (k+1)*target, so cumulative bytes through shard k >= k*target
        for lang, g in man.groupby("lang"):
            g = g.sort_values("shard_id").reset_index(drop=True)
            assert list(g["shard_id"]) == list(range(len(g)))
            cum = 0
            for _, r in g.iterrows():
                assert cum <= (r.shard_id + 1) * 5000 - 1
                cum += r.shard_bytes
        # boundary ids are the hash-order extremes per shard
        order = {
            did: hashlib.md5(f"{did}:7".encode()).hexdigest()
            for did in pdf["doc_id"]
        }
        rows = shard_assign(df, "sz", 5000, strata=["lang"], seed=7,
                            portable=True).select(
            "lang", "doc_id", "shard_id").toPandas()
        for (lang, sid), g in rows.groupby(["lang", "shard_id"]):
            ids = sorted(g["doc_id"], key=lambda d: order[d])
            mrow = man[(man.lang == lang) & (man.shard_id == sid)]
            assert mrow["first_id"].iloc[0] == ids[0]
            assert mrow["last_id"].iloc[0] == ids[-1]

    def test_manifest_without_kept_order(self, spark):
        df, _ = _docs(spark, n=120)
        assigned = shard_assign(df, "sz", 4000, seed=9, portable=True)
        assert "__ord" not in assigned.columns
        man = shard_manifest(assigned, "sz", seed=9, portable=True)
        assert man.count() > 0


def _naive_pack(pdf, L, strata, seed):
    """The single-global-window concat-and-chunk law, in plain Python:
    one (doc, seq) row per intersection."""
    rows = []
    by_key = {}
    for _, r in pdf.iterrows():
        h = hashlib.md5(f"{int(r.doc_id)}:{seed}".encode()).hexdigest()
        sz = 0 if pd.isna(r.sz) else max(int(r.sz), 0)
        key = tuple(r[s] for s in strata)
        by_key.setdefault(key, []).append((h, int(r.doc_id), sz))
    for key, items in by_key.items():
        run = 0
        for h, did, sz in sorted(items):
            st, en = run, run + sz
            run = en
            if sz == 0:
                continue
            for seq in range(st // L, (en - 1) // L + 1):
                a, b = max(st, seq * L), min(en, (seq + 1) * L)
                rows.append((*key, seq, a - seq * L, did, a - st,
                             b - a, sz))
    return sorted(rows)


class TestPackSequences:
    def test_matches_naive_global_law(self, spark):
        df, pdf = _docs(spark)
        got = sorted(
            tuple(r) for r in pack_sequences(
                df, "sz", 700, strata=["lang"], id_col="doc_id",
                seed=11, portable=True,
            ).collect()
        )
        assert got == _naive_pack(pdf, 700, ["lang"], 11)

    def test_segments_tile_sequences_exactly(self, spark):
        # per sequence: positions start at 0 where preceded, segments
        # abut (no gap/overlap), every sequence but the stratum's last
        # fills to exactly L; per doc: offsets rebuild the whole doc
        df, pdf = _docs(spark, with_nulls=False)
        L = 500
        seg = pack_sequences(df, "sz", L, strata=["lang"], seed=3,
                             portable=True).toPandas()
        for (lang, sid), g in seg.groupby(["lang", "seq_id"]):
            g = g.sort_values("pos_in_seq")
            end = None
            for _, r in g.iterrows():
                if end is not None:
                    assert r.pos_in_seq == end
                end = r.pos_in_seq + r.seg_len
            assert end <= L
        for lang, g in seg.groupby("lang"):
            last = g["seq_id"].max()
            fills = g.groupby("seq_id")["seg_len"].sum()
            for sid, fill in fills.items():
                assert fill == L or sid == last
        for did, g in seg.groupby("doc_id"):
            g = g.sort_values("doc_offset")
            sz = int(pdf.set_index("doc_id").loc[did, "sz"])
            assert g["seg_len"].sum() == sz
            assert list(g["doc_offset"]) == list(
                g["seg_len"].cumsum() - g["seg_len"])

    def test_zero_token_docs_emit_nothing(self, spark):
        df, pdf = _docs(spark)  # with_nulls: NULL/negative sizes -> 0
        seg = pack_sequences(df, "sz", 300, strata=["lang"], seed=5,
                             portable=True).toPandas()
        zero_ids = set(pdf.loc[pdf["sz"].isna() | (pdf["sz"] <= 0),
                               "doc_id"])
        assert zero_ids and not (set(seg["doc_id"]) & zero_ids)
        # total tokens conserved
        sizes = pdf["sz"].fillna(0).clip(lower=0).astype(int)
        assert seg["seg_len"].sum() == sizes.sum()

    def test_partition_and_bucket_invariance(self, spark):
        df, _ = _docs(spark, n=180, with_nulls=False)
        a = pack_sequences(df, "sz", 400, seed=2, portable=True,
                           bucket_chars=1)
        b = pack_sequences(df.repartition(11), "sz", 400, seed=2,
                           portable=True, bucket_chars=3)
        key = ["seq_id", "pos_in_seq"]
        pa = a.toPandas().sort_values(key).reset_index(drop=True)
        pb = b.toPandas().sort_values(key).reset_index(drop=True)
        assert pa.equals(pb)

    def test_manifest_reconciles(self, spark):
        df, pdf = _docs(spark)
        L = 600
        seg = pack_sequences(df, "sz", L, strata=["lang"], seed=7,
                             portable=True)
        man = sequence_manifest(seg, strata=["lang"]).toPandas()
        sp = seg.toPandas()
        sizes = pdf["sz"].fillna(0).clip(lower=0).astype(int)
        assert man["n_tokens"].sum() == sizes.sum()
        assert man["n_segs"].sum() == len(sp)
        # every doc starts exactly once and ends exactly once
        n_docs = (sizes > 0).sum()
        assert man["n_doc_starts"].sum() == n_docs
        assert man["n_doc_ends"].sum() == n_docs
        # boundary docs are the position extremes
        for (lang, sid), g in sp.groupby(["lang", "seq_id"]):
            g = g.sort_values("pos_in_seq")
            row = man[(man.lang == lang) & (man.seq_id == sid)]
            assert row["first_doc"].iloc[0] == g["doc_id"].iloc[0]
            assert row["last_doc"].iloc[0] == g["doc_id"].iloc[-1]

    def test_rejects_bad_seq_len(self, spark):
        df, _ = _docs(spark, n=10)
        with pytest.raises(ValueError):
            pack_sequences(df, "sz", 0)


class TestBatchByLength:
    def test_matches_naive_global_rank(self, spark):
        from data_quality_spark.operators.shards import batch_by_length

        df, pdf = _docs(spark)
        got = batch_by_length(
            df, "sz", 13, strata=["lang"], id_col="doc_id",
            bucket_width=50,
        ).select("doc_id", "batch_id").toPandas().set_index("doc_id")[
            "batch_id"]
        for lang, g in pdf.groupby("lang"):
            keys = sorted(
                (-1 if pd.isna(r.sz) else int(r.sz), int(r.doc_id))
                for _, r in g.iterrows()
            )
            for rk, (_, did) in enumerate(keys):
                assert got[did] == rk // 13, did

    def test_bucket_width_and_partitioning_invariance(self, spark):
        from data_quality_spark.operators.shards import batch_by_length

        df, _ = _docs(spark, n=150, with_nulls=False)
        a = batch_by_length(df, "sz", 8, id_col="doc_id", bucket_width=7)
        b = batch_by_length(df.repartition(11), "sz", 8, id_col="doc_id",
                            bucket_width=900)
        pa_ = a.select("doc_id", "batch_id").toPandas().set_index("doc_id")
        pb = b.select("doc_id", "batch_id").toPandas().set_index("doc_id")
        assert pa_["batch_id"].sort_index().equals(
            pb["batch_id"].sort_index())

    def test_length_sorting_beats_hash_order_on_waste(self, spark):
        # the operator's reason to exist: padding waste under the
        # length-sorted law must be well under the hash-order layout's
        from data_quality_spark.operators.sampling import sample_order_col
        from data_quality_spark.operators.shards import (
            batch_by_length,
            batch_manifest,
        )

        df, _ = _docs(spark, n=400, with_nulls=False)
        sorted_man = batch_manifest(
            batch_by_length(df, "sz", 16, id_col="doc_id"),
            "sz", id_col="doc_id").toPandas()
        # hash-order batching: same cut law over the md5 order
        hashed = df.withColumn(
            "__r",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy(
                    sample_order_col(F.col("doc_id"), 0, True), "doc_id")
            ),
        ).withColumn("batch_id", F.expr("(__r - 1) div 16"))
        hash_man = batch_manifest(hashed, "sz", id_col="doc_id").toPandas()
        assert sorted_man["pad_waste"].sum() < 0.25 * hash_man[
            "pad_waste"].sum()

    def test_manifest_accounting_and_nulls(self, spark):
        from data_quality_spark.operators.shards import (
            batch_by_length,
            batch_manifest,
        )

        df, pdf = _docs(spark)  # NULL/negative lengths sort first as -1
        man = batch_manifest(
            batch_by_length(df, "sz", 10, id_col="doc_id"),
            "sz", id_col="doc_id").toPandas().sort_values("batch_id")
        sizes = pdf["sz"].fillna(0).clip(lower=0).astype(int)
        assert man["n_items"].sum() == len(pdf)
        assert man["sum_len"].sum() == sizes.sum()
        assert (man["pad_waste"] == man["padded_len"] - man["sum_len"]).all()
        # NULL/negative rows land in batch 0 (they sort as -1, clamp to 0)
        n_null = int((pdf["sz"].isna() | (pdf["sz"] <= 0)).sum())
        assert n_null > 0 and man.iloc[0]["sum_len"] == sum(
            sorted(sizes)[: int(man.iloc[0]["n_items"])])
        # batch ids are consecutive, only the last may be short
        assert list(man["batch_id"]) == list(range(len(man)))
        assert (man["n_items"].iloc[:-1] == 10).all()

    def test_rejects_bad_params(self, spark):
        from data_quality_spark.operators.shards import batch_by_length

        df, _ = _docs(spark, n=10)
        with pytest.raises(ValueError):
            batch_by_length(df, "sz", 0)
        with pytest.raises(ValueError):
            batch_by_length(df, "sz", 4, bucket_width=0)


def test_non_string_strata_offsets(spark):
    """Regression: a BooleanType stratum must use Spark's own string
    rendering for the driver offset keys (str(True) != 'true' would
    silently zero every bucket offset)."""
    import numpy as np

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "doc_id": range(300),
        "flag": [bool(i % 2) for i in range(300)],
        "sz": rng.integers(1, 500, size=300).astype("int64"),
    })
    df = spark.createDataFrame(pdf)
    got = shard_assign(df, "sz", 3000, strata=["flag"], id_col="doc_id",
                       seed=3, portable=True, bucket_chars=1)
    g = got.select("doc_id", "shard_id").toPandas().set_index("doc_id")
    want = _naive_shards(pdf.assign(lang=pdf["flag"]), 3000, ["flag"], 3)
    for did, sid in want.items():
        assert g["shard_id"][did] == sid, did
