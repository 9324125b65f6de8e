"""Streaming sequence packing (streaming/packing_stream.py).

Correctness model: the union of all batch directories is ONE gap-free
token grid per stratum — tokens conserved, segments tile across batch
boundaries (a boundary mid-sequence CONTINUES the seq_id), at most one
short sequence per stratum; the stored offsets chain equals the
per-stratum totals; each batch's rows are a pure function of (its
docs, the previous offsets) — replayed bit-for-bit by the batch
operator; and the checkpoint prevents reprocessing.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from data_quality_spark.operators.docs import token_count_col
from data_quality_spark.operators.shards import pack_sequences
from data_quality_spark.streaming.packing_stream import (
    read_stream_segments,
    stream_pack_sequences,
)

SEQ_LEN = 64


def _docs_pdf():
    import pandas as pd

    rows = []
    for i in range(90):
        lang = ["en", "de"][i % 2]
        rows.append((i, "tok " * (3 + i % 17), lang))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def test_stream_packing_laws(spark, tmp_path):
    pdf = _docs_pdf()
    src = str(tmp_path / "docs")
    # several input files -> several micro-batches at one file/trigger
    spark.createDataFrame(pdf).repartition(4).write.parquet(src)
    out = str(tmp_path / "out")
    res = stream_pack_sequences(
        spark, src, out, SEQ_LEN, strata=("lang",), seed=3,
        max_files_per_trigger=1,
    )
    assert res["batches"] >= 2 and res["docs_in"] == len(pdf)

    seg = read_stream_segments(spark, out).toPandas()
    seg["batch_id"] = seg["batch_id"].astype(int)
    total_tokens = sum(3 + i % 17 for i in range(90))
    assert int(seg["seg_len"].sum()) == total_tokens == res["tokens_in"]

    # cross-batch tiling: per stratum the segments tile 0..total with no
    # gap/overlap, sequences consecutive, at most ONE short sequence
    for lang, g in seg.groupby("lang"):
        g = g.sort_values(["seq_id", "pos_in_seq"])
        pos = 0
        for _, r in g.iterrows():
            assert r["seq_id"] == pos // SEQ_LEN
            assert r["pos_in_seq"] == pos % SEQ_LEN, (lang, pos)
            pos += r["seg_len"]
        fills = g.groupby("seq_id")["seg_len"].sum()
        assert (fills.iloc[:-1] == SEQ_LEN).all()
    # offsets chain: final snapshot equals the per-stratum totals
    last_b = int(seg["batch_id"].max())
    offs = {
        r["stratum"]: r["total_tokens"]
        for r in spark.read.parquet(
            os.path.join(out, "offsets", f"batch_id={last_b}")).collect()
    }
    per_lang = seg.groupby("lang")["seg_len"].sum()
    assert offs == {k: int(v) for k, v in per_lang.items()}

    # each batch == the batch operator run on its docs with the PREVIOUS
    # offsets (the idempotent-replay law: a batch is a pure function of
    # (its docs, prior state))
    docs_df = spark.createDataFrame(pdf)
    for b in sorted(seg["batch_id"].unique()):
        ids = set(seg[seg["batch_id"] == b]["doc_id"])
        prev = {}
        if b > 0:
            prev = {
                r["stratum"]: int(r["total_tokens"])
                for r in spark.read.parquet(
                    os.path.join(out, "offsets",
                                 f"batch_id={b - 1}")).collect()
            }
        expect = pack_sequences(
            docs_df.where(F.col("doc_id").isin(ids)).withColumn(
                "__ntok", token_count_col(F.col("text"))),
            "__ntok", SEQ_LEN, strata=["lang"], seed=3, portable=True,
            start_offsets=prev,
        ).select("lang", "seq_id", "pos_in_seq", "doc_id",
                 "doc_offset", "seg_len", "n_doc_tokens").collect()
        got = seg[seg["batch_id"] == b]
        want = sorted(tuple(r) for r in expect)
        have = sorted(
            (r.lang, r.seq_id, r.pos_in_seq, r.doc_id, r.doc_offset,
             r.seg_len, r.n_doc_tokens)
            for r in got.itertuples())
        assert have == want, b

    # checkpoint: a rerun drains nothing and changes nothing
    seg_before = sorted(map(tuple, seg.itertuples(index=False)))
    res2 = stream_pack_sequences(
        spark, src, out, SEQ_LEN, strata=("lang",), seed=3)
    assert res2["batches"] == 0 and res2["docs_in"] == 0
    seg_after = read_stream_segments(spark, out).toPandas()
    seg_after["batch_id"] = seg_after["batch_id"].astype(int)
    assert sorted(map(tuple, seg_after.itertuples(index=False))) \
        == seg_before


@pytest.mark.slow
def test_stream_pack_query_deterministic(spark):
    """q:stream_pack's whole premise is a PINNED micro-batch
    decomposition (60 s-spaced file mtimes -> oldest-first file source
    order): two full runs must produce identical rows, batch ids
    included — if file ordering were ever nondeterministic this is the
    test that catches it before the driver's hash gate does."""
    import __spark_entry__ as e

    def grab():
        df = e.q_stream_pack(spark, "/root/testdata/sf0.001")
        return sorted(map(tuple, df.collect()))

    first = grab()
    second = grab()
    assert first == second and len(first) > 0
    batches = {r[0] for r in first}
    assert batches == {0, 1, 2}  # one wave per micro-batch, all waves


def test_multi_file_trigger_batches(spark, tmp_path):
    """maxFilesPerTrigger=2 over six mtime-ordered single-file waves:
    three micro-batches, each packing the UNION of its two files in
    hash order from the prior offsets — the per-batch purity law at a
    coarser decomposition, plus run-to-run determinism."""
    import glob
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    pdf = _docs_pdf()
    sdf = spark.createDataFrame(pdf)
    src = str(tmp_path / "docs6")
    os.makedirs(src)
    t0 = _time.time() - 3600
    for w in range(6):
        wdir = str(tmp_path / f"w{w}")
        sdf.filter(F.col("doc_id") % 6 == w).coalesce(1) \
            .write.parquet(wdir)
        part = glob.glob(os.path.join(wdir, "part-*.parquet"))[0]
        dst = os.path.join(src, f"wave-{w}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (t0 + w * 60, t0 + w * 60))

    out = str(tmp_path / "out6")
    res = stream_pack_sequences(
        spark, src, out, SEQ_LEN, strata=("lang",), seed=3,
        max_files_per_trigger=2,
    )
    assert res["batches"] == 3 and res["docs_in"] == len(pdf)
    seg = read_stream_segments(spark, out).toPandas()
    seg["batch_id"] = seg["batch_id"].astype(int)
    # each batch holds exactly its two waves' docs
    for b in range(3):
        got = set(seg[seg["batch_id"] == b]["doc_id"])
        want = {i for i in range(90) if i % 6 in (2 * b, 2 * b + 1)}
        assert got == want, b
    # tokens conserved and the grid tiles per stratum
    total = sum(3 + i % 17 for i in range(90))
    assert int(seg["seg_len"].sum()) == total == res["tokens_in"]
    for lang, g in seg.groupby("lang"):
        g = g.sort_values(["seq_id", "pos_in_seq"])
        pos = 0
        for _, r in g.iterrows():
            assert r["seq_id"] == pos // SEQ_LEN
            assert r["pos_in_seq"] == pos % SEQ_LEN
            pos += r["seg_len"]
