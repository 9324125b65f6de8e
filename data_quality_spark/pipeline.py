"""The flagship north-rule pipeline: audio-clip + transcript quality gate.

Stages (one narrow Spark plan per partition batch — zero shuffles until the
tiny gate aggregate):

1. **featurize** — ONE Arrow-batched ``mapInArrow`` stage computes PCM
   decode + RMS/peak/silence/clipping stats + hashed-ngram langid +
   char-bigram perplexity per clip.  ``mapInArrow`` (not a scalar
   pandas/arrow UDF) is a measured 4-5× transport win for binary payloads:
   the scalar-UDF runner paths move ~120 MB/s of clip bytes into Python,
   while the mapInArrow stream moves the same batches at ~600 MB/s, and
   zero-copy offset/data-buffer views skip per-row ``bytes`` allocation
   entirely (pcm16/µ-law decode straight off the Arrow data buffer).  The
   payload column is DROPPED on output: features/decisions flow on, silver
   references bronze by ``clip_id`` — at 100 TB you never re-ship or
   re-store the audio bytes through the rest of the plan.
2. **text heuristics** — token/repetition/char-class/digit/length-ratio
   rules stay JVM-side as Catalyst Column expressions (whole-stage codegen,
   no Python).
3. **scrub** — chained `regexp_replace` with the shared dialect-safe patterns
   (`functions.text.SCRUB_CHAIN`); byte-identical to the Python oracle.
4. **decide** — `when` cascade over `GateThresholds` → ``decision`` ∈
   {keep, drop} (+ per-rule boolean flags for issue aggregation).  Mirrors the
   reference's rule → conditional-count → gate shape
   (``/root/reference/src/data_quality/checkpoints.py:61-137``).

At 100 TB the whole per-row section is embarrassingly parallel: partition
pruning on ``ingest_day`` bounds each incremental run, Arrow batch size
bounds pandas memory, and the only shuffle is the salted gate aggregate over
low-cardinality (lang, codec) keys (``operators/gate.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .synth import ALLOWED_SR, GateThresholds

FEATURES_TYPE = T.StructType(
    [
        T.StructField("decode_ok", T.BooleanType(), True),
        T.StructField("rms_db", T.DoubleType(), True),
        T.StructField("peak_db", T.DoubleType(), True),
        T.StructField("silence_frac", T.DoubleType(), True),
        T.StructField("clip_frac", T.DoubleType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("lang_pred", T.StringType(), True),
        T.StructField("lang_conf", T.DoubleType(), True),
        T.StructField("ppl", T.DoubleType(), True),
    ]
)

# rule name -> severity; used to compile gate issues (QualityIssue relation)
DROP_RULES: dict[str, str] = {
    "decode_failed": "critical",
    "bad_sample_rate": "critical",
    "bad_duration": "critical",
    "duration_mismatch": "warning",
    "mostly_silence": "warning",
    "clipping": "warning",
    "too_quiet": "warning",
    "empty_transcript": "critical",
    "low_lang_confidence": "warning",
    "high_perplexity": "warning",
    "repetitive": "warning",
    "length_ratio": "warning",
    "charclass": "warning",
    "digit_flood": "warning",
}


def _feature_batch(batch, col_idx: dict[str, int]):
    """Compute the per-clip feature arrays for one Arrow RecordBatch.

    Binary access is zero-copy: offsets + data buffers viewed as numpy
    arrays, each clip decoded from a u8 slice — no per-row ``bytes`` object
    is ever allocated for pcm16/µ-law payloads.
    """
    import numpy as np
    import pyarrow as pa

    from .functions import audio as A
    from .functions import text as X

    payload = batch.column(col_idx["bytes"])
    n = len(payload)
    out = {
        "decode_ok": np.zeros(n, dtype=bool),
        "rms_db": np.full(n, np.nan),
        "peak_db": np.full(n, np.nan),
        "silence_frac": np.full(n, np.nan),
        "clip_frac": np.full(n, np.nan),
        "n_samples": np.zeros(n, dtype=np.int64),
    }
    codecs = batch.column(col_idx["codec"]).to_pylist()
    srs = batch.column(col_idx["sr_hz"]).to_pylist()
    texts = batch.column(col_idx["transcript"]).to_pylist()
    if n:
        off_dt = np.int64 if pa.types.is_large_binary(payload.type) else np.int32
        bufs = payload.buffers()
        offsets = np.frombuffer(
            bufs[1], dtype=off_dt, count=n + 1,
            offset=payload.offset * np.dtype(off_dt).itemsize,
        )
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.zeros(0, np.uint8)
        )
        valid = payload.is_valid().to_numpy(zero_copy_only=False)
        for i in range(n):
            if not valid[i]:
                continue
            sr = srs[i]
            try:
                # fused int16-domain decode+stats: no float waveform is
                # materialized, DRAM traffic ≈ the payload itself
                st = A.decode_stats(
                    data[offsets[i]:offsets[i + 1]],
                    codecs[i],
                    int(sr) if sr is not None else None,
                )
            except (ValueError, TypeError):
                continue
            out["decode_ok"][i] = True
            out["rms_db"][i] = st["rms_db"]
            out["peak_db"][i] = st["peak_db"]
            out["silence_frac"][i] = st["silence_frac"]
            out["clip_frac"][i] = st["clip_frac"]
            out["n_samples"][i] = int(st["n_samples"])
    langs, confs = X.LANGID.score_batch(texts)
    ppls = X.PPLM.ppl_batch(texts, langs)
    return [
        pa.array(out["decode_ok"]),
        pa.array(out["rms_db"]),
        pa.array(out["peak_db"]),
        pa.array(out["silence_frac"]),
        pa.array(out["clip_frac"]),
        pa.array(out["n_samples"]),
        pa.array(langs, type=pa.string()),
        pa.array(confs, type=pa.float64()),
        pa.array(ppls, type=pa.float64()),
    ]


def featurize(df: DataFrame, counter=None) -> DataFrame:
    """Attach per-clip features via one ``mapInArrow`` pass; the payload
    column does NOT survive the stage (silver references bronze by clip_id —
    bytes are read once, never re-shipped downstream).

    ``counter`` (an optional Spark accumulator) counts every clip actually
    decoded — the instrumentation hook the execute-once tests use to prove
    the featurize stage runs exactly one pass per job."""
    in_names = [f.name for f in df.schema.fields]
    col_idx = {name: i for i, name in enumerate(in_names)}
    carried = [name for name in in_names if name != "bytes"]
    out_schema = T.StructType(
        [
            T.StructField(f.name, f.dataType, True)
            for f in df.schema.fields
            if f.name != "bytes"
        ]
        + list(FEATURES_TYPE.fields)
    )
    out_names = carried + [f.name for f in FEATURES_TYPE.fields]

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            feats = _feature_batch(batch, col_idx)
            if counter is not None:
                counter.add(batch.num_rows)
            arrays = [batch.column(col_idx[name]) for name in carried] + feats
            yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    return df.mapInArrow(run, out_schema)


def _hive_partition_values(input_path: str, file_path: str) -> dict[str, str]:
    """Parse hive-style ``key=value`` directory segments between the dataset
    root and the file — the partition columns a native Spark scan would
    reconstruct."""
    rel = os.path.relpath(os.path.dirname(file_path), input_path)
    out: dict[str, str] = {}
    for seg in rel.split(os.sep):
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[k] = v
    return out


def featurize_files(
    spark,
    input_path: str,
    tasks_per_file: int = 1,
    batch_rows: int = 2048,
    waves: int = 3,
    partition_filter=None,
    counter=None,
    kernel=None,
    kernel_fields=None,
) -> DataFrame:
    """Storage-direct featurize: Python workers read their parquet splits
    with pyarrow, so clip payloads flow storage → Python and NEVER cross the
    JVM↔Python Arrow pipe (the dominant cost of ``featurize`` — measured
    ~50% of wall at 32 cores).  The JVM side only schedules a tiny DataFrame
    of (file, row-group range) rows; what comes back is carried columns +
    features, no bytes.

    This is the 100 TB pattern for media tables: Spark plans file/row-group
    splits, the columnar read happens inside the worker at full parallelism,
    and task granularity follows parquet row groups exactly like the native
    scan would.  Hive-style partition directories (``ingest_day=.../``) are
    reconstructed as string columns, and ``partition_filter`` (a predicate
    over the partition-value dict) prunes whole files before any IO — the
    manifest analog of partition pruning.  Semantics are identical to
    ``featurize(spark.read.parquet(input_path))`` minus column order (same
    kernels, same rows).

    ``kernel``/``kernel_fields`` swap the per-batch feature function and
    its output schema (default: the v1 ``_feature_batch``/FEATURES_TYPE;
    pass ``_feature_batch_v2`` + v1+ext fields for the gate-v2 profile) —
    the storage-direct scan scaffolding is profile-independent.
    """
    import pyarrow.parquet as pq

    kernel = kernel or _feature_batch
    kfields = (
        list(kernel_fields) if kernel_fields is not None
        else list(FEATURES_TYPE.fields)
    )

    files = []
    for root, _dirs, names in os.walk(input_path):
        for name in sorted(names):
            if name.endswith(".parquet") and not name.startswith("_"):
                files.append(os.path.join(root, name))
    if partition_filter is not None:
        files = [
            f for f in files
            if partition_filter(_hive_partition_values(input_path, f))
        ]
    if not files:
        raise ValueError(f"no parquet files under {input_path}")
    part_keys = sorted(
        {k for f in files for k in _hive_partition_values(input_path, f)}
    )
    # one row per (file, row-group slice): row-group granularity mirrors the
    # native reader's split planning
    manifest: list[tuple[str, int, int]] = []
    for path in files:
        n_rg = pq.ParquetFile(path).metadata.num_row_groups
        step = max(n_rg // max(tasks_per_file, 1), 1)
        for start in range(0, n_rg, step):
            manifest.append((path, start, min(start + step, n_rg)))
    # right-size task count: ~3 waves per core slot amortizes per-task fixed
    # cost (worker roundtrip, file open) while keeping stragglers bounded
    target = max(spark.sparkContext.defaultParallelism * waves, 1)
    if len(manifest) > target:
        group = -(-len(manifest) // target)
        manifest_rows = [
            manifest[i : i + group] for i in range(0, len(manifest), group)
        ]
    else:
        manifest_rows = [[m] for m in manifest]
    # one row per task, columns as arrays; round-robin repartition below
    # spreads rows 1-per-partition (hash-partitioning on a task id collides:
    # ~1/e of partitions end up empty and stragglers carry 2-3 groups —
    # measured as only ~8 of 16 slots busy)
    rows = [
        ([m[0] for m in grp], [m[1] for m in grp], [m[2] for m in grp])
        for grp in manifest_rows
    ]
    sample = pq.ParquetFile(files[0]).schema_arrow
    from pyspark.sql.pandas.types import from_arrow_type

    carried = [name for name in sample.names if name != "bytes"]
    col_idx_names = list(sample.names)
    out_schema = T.StructType(
        [
            T.StructField(name, from_arrow_type(sample.field(name).type), True)
            for name in carried
        ]
        + [T.StructField(k, T.StringType(), True) for k in part_keys]
        + kfields
    )
    out_names = carried + part_keys + [f.name for f in kfields]
    col_idx = {name: i for i, name in enumerate(col_idx_names)}
    root_path = input_path

    mdf = spark.createDataFrame(
        rows, "paths array<string>, rg_starts array<int>, rg_ends array<int>"
    ).repartition(len(rows))

    def run(batches):
        import pyarrow as pa
        import pyarrow.parquet as _pq

        for mbatch in batches:
            for row in mbatch.to_pylist():
                for path, rg_start, rg_end in zip(
                    row["paths"], row["rg_starts"], row["rg_ends"]
                ):
                    # memory_map: uncompressed audio columns read zero-copy
                    # from page cache instead of through a decompress pass
                    pf = _pq.ParquetFile(path, memory_map=True)
                    pvals = _hive_partition_values(root_path, path)
                    for rg in range(rg_start, rg_end):
                        table = pf.read_row_group(rg, columns=col_idx_names)
                        for batch in table.to_batches(max_chunksize=batch_rows):
                            feats = kernel(batch, col_idx)
                            if counter is not None:
                                counter.add(batch.num_rows)
                            parts = [
                                pa.array([pvals.get(k)] * len(batch), type=pa.string())
                                for k in part_keys
                            ]
                            arrays = (
                                [batch.column(col_idx[name]) for name in carried]
                                + parts
                                + feats
                            )
                            yield pa.RecordBatch.from_arrays(
                                arrays, names=out_names
                            )

    return mdf.mapInArrow(run, out_schema)


def _text_heuristics(df: DataFrame) -> DataFrame:
    """JVM-side Column twins of functions.text.{token_count,rep_ratio,...} —
    formulas restricted to the Spark/Python-identical dialect subset."""
    trimmed = F.trim(F.col("transcript"))
    toks = F.split(trimmed, r"\s+")
    n_tok = F.when(
        F.col("transcript").isNull() | (F.length(trimmed) == 0), F.lit(0)
    ).otherwise(F.size(toks))
    n_chars = F.length(F.coalesce(F.col("transcript"), F.lit("")))
    specials = F.length(
        F.regexp_replace(
            F.coalesce(F.col("transcript"), F.lit("")), r"[A-Za-z0-9À-ÿ\s]", ""
        )
    )
    digits = n_chars - F.length(
        F.regexp_replace(F.coalesce(F.col("transcript"), F.lit("")), r"[0-9]", "")
    )
    dur_s = F.col("dur_ms").cast("double") / 1000.0
    return (
        df.withColumn("token_count", n_tok.cast("int"))
        .withColumn(
            "rep_ratio",
            F.when(n_tok > 0, 1.0 - F.size(F.array_distinct(toks)) / n_tok.cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "charclass_frac",
            F.when(n_chars > 0, specials.cast("double") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "digit_frac",
            F.when(n_chars > 0, digits.cast("double") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "len_ratio",
            F.when(dur_s > 0, n_chars.cast("double") / dur_s).otherwise(F.lit(0.0)),
        )
    )


def scrub_col(col: Column) -> Column:
    """Chained regexp_replace over the shared PII/toxicity patterns
    (replacements are already in Spark's `$n` group syntax)."""
    from .functions.text import SCRUB_CHAIN, _render_repl

    out = col
    for pattern, repl in SCRUB_CHAIN:
        out = F.regexp_replace(out, pattern, _render_repl(repl, "spark"))
    return out


def _metric_default(name: str, default: float) -> Column:
    """A measured metric with its no-evidence default: NULL **and NaN**
    both fall back (coalesce alone misses NaN — Arrow float columns
    carry NaN for unmeasurable rows, and Spark's NaN-greatest compare
    would silently flip threshold rules)."""
    c = F.col(name)
    return F.coalesce(
        F.nanvl(c, F.lit(None).cast("double")), F.lit(float(default))
    )


# -- single-projection metric defaults -------------------------------
# Each defaulted metric appears in several rule expressions (lufs twice,
# every v2 metric once per flag AND once in the reason ladder the
# decision builders expand), so inlining the nanvl/coalesce wrapper per
# use widens the analyzed tree measurably (the utterance_audit ~1.4x
# tripwire flag, r4).  ``with_metric_defaults`` computes each wrapper
# ONCE as a ``__dqd_<name>`` projection column; the flag builders use
# the plain attribute when it is present and fall back to the inline
# wrapper otherwise, and the decision builders drop the helper columns
# — outputs are bit-identical on both paths.

_DEFAULT_PREFIX = "__dqd_"
_METRIC_DEFAULTS_V1: dict[str, float] = {
    "silence_frac": 1.0,
    "clip_frac": 0.0,
    "rms_db": -120.0,
}


def _metric_defaults_map(v2: bool = False) -> dict[str, float]:
    m = dict(_METRIC_DEFAULTS_V1)
    if v2:
        from .operators.audio_audit import LUFS_MIN, SNR_MIN_DB
        from .operators.audio_bandwidth import MAX_UPSAMPLED_HF_DB

        m.update({
            "snr_db": float(SNR_MIN_DB),
            "lufs_i": float(LUFS_MIN),
            "bw_rms": 0.0,
            "hf_db": float(MAX_UPSAMPLED_HF_DB),
        })
    return m


def with_metric_defaults(df: DataFrame, v2: bool = False) -> DataFrame:
    """Project every metric's no-evidence default once (idempotent)."""
    new = {
        _DEFAULT_PREFIX + n: _metric_default(n, d)
        for n, d in _metric_defaults_map(v2).items()
        if n in df.columns and _DEFAULT_PREFIX + n not in df.columns
    }
    return df.withColumns(new) if new else df


def _mdef(df: DataFrame, name: str, default: float) -> Column:
    pre = _DEFAULT_PREFIX + name
    return F.col(pre) if pre in df.columns else _metric_default(name, default)


def _drop_defaults(df: DataFrame) -> DataFrame:
    helpers = [c for c in df.columns if c.startswith(_DEFAULT_PREFIX)]
    return df.drop(*helpers) if helpers else df


def rule_flags(df: DataFrame) -> dict[str, Column]:
    """Per-rule violation predicates over a featurized frame — the same
    booleans drive the keep/drop decision AND the issue counts, so the two
    can never disagree."""
    th = GateThresholds
    actual_ms = F.col("n_samples").cast("double") * 1000.0 / F.when(
        F.col("sr_hz") > 0, F.col("sr_hz").cast("double")
    ).otherwise(F.lit(1.0))
    dur_mismatch = F.when(
        F.col("dur_ms") > 0,
        F.abs(actual_ms - F.col("dur_ms").cast("double"))
        / F.greatest(F.col("dur_ms").cast("double"), F.lit(1.0)),
    ).otherwise(F.lit(1.0))
    return {
        "decode_failed": ~F.col("decode_ok"),
        # NULL sr must FLAG, not NULL-swallow through isin
        "bad_sample_rate": ~F.coalesce(F.col("sr_hz"), F.lit(-1)).isin(
            list(ALLOWED_SR)),
        "bad_duration": F.col("dur_ms") <= 0,
        "duration_mismatch": dur_mismatch > th.DUR_MISMATCH_FRAC,
        # _metric_default, not coalesce: decode-failed rows carry NaN
        # (Arrow doubles), and Spark's NaN-greatest compare would invert
        # the intended defaults (NaN clip_frac counted as clipping, NaN
        # rms_db never too_quiet) — found by review, measured +60/-60 on
        # the 1200-clip corpus's undecodable class
        "mostly_silence": _mdef(df, "silence_frac", 1.0)
        > th.SILENCE_MAX,
        "clipping": _mdef(df, "clip_frac", 0.0) > th.CLIP_MAX,
        "too_quiet": _mdef(df, "rms_db", -120.0) < th.RMS_MIN_DB,
        "empty_transcript": F.col("token_count") == 0,
        "low_lang_confidence": F.col("lang_conf") < th.LANG_CONF_MIN,
        "high_perplexity": F.col("ppl") > th.PPL_MAX,
        "repetitive": F.col("rep_ratio") > th.REP_MAX,
        "length_ratio": (F.col("len_ratio") < th.LEN_RATIO_MIN)
        | (F.col("len_ratio") > th.LEN_RATIO_MAX),
        "charclass": F.col("charclass_frac") > th.CHARCLASS_MAX,
        "digit_flood": F.col("digit_frac") > th.DIGIT_MAX,
    }


def _decide_with(df: DataFrame, flags: dict[str, Column]) -> DataFrame:
    """Shared decision builder: OR of the flag ladder → decision, first
    flag in insertion order → decision_reason, scrub always applied."""
    drop = None
    reason = F.lit(None).cast("string")
    for name in reversed(list(flags)):
        reason = F.when(flags[name], F.lit(name)).otherwise(reason)
    for c in flags.values():
        drop = c if drop is None else (drop | c)
    return _drop_defaults(
        df.withColumn("decision", F.when(drop, "drop").otherwise("keep"))
        .withColumn("decision_reason", reason)
        .withColumn("scrubbed", scrub_col(F.col("transcript")))
    )


def decide(df: DataFrame) -> DataFrame:
    """decision ∈ {keep, drop} + first-violated-rule ``decision_reason``
    (NULL for kept rows) + scrubbed transcript.  (3-way graylist of the
    reference's decision enum, checkpoints.py:216-252, collapses to binary
    keep/drop per the north rule; the reason column is the per-row audit
    trail the reference keeps only in aggregate issue counts.)"""
    df = with_metric_defaults(df)
    return _decide_with(df, rule_flags(df))


def _decide3_with(
    df: DataFrame, flags: dict[str, Column], severities: dict[str, str]
) -> DataFrame:
    """Shared 3-way decision builder: critical flag → reject, warning-only
    → graylist, clean → accept; same reason ladder as ``_decide_with``."""
    crit = None
    warn = None
    reason = F.lit(None).cast("string")
    for name in reversed(list(flags)):
        reason = F.when(flags[name], F.lit(name)).otherwise(reason)
    for name, col in flags.items():
        if severities[name] == "critical":
            crit = col if crit is None else (crit | col)
        else:
            warn = col if warn is None else (warn | col)
    return _drop_defaults(
        df.withColumn(
            "decision",
            F.when(crit, "reject").when(warn, "graylist").otherwise("accept"),
        )
        .withColumn("decision_reason", reason)
        .withColumn("scrubbed", scrub_col(F.col("transcript")))
    )


def decide3(df: DataFrame) -> DataFrame:
    """The reference's 3-way decision enum (checkpoints.py:216-252) over a
    featurized frame: critical-severity rule violations → ``reject``,
    warning-only violations → ``graylist``, clean → ``accept``.  The binary
    north-rule gate is ``decide`` (graylist collapses into drop).  Carries
    the same first-violated ``decision_reason`` audit column as ``decide``
    so the runner's 3-way mode emits the identical output schema."""
    df = with_metric_defaults(df)
    return _decide3_with(df, rule_flags(df), DROP_RULES)


def gate(df: DataFrame, counter=None) -> DataFrame:
    """Full per-row pipeline: featurize → heuristics → decide/scrub.
    ``counter`` threads through to :func:`featurize` for execute-once
    proofs."""
    return decide(_text_heuristics(featurize(df, counter=counter)))


def gate_files(
    spark,
    input_path: str,
    tasks_per_file: int = 1,
    waves: int = 3,
    partition_filter=None,
    counter=None,
    decider=None,
    profile: str = "v1",
) -> DataFrame:
    """``gate`` over a parquet directory via the storage-direct featurize
    path (payload bytes never cross the JVM) — the throughput/scaling
    configuration; results are identical to ``gate(spark.read.parquet(...))``.
    ``decider`` swaps the decision stage (default binary :func:`decide`;
    pass :func:`decide3` for the reference's accept/graylist/reject enum).
    ``profile="v2"`` runs the audio-metric gate (one-decode wide kernel,
    extended ladder; defaults the decider to :func:`decide_v2` /
    :func:`decide3_v2`)."""
    if profile == "v2":
        kernel = _feature_batch_v2
        kfields = list(FEATURES_TYPE.fields) + list(FEATURES_V2_EXT_TYPE.fields)
        default_decider = decide_v2
    elif profile == "v1":
        kernel, kfields, default_decider = None, None, decide
    else:
        raise ValueError(f"unknown gate profile {profile!r}")
    return (decider or default_decider)(
        _text_heuristics(
            featurize_files(
                spark,
                input_path,
                tasks_per_file,
                waves=waves,
                partition_filter=partition_filter,
                counter=counter,
                kernel=kernel,
                kernel_fields=kfields,
            )
        )
    )


def gate_issues(decided: DataFrame, table: str = "clips") -> DataFrame:
    """Compile the per-rule violation counts into the QualityIssue relation
    (one fused agg pass — same machinery as operators.rules)."""
    from .operators.rules import Rule, compile_rules

    decided = with_metric_defaults(decided)
    flags = rule_flags(decided)
    rules = [
        Rule(
            name=name,
            column=None,
            predicate=lambda d, c=col: c,
            severity=DROP_RULES[name],
            description=f"gate rule {name} violated",
        )
        for name, col in flags.items()
    ]
    return compile_rules(decided, table, rules)


# the gate's rules grouped into the pipeline's stages, in gate order:
# decode/container sanity → signal statistics → transcript heuristics →
# language identification.  The stages PARTITION DROP_RULES (asserted in
# clips_funnel), so the funnel's final column is exactly the gate's keep set.
FUNNEL_STAGES: dict[str, tuple[str, ...]] = {
    "decode": (
        "decode_failed", "bad_sample_rate", "bad_duration",
        "duration_mismatch",
    ),
    "signal": ("mostly_silence", "clipping", "too_quiet"),
    "transcript": (
        "empty_transcript", "high_perplexity", "repetitive",
        "length_ratio", "charclass", "digit_flood",
    ),
    "language": ("low_lang_confidence",),
}


# ---------------------------------------------------------------------------
# gate v2: the audio-metric profile.  Same pipeline shape (ONE decode pass,
# zero shuffles), wider featurization: the round-3 per-clip audio metrics
# (VAD speech time, speech-SNR, BS.1770 LUFS, dropout/stuck/DC, effective
# bandwidth) become first-class drop rules alongside the reference-parity v1
# set.  The v1 profile stays bit-stable: featurize_v2 emits the v1 feature
# columns from the SAME kernels (decode_stats ≡ clip_stats_i16∘_decode_i16),
# and DROP_RULES_V2 lists the v1 rules first, so any clip the v1 gate drops
# gets the identical decision_reason under v2.
# ---------------------------------------------------------------------------

FEATURES_V2_EXT_TYPE = T.StructType(
    [
        T.StructField("speech_ratio", T.DoubleType(), True),
        T.StructField("speech_ms", T.IntegerType(), True),
        T.StructField("snr_db", T.DoubleType(), True),
        T.StructField("lufs_i", T.DoubleType(), True),
        T.StructField("n_dropouts", T.LongType(), True),
        T.StructField("max_const_run", T.LongType(), True),
        T.StructField("dc_sum", T.LongType(), True),
        T.StructField("bw_rms", T.DoubleType(), True),
        T.StructField("hf_db", T.DoubleType(), True),
        T.StructField("nws_chars", T.IntegerType(), True),
    ]
)

# v1 rules FIRST (ladder prefix = v1 ladder), then the audio-metric rules.
# Severities follow operators.audio_audit.AUDIT_RULES where a twin exists.
DROP_RULES_V2: dict[str, str] = {
    **DROP_RULES,
    "dropout": "critical",
    "stuck_samples": "critical",
    "low_snr": "warning",
    "loudness_range": "warning",
    "dc_offset": "warning",
    "upsampled": "warning",
    "speaking_rate": "warning",
}

# speaking-rate band over VAD speech time — mirrors the defaults of
# operators.audio_vad.speaking_rate (kept in sync by test_gate_v2)
SPEAK_MIN_CPS = 4.0
SPEAK_MAX_CPS = 30.0
SPEAK_MIN_SPEECH_MS = 200


def _feature_batch_v2(batch, col_idx: dict[str, int]):
    """v1 feature arrays + the extended audio metrics, ONE decode per clip.

    The v1 fields are computed with the same kernels as ``_feature_batch``
    (``decode_stats`` is ``clip_stats_i16(_decode_i16(...))``), so they are
    bit-identical; the extended kernels run on the shared int16 buffer the
    way ``operators.audio_audit`` does.  Non-whitespace char counts come
    from vectorized Arrow compute, not per-row Python."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .functions import text as X
    from .functions.audio import _decode_i16, clip_stats_i16
    from .functions.dropout import dropout_stats_i16
    from .functions.loudness import clip_loudness
    from .functions.snr import speech_snr
    from .functions.spectral import bandwidth_stats
    from .functions.vad import frame_mean_squares, vad_stats

    n = batch.num_rows
    payload = batch.column(col_idx["bytes"])
    codecs = batch.column(col_idx["codec"]).to_pylist()
    srs = batch.column(col_idx["sr_hz"]).to_pylist()
    texts = batch.column(col_idx["transcript"]).to_pylist()
    out = {
        "decode_ok": np.zeros(n, dtype=bool),
        "rms_db": np.full(n, np.nan),
        "peak_db": np.full(n, np.nan),
        "silence_frac": np.full(n, np.nan),
        "clip_frac": np.full(n, np.nan),
        "n_samples": np.zeros(n, dtype=np.int64),
    }
    ext: dict[str, list] = {f.name: [] for f in FEATURES_V2_EXT_TYPE.fields
                            if f.name != "nws_chars"}
    txt = pc.fill_null(batch.column(col_idx["transcript"]).cast(pa.string()), "")
    nws = pc.utf8_length(
        pc.replace_substring_regex(txt, pattern="[ \\t\\n\\r]+", replacement="")
    ).cast(pa.int32())
    for i in range(n):
        sr = srs[i]
        buf = payload[i].as_buffer() if payload[i].is_valid else None
        try:
            q = _decode_i16(buf, codecs[i], int(sr) if sr is not None else None)
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        if ok:
            st = clip_stats_i16(q, int(sr) if sr and sr > 0 else 1)
            out["decode_ok"][i] = True
            out["rms_db"][i] = st["rms_db"]
            out["peak_db"][i] = st["peak_db"]
            out["silence_frac"][i] = st["silence_frac"]
            out["clip_frac"][i] = st["clip_frac"]
            out["n_samples"][i] = int(st["n_samples"])
        sr0 = int(sr) if sr else 0
        x = q.astype(np.float32) / np.float32(32767.0)
        # one shared 20 ms frame-energy reduction for VAD + SNR (the
        # fused-audit law; bit-identical — same function either way)
        fr = frame_mean_squares(x, sr0) if x.size and sr0 > 0 else None
        vd = vad_stats(x, sr0, frames=fr)
        sn = speech_snr(x, sr0, frames=fr)
        lf = clip_loudness(x, sr0)
        dp = dropout_stats_i16(q, sr0)
        bw = bandwidth_stats(x, sr0)
        ext["speech_ratio"].append(vd["speech_ratio"])
        ext["speech_ms"].append(vd["speech_ms"])
        ext["snr_db"].append(sn["snr_db"])
        ext["lufs_i"].append(lf["lufs_i"])
        ext["n_dropouts"].append(dp["n_dropouts"])
        ext["max_const_run"].append(dp["max_const_run"])
        ext["dc_sum"].append(dp["dc_sum"])
        ext["bw_rms"].append(bw["rms"])
        ext["hf_db"].append(bw["hf_db"])
    langs, confs = X.LANGID.score_batch(texts)
    ppls = X.PPLM.ppl_batch(texts, langs)
    pa_types = {
        "speech_ratio": pa.float64(), "speech_ms": pa.int32(),
        "snr_db": pa.float64(), "lufs_i": pa.float64(),
        "n_dropouts": pa.int64(), "max_const_run": pa.int64(),
        "dc_sum": pa.int64(), "bw_rms": pa.float64(), "hf_db": pa.float64(),
    }
    return [
        pa.array(out["decode_ok"]),
        pa.array(out["rms_db"]),
        pa.array(out["peak_db"]),
        pa.array(out["silence_frac"]),
        pa.array(out["clip_frac"]),
        pa.array(out["n_samples"]),
        pa.array(langs, type=pa.string()),
        pa.array(confs, type=pa.float64()),
        pa.array(ppls, type=pa.float64()),
    ] + [pa.array(ext[k], type=pa_types[k]) for k in pa_types] + [nws]


def featurize_v2(df: DataFrame, counter=None) -> DataFrame:
    """One ``mapInArrow`` pass emitting the v1 features (bit-identical)
    plus the extended audio metrics; payload bytes dropped on output."""
    in_names = [f.name for f in df.schema.fields]
    col_idx = {name: i for i, name in enumerate(in_names)}
    carried = [name for name in in_names if name != "bytes"]
    out_schema = T.StructType(
        [
            T.StructField(f.name, f.dataType, True)
            for f in df.schema.fields
            if f.name != "bytes"
        ]
        + list(FEATURES_TYPE.fields)
        + list(FEATURES_V2_EXT_TYPE.fields)
    )
    out_names = (
        carried
        + [f.name for f in FEATURES_TYPE.fields]
        + [f.name for f in FEATURES_V2_EXT_TYPE.fields]
    )

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            feats = _feature_batch_v2(batch, col_idx)
            if counter is not None:
                counter.add(batch.num_rows)
            arrays = [batch.column(col_idx[name]) for name in carried] + feats
            yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    return df.mapInArrow(run, out_schema)


def rule_flags_v2(df: DataFrame) -> dict[str, Column]:
    """v1 flags (identical Column expressions) + the audio-metric rules.

    No-evidence law, stated explicitly (the v1 ``_metric_default``
    treatment, applied here per metric): an unmeasurable metric — NULL
    *or* NaN — never fires an audio rule; decode failures are owned by
    ``decode_failed``.  Each float metric defaults to its own rule's
    non-firing boundary value (snr_db→SNR_MIN_DB, lufs_i→LUFS_MIN,
    bw_rms→0, hf_db→MAX_UPSAMPLED_HF_DB), so the law holds even if a
    kernel starts emitting Arrow NaN instead of None: Spark's
    NaN-greatest compare would otherwise fire ``loudness_range`` on
    every unmeasurable clip while the > side of ``low_snr`` stayed
    silent — the exact asymmetry the v1 gate shipped with.  Integer
    metrics cannot be NaN; their NULLs fall to the ``coalesce(·,
    False)`` flag wrapper."""
    from .operators.audio_audit import LUFS_MAX, LUFS_MIN, SNR_MIN_DB
    from .operators.audio_bandwidth import (
        MAX_UPSAMPLED_HF_DB,
        MIN_MEASURABLE_RMS,
    )
    from .operators.audio_dropout import DC_DEN, DC_NUM, STUCK_MIN_DEFAULT

    flags = rule_flags(df)
    # ANSI-safe: cps is NULL (not an error) when speech_ms == 0 — the
    # measurable guard already excludes those rows from the flag
    cps = (
        F.col("nws_chars").cast("double")
        * 1000.0
        / F.when(F.col("speech_ms") > 0, F.col("speech_ms").cast("double"))
    )
    measurable = (
        (F.col("speech_ms") >= F.lit(SPEAK_MIN_SPEECH_MS))
        & (F.col("nws_chars") > 0)
    )
    snr = _mdef(df, "snr_db", SNR_MIN_DB)
    lufs = _mdef(df, "lufs_i", LUFS_MIN)
    bw_rms = _mdef(df, "bw_rms", 0.0)
    hf_db = _mdef(df, "hf_db", MAX_UPSAMPLED_HF_DB)
    v2 = {
        "dropout": F.col("n_dropouts") > 0,
        "stuck_samples": F.col("max_const_run") >= F.lit(STUCK_MIN_DEFAULT),
        "low_snr": snr < F.lit(SNR_MIN_DB),
        "loudness_range": (lufs < F.lit(LUFS_MIN))
        | (lufs > F.lit(LUFS_MAX)),
        "dc_offset": F.abs(F.col("dc_sum")) * F.lit(DC_DEN)
        > F.lit(DC_NUM) * F.col("n_samples") * F.lit(32768),
        "upsampled": (bw_rms >= F.lit(MIN_MEASURABLE_RMS))
        & (hf_db < F.lit(MAX_UPSAMPLED_HF_DB)),
        "speaking_rate": measurable
        & ((cps < F.lit(SPEAK_MIN_CPS)) | (cps > F.lit(SPEAK_MAX_CPS))),
    }
    for name, col in v2.items():
        flags[name] = F.coalesce(col, F.lit(False))
    return flags


def decide_v2(df: DataFrame) -> DataFrame:
    """The v2 decision over a ``featurize_v2``-featurized frame: v1 ladder
    first (bit-stable reasons for v1 drops), audio-metric rules after."""
    df = with_metric_defaults(df, v2=True)
    return _decide_with(df, rule_flags_v2(df))


def decide3_v2(df: DataFrame) -> DataFrame:
    """3-way decision over the v2 rule set (same enum semantics as
    ``decide3``; v2 severities from DROP_RULES_V2)."""
    df = with_metric_defaults(df, v2=True)
    return _decide3_with(df, rule_flags_v2(df), DROP_RULES_V2)


def gate_v2(df: DataFrame, counter=None) -> DataFrame:
    """Full v2 per-row pipeline: one-decode wide featurize → text
    heuristics → extended decide/scrub.  Same shuffle profile as ``gate``
    (none until a downstream rollup)."""
    return decide_v2(_text_heuristics(featurize_v2(df, counter=counter)))


def gate_v2_issues(decided: DataFrame, table: str = "clips") -> DataFrame:
    """QualityIssue relation for the v2 rule set — one fused agg pass."""
    from .operators.rules import Rule, compile_rules

    decided = with_metric_defaults(decided, v2=True)
    flags = rule_flags_v2(decided)
    rules = [
        Rule(
            name=name,
            column=None,
            predicate=lambda d, c=col: c,
            severity=DROP_RULES_V2[name],
            description=f"gate rule {name} violated",
        )
        for name, col in flags.items()
    ]
    return compile_rules(decided, table, rules)


# The audio-measurable subset of DROP_RULES_V2, in the same ladder order —
# the per-utterance gate's rule set.  Transcript rules need a caption
# ALIGNED to the segment, which requires a forced aligner this engine
# deliberately does not fake (the aligner is a declared seam, NEXT.md);
# caption-level gating stays a clip-level concern.
UTTERANCE_DROP_RULES: dict[str, str] = {
    name: DROP_RULES_V2[name]
    for name in (
        "decode_failed", "bad_sample_rate", "bad_duration",
        "duration_mismatch", "mostly_silence", "clipping", "too_quiet",
        "dropout", "stuck_samples", "low_snr", "loudness_range",
        "dc_offset", "upsampled",
    )
}


def utterance_gate(
    df: DataFrame, *, min_dur_ms: int = 200, counter=None
) -> DataFrame:
    """Per-utterance keep/drop — the v2 gate run OVER the chunker's
    segment product.  Segments ARE clips, so the gate machinery composes
    unchanged: ``extract_segments`` (one decode per source clip, payload
    sliced on exact frame-grid sample bounds) → ``featurize_v2`` (one
    decode per segment runs every audio kernel) → the
    ``UTTERANCE_DROP_RULES`` ladder (first-violated rule is the reason;
    a NULL metric never fires a rule).

    ``duration_mismatch`` stays in the ladder as a chunker-consistency
    invariant: the segment's ``dur_ms`` is the VAD's rounded frame-grid
    value, so a firing here means the chunker wrote a wrong duration.

    Plan shape: two chained ``mapInArrow`` stages over one scan, zero
    shuffles; payloads never cross an exchange.  At 100 TB the fan-out is
    bounded by audio duration (segments per clip), never by row count.
    Reference analog: the medallion per-row decision enum
    (checkpoints.py:216-252) applied at utterance granularity.
    """
    from .operators.audio_vad import extract_segments

    segs = extract_segments(df, min_dur_ms=min_dur_ms, counter=counter)
    seg_clips = segs.select(
        F.concat_ws(
            "#", "clip_id", F.col("seg_idx").cast("string")
        ).alias("clip_id"),
        "start_ms",
        "bytes",
        "sr_hz",
        "dur_ms",
        F.lit("pcm16").alias("codec"),
        # no aligned caption exists for a segment: an empty transcript
        # keeps featurize_v2's kernel signature (langid fields land
        # "und"/0.0 and no transcript rule is in the ladder below)
        F.lit("").alias("transcript"),
    )
    feats = with_metric_defaults(featurize_v2(seg_clips), v2=True)
    all_flags = rule_flags_v2(feats)
    flags = {name: all_flags[name] for name in UTTERANCE_DROP_RULES}
    reason = F.lit(None).cast("string")
    for name in reversed(list(flags)):
        reason = F.when(flags[name], F.lit(name)).otherwise(reason)
    drop = None
    for c in flags.values():
        drop = c if drop is None else (drop | c)
    return _drop_defaults(
        feats.withColumn("decision", F.when(drop, "drop").otherwise("keep"))
        .withColumn("decision_reason", reason)
        .drop("transcript", "codec")
    )


def clips_funnel(df: DataFrame, group_col: str = "codec") -> DataFrame:
    """Per-``group_col`` survivor counts through the gate's stages —
    the audio twin of ``operators.quality_filters.corpus_funnel``:

    ``n_raw`` → ``n_decode_ok`` (container/codec/sr/duration sanity) →
    ``n_signal_ok`` (also no silence/clipping/too-quiet defect) →
    ``n_transcript_ok`` (also passes every transcript heuristic) →
    ``n_keep`` (also confident language ID).

    Stage columns are monotone by construction, and because the stages
    partition ``DROP_RULES``, ``n_keep`` is bit-identical to the gate's
    keep count (``sum(decision = 'keep')``) — the funnel adds ZERO new
    predicates, only attributes the drops to pipeline stages.  One fused
    aggregate over the already-featurized frame: no extra scan, no extra
    shuffle beyond the ~#groups rollup.
    """
    df = with_metric_defaults(df)
    flags = rule_flags(df)
    staged = [name for names in FUNNEL_STAGES.values() for name in names]
    assert sorted(staged) == sorted(DROP_RULES), (
        "FUNNEL_STAGES must partition DROP_RULES"
    )
    cum = F.lit(True)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_raw")]
    names = {"decode": "n_decode_ok", "signal": "n_signal_ok",
             "transcript": "n_transcript_ok", "language": "n_keep"}
    for stage, rules in FUNNEL_STAGES.items():
        ok = F.lit(True)
        for r in rules:
            ok = ok & ~flags[r]
        cum = cum & ok
        aggs.append(F.sum(cum.cast("int")).cast("long").alias(names[stage]))
    return df.groupBy(group_col).agg(*aggs).orderBy(group_col)
