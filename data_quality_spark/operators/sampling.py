"""Deterministic sampling + key-skew audit for training-corpus curation.

A 10^12-row corpus is never trained on raw: it is *rebalanced* (cap the
dominant language/source keys), *downsampled* (hold-out and ablation cuts),
and *audited for skew* (which keys need salting before the big joins).
These operators make all three reproducible — every sample is a pure
function of (row id, seed), never of partitioning, task order, or Spark's
`rand()` — so a resumed or re-run job selects byte-identical rows.

Two hash orders:

- **fast** (default): ``xxhash64(id, seed)`` — one JVM-side 64-bit hash,
  whole-stage-codegen friendly; the production path.
- **portable**: ``md5(cast(id as string) || ':' || seed)`` — bit-identical
  lowercase hex in Spark, DuckDB, and Python ``hashlib``, so the sample
  membership itself is differential-oracle-checkable across engines.

Scale notes (the part that matters at 10^12 rows):

- ``capped_sample`` is a per-key top-``cap`` by hash order.  The naive
  formulation shuffles EVERY row to its key's window.  With
  ``presample_factor`` set, a first pass aggregates per-key counts (partial
  agg, tiny relation), every row is filtered by ``uniform(hash) <
  factor*cap/n_key`` BEFORE the shuffle, and the exact window runs on the
  ~``factor*cap``-per-key survivor set.  Because the *threshold* and the
  *order* use the same hash, the result is bit-identical to the exact path
  whenever >= min(cap, n_key) rows survive per key (the top-cap smallest
  hashes are below any threshold that admits >= cap rows); undershoot odds
  decay like exp(-cap*(factor-1)^2/(2*factor)) per key and
  ``capped_sample_audit`` makes the exactness machine-checkable.
- ``deterministic_sample`` is a pure filter — ZERO shuffle, no count pass:
  membership is ``md5_hex < threshold_hex`` with the threshold literal
  precomputed from the fraction.  This is the only sampler shape that is
  free at any scale, and it composes with partition pruning untouched.
- ``skew_audit`` is one groupBy on the audited keys (map-side partials,
  |keys| output rows) + one scalar summary joined back broadcast-style.

Reference analog: none (the reference samples via SQL ``LIMIT`` probes,
``cli.py:148-234``); the deterministic-membership design is what its
row-sample scan (S4) needs to become at cluster scale.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sample_order_col",
    "fraction_threshold_hex",
    "capped_sample",
    "capped_sample_audit",
    "stratified_sample",
    "deterministic_sample",
    "token_budget_sample",
    "token_budget_audit",
    "mixture_budgets",
    "mixture_sample",
    "mixture_audit",
    "temperature_budgets",
    "temperature_audit",
    "skew_audit",
    "eval_manifest",
]


def sample_order_col(id_col: Column, seed: int, portable: bool) -> Column:
    """The deterministic pseudo-random sort key for one row.

    fast: xxhash64 over (id, seed) — int64.
    portable: md5 hex of ``coalesce(cast(id as string),'') || ':seed'`` —
    the same lowercase-hex string DuckDB's ``md5()`` and Python's
    ``hashlib.md5`` produce, so lexicographic order agrees everywhere.
    """
    if portable:
        key = F.concat(F.coalesce(id_col.cast("string"), F.lit("")),
                       F.lit(f":{seed}"))
        return F.md5(key)
    return F.xxhash64(id_col, F.lit(seed))


def fraction_threshold_hex(fraction: float) -> str:
    """32-char lowercase hex literal h such that P[md5_hex < h] ==
    floor(fraction * 16^32) / 16^32 under a uniform md5.  String comparison
    on lowercase hex is numeric comparison, identically in Spark, DuckDB,
    and Python."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(int(fraction * (1 << 128)), "032x")


def capped_sample(
    df: DataFrame,
    keys: Sequence[str],
    cap: int,
    id_col: str,
    seed: int = 0,
    portable: bool = False,
    presample_factor: float | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per distinct ``keys`` value, chosen by
    deterministic hash order; adds ``sample_rank`` (1-based within key).

    ``presample_factor`` (e.g. 2.0) enables the pre-shuffle Bernoulli
    filter described in the module docstring — same result, ~cap*factor
    rows per key through the shuffle instead of all of them."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    order = sample_order_col(F.col(id_col), seed, portable)
    src = df
    if presample_factor is not None:
        if presample_factor < 1.0:
            raise ValueError("presample_factor must be >= 1")
        if portable:
            raise ValueError("presample is the fast-path optimization; "
                             "portable mode keeps the exact formulation")
        counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n_key"))
        # uniform in [0,1) from the signed xxhash64
        u = (order.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)
        thresh = F.least(
            F.lit(1.0), F.lit(presample_factor * cap) / F.col("__n_key"))
        src = (
            df.join(counts, list(keys), "inner")
            .where(u < thresh)
            .select(*df.columns)  # joins put key cols first; keep schema
        )
    w = Window.partitionBy(*keys).orderBy(order.asc(), F.col(id_col).asc())
    return (
        src.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= cap)
    )


def capped_sample_audit(
    df: DataFrame,
    sampled: DataFrame,
    keys: Sequence[str],
    cap: int,
) -> DataFrame:
    """Per-key exactness check for a (presampled) capped sample:
    ``exact`` is true iff the key kept ``min(cap, n_rows)`` rows — the
    machine-checkable guarantee that the presample shortcut lost nothing."""
    n_all = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    n_got = sampled.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        n_all.join(n_got, list(keys), "left")
        .select(
            *keys,
            "n_rows",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            (F.coalesce("n_sampled", F.lit(0))
             == F.least(F.lit(cap), F.col("n_rows"))).alias("exact"),
        )
    )


def stratified_sample(
    df: DataFrame,
    keys: Sequence[str],
    caps: Mapping[tuple, int] | int,
    id_col: str,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Per-key caps from a mapping (key-tuple -> cap; keys absent from the
    mapping are dropped), or a single int for uniform rebalancing.  Same
    deterministic-order contract as ``capped_sample``."""
    if isinstance(caps, int):
        return capped_sample(df, keys, caps, id_col, seed, portable)
    if not caps:
        raise ValueError("caps mapping is empty")
    spark = df.sparkSession
    rows = [tuple(k) + (int(v),) for k, v in caps.items()]
    cap_df = spark.createDataFrame(rows, list(keys) + ["__cap"])
    order = sample_order_col(F.col(id_col), seed, portable)
    w = Window.partitionBy(*keys).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(cap_df), list(keys), "inner")
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= F.col("__cap"))
        .drop("__cap")
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Shuffle-free Bernoulli(fraction) sample with portable membership:
    keep row iff ``md5(id || ':seed') < fraction_threshold_hex(fraction)``.
    Reproducible across engines, partitionings, and reruns; NULL ids hash
    as the empty string (kept or dropped deterministically, never lost to
    NULL-comparison semantics)."""
    thresh = fraction_threshold_hex(fraction)
    return df.where(
        sample_order_col(F.col(id_col), seed, portable=True) < F.lit(thresh))


def token_budget_sample(
    df: DataFrame,
    weight_col: str,
    budget: int,
    strata: Sequence[str],
    id_col: str,
    seed: int = 0,
    portable: bool = False,
    presample_factor: float | None = None,
) -> DataFrame:
    """Per-stratum token budgeting: walk each stratum in deterministic hash
    order and keep rows while the running ``weight_col`` total BEFORE the
    row is < ``budget`` (so the boundary row that crosses the budget is
    included — the selection always reaches the budget when the stratum
    can).  This is the data-mixing primitive: "max N tokens per language /
    source" as a pure function of (id, seed).

    Adds ``cum_before`` (the exact running total before the row) so the
    caller can trim the boundary row's overshoot if partial documents are
    acceptable.

    Scale: the exact path is one exchange + sort per ``strata`` value (the
    window).  For 10^12-row strata, ``presample_factor`` (fast path only)
    first aggregates per-stratum total weight (tiny relation), then filters
    rows by ``uniform(hash) < factor * budget / total_weight`` BEFORE the
    shuffle — the kept set is a hash-order prefix, so the result is
    bit-identical whenever the survivors' weight reaches the budget
    (``token_budget_audit`` makes that machine-checkable, exactly like
    ``capped_sample_audit``)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = sample_order_col(F.col(id_col), seed, portable)
    src = df
    if presample_factor is not None:
        if presample_factor < 1.0:
            raise ValueError("presample_factor must be >= 1")
        if portable:
            raise ValueError("presample is the fast-path optimization; "
                             "portable mode keeps the exact formulation")
        totals = df.groupBy(*strata).agg(
            F.sum(weight_col).alias("__w_total"))
        u = (order.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)
        thresh = F.least(
            F.lit(1.0),
            F.lit(presample_factor * budget) / F.col("__w_total"))
        src = (
            df.join(totals, list(strata), "inner")
            .where(u < thresh)
            .select(*df.columns)
        )
    w = Window.partitionBy(*strata).orderBy(order.asc(), F.col(id_col).asc())
    cum_before = (
        F.sum(F.col(weight_col)).over(w) - F.col(weight_col)
    ).alias("cum_before")
    return (
        src.select("*", cum_before)
        .where(F.col("cum_before") < F.lit(budget))
    )


def token_budget_audit(
    df: DataFrame,
    sampled: DataFrame,
    weight_col: str,
    budget: int,
    strata: Sequence[str],
) -> DataFrame:
    """Per-stratum exactness check for a (presampled) token-budget sample:
    ``exact`` is true iff the stratum's selected weight reached
    ``min(budget, stratum_total_weight)`` — i.e. the presample filter did
    not starve the prefix.  (The boundary row may overshoot the budget;
    reaching it is the guarantee, matching it exactly is not possible with
    whole documents.)"""
    w_all = df.groupBy(*strata).agg(F.sum(weight_col).alias("w_total"))
    w_got = sampled.groupBy(*strata).agg(
        F.sum(weight_col).alias("w_sampled"),
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
    )
    return (
        w_all.join(w_got, list(strata), "left")
        .select(
            *strata,
            "w_total",
            F.coalesce("w_sampled", F.lit(0)).alias("w_sampled"),
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            (F.coalesce("w_sampled", F.lit(0))
             >= F.least(F.lit(budget), F.col("w_total"))).alias("exact"),
        )
    )


def skew_audit(
    df: DataFrame,
    keys: Sequence[str],
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` heaviest key values with their share of all rows and
    ratio to the mean key weight — the relation that decides which join /
    aggregation keys need salting (ratio_to_mean >> 1) before a big
    shuffle.  One groupBy (map-side partials) + one 1-row summary cross
    join; never moves base rows."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    summary = per_key.agg(
        F.sum("cnt").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    w = Window.orderBy(F.col("cnt").desc(), *[F.col(k).asc() for k in keys])
    return (
        per_key.crossJoin(F.broadcast(summary))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            *keys,
            "cnt",
            (F.col("cnt") / F.col("__total")).alias("share"),
            (F.col("cnt") * F.col("__n_keys") / F.col("__total"))
            .alias("ratio_to_mean"),
            "rank",
        )
    )


def mixture_budgets(
    total_budget: int, mixture: dict[str, float]
) -> dict[str, int]:
    """Per-stratum integer budgets from target mixture fractions
    (floor(frac · total), computed once driver-side so every consumer —
    selection, audit, oracle — shares the same integers)."""
    if total_budget <= 0:
        raise ValueError(f"total_budget must be positive, got {total_budget}")
    if not mixture:
        raise ValueError("mixture must name at least one stratum")
    for k, frac in mixture.items():
        if frac < 0:
            raise ValueError(f"negative mixture fraction for {k!r}")
    return {k: int(total_budget * frac) for k, frac in mixture.items()}


def mixture_sample(
    df: DataFrame,
    weight_col: str,
    total_budget: int,
    mixture: dict[str, float],
    stratum_col: str,
    id_col: str,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Data mixing toward target proportions (the Pile / DoReMi shape):
    each stratum named in ``mixture`` gets ``floor(frac · total_budget)``
    of the ``weight_col`` budget, filled in deterministic hash order
    exactly like :func:`token_budget_sample` (the boundary row crossing
    the budget is included); strata absent from ``mixture`` are excluded
    entirely.

    This is a PLAN EXECUTOR, not an optimizer: when a stratum cannot fill
    its quota the shortfall is NOT redistributed (re-weighting mixtures
    against available data is DoReMi's offline optimization — a declared
    seam).  :func:`mixture_audit` makes the shortfall visible as data.

    Scale: one budget lookup per row (literal when-chain over |mixture|
    strata), one exchange + per-stratum window sort — identical shuffle
    budget to token_budget_sample.
    """
    budgets = mixture_budgets(total_budget, mixture)
    return _budgeted_sample(df, weight_col, budgets, stratum_col, id_col,
                            seed, portable)


def _budgeted_sample(
    df: DataFrame,
    weight_col: str,
    budgets: dict[str, int],
    stratum_col: str,
    id_col: str,
    seed: int,
    portable: bool,
) -> DataFrame:
    """The budget-prefix selection law shared by :func:`mixture_sample`
    and :func:`temperature_audit`: per stratum, fill the integer budget
    in deterministic hash order (boundary row included); strata with no
    budget entry get 0.  An empty budget map selects nothing."""
    if not budgets:
        return df.where(F.lit(False)).withColumn(
            "cum_before", F.lit(None).cast("long"))
    bcol = None
    for k, b in sorted(budgets.items()):
        clause = F.when(F.col(stratum_col) == k, F.lit(b))
        bcol = clause if bcol is None else bcol.when(
            F.col(stratum_col) == k, F.lit(b)
        )
    bcol = bcol.otherwise(F.lit(0))
    order = sample_order_col(F.col(id_col), seed, portable)
    w = Window.partitionBy(stratum_col).orderBy(order.asc(), F.col(id_col).asc())
    cum_before = (
        F.sum(F.col(weight_col)).over(w) - F.col(weight_col)
    ).alias("cum_before")
    return (
        df.select("*", cum_before)
        .where(F.col("cum_before") < bcol)
    )


def temperature_budgets(
    weights: dict[str, int],
    total_budget: int,
    alpha: float = 0.5,
    scale_bits: int = 20,
) -> dict[str, int]:
    """Per-stratum integer budgets under the temperature-sampling law
    (mT5/XLM-R): budget_l ∝ n_l^alpha — alpha < 1 upweights
    low-resource strata relative to their corpus share.

    The alpha = 0.5 path is ENGINE-EXACT integer arithmetic end to end:
    q_l = isqrt(n_l · 2^scale_bits) (Python arbitrary-precision isqrt),
    budget_l = total · q_l // Σq.  A SQL twin's
    ``floor(sqrt(CAST(n·2^k AS DOUBLE)))`` provably equals isqrt for
    integer arguments below 2^53 (a correctly-rounded sqrt of an
    integer cannot land within 1 of the next perfect square), i.e. for
    n_l ≤ 2^33 at the default scale — document larger corpora with a
    bigger unit (tokens → Mtokens) rather than raising scale_bits.
    Every other rational alpha = p/q (denominator ≤ 64 — 0.3, 0.7,
    0.25, …) is engine-exact through the same integer machinery via
    arbitrary-precision q-th roots (``_temperature_q``); DuckDB 1.0
    has no big-int type that could replay n^p beyond 128 bits, so
    those twins are independent pure-Python integer replays rather
    than strict SQL.
    """
    if total_budget <= 0:
        raise ValueError(f"total_budget must be positive, got {total_budget}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    qs = {k: _temperature_q(n, alpha, scale_bits)
          for k, n in weights.items()}
    tot = sum(qs.values())
    if tot == 0:
        return {k: 0 for k in qs}
    return {k: total_budget * q // tot for k, q in qs.items()}


def _alpha_fraction(alpha: float) -> tuple[int, int]:
    """α as the exact rational p/q it was published as (denominator ≤
    64 covers every published temperature: 0.3 → 3/10, 0.7 → 7/10,
    0.25 → 1/4 …).  A float that is not within 1e-9 of such a rational
    is rejected rather than silently re-interpreted."""
    from fractions import Fraction

    fr = Fraction(alpha).limit_denominator(64)
    if abs(float(fr) - alpha) > 1e-9:
        raise ValueError(
            f"alpha={alpha} is not a rational with denominator <= 64; "
            "pass a published temperature like 0.3, 0.5, 0.7"
        )
    return fr.numerator, fr.denominator


def _iroot(x: int, k: int) -> int:
    """floor(x**(1/k)) on arbitrary-precision ints (Newton, isqrt-style
    — exact for ANY size, unlike float pow whose rounding can cross an
    integer boundary)."""
    if x < 0 or k <= 0:
        raise ValueError(f"iroot domain: x={x}, k={k}")
    if x == 0:
        return 0
    if k == 1:
        return x
    r = 1 << -(-x.bit_length() // k)  # upper-bound seed: 2^ceil(bits/k)
    while True:
        nr = ((k - 1) * r + x // r ** (k - 1)) // k
        if nr >= r:
            break
        r = nr
    # Newton lands on floor or floor+1 from above; settle exactly
    while r ** k > x:
        r -= 1
    return r


def _temperature_q(n: int, alpha: float, scale_bits: int) -> int:
    """The quantized temperature weight — ONE definition shared by the
    budget law and the audit's reported ``q`` column.

    ENGINE-EXACT for every rational α = p/q (denominator ≤ 64):
    q_l = ⌊(n^p · 2^(q·h))^(1/q)⌋ = ⌊n^(p/q) · 2^h⌋ with
    h = scale_bits // 2, via arbitrary-precision integer q-th roots —
    for α = 1/2 this is identically the original
    ``isqrt(n << scale_bits)`` law, so existing α=0.5 artifacts are
    unchanged.  Float ``pow`` is never consulted: its ≥1-ulp rounding
    near an integer boundary is exactly the class of silent budget
    flip this law exists to exclude."""
    import math

    n = max(int(n), 0)
    if alpha == 0.5:
        return math.isqrt(n << scale_bits)
    p, q = _alpha_fraction(alpha)
    half = scale_bits // 2
    return _iroot((n ** p) << (q * half), q)


def temperature_audit(
    df: DataFrame,
    weight_col: str,
    total_budget: int,
    stratum_col: str,
    id_col: str,
    alpha: float = 0.5,
    seed: int = 0,
    portable: bool = False,
    scale_bits: int = 20,
) -> DataFrame:
    """Temperature mixing executed and audited: per stratum —

        stratum ▸ avail_weight, q, budget, n_sel, sel_weight, filled

    Budgets come from :func:`temperature_budgets` over the per-stratum
    ``weight_col`` totals (ONE tiny aggregate collected driver-side,
    the bounded-collect law); selection is the shared budget-prefix law
    in portable hash order.  Every stratum present in ``df``
    participates — temperature sampling has no target list to forget a
    language from; a NULL stratum is its own stratum (normalized
    internally to a sentinel so the literal budget lookup — where
    ``col == NULL`` never matches — still works)."""
    sk = F.coalesce(F.col(stratum_col).cast("string"), F.lit("\x00null"))
    norm = df.withColumn("__stratum", sk)
    avail_rows = (
        norm.groupBy("__stratum")
        .agg(
            F.sum(weight_col).cast("long").alias("avail_weight"),
            # sentinel-collision guard: a REAL stratum literally equal to
            # the NULL marker would silently merge with the NULL stratum's
            # budget — detect it in the same aggregate and refuse.
            F.max(F.col(stratum_col).isNotNull().cast("int"))
            .alias("__had_real"),
        )
        .collect()
    )
    for r in avail_rows:
        if r["__stratum"] == "\x00null" and r["__had_real"]:
            raise ValueError(
                f"temperature_audit: a value of {stratum_col!r} collides "
                "with the internal NULL-stratum sentinel '\\x00null'; "
                "rename that stratum or pre-normalize it"
            )
    weights = {r["__stratum"]: int(r["avail_weight"] or 0)
               for r in avail_rows}
    budgets = temperature_budgets(weights, total_budget, alpha,
                                  scale_bits)
    sel = _budgeted_sample(norm, weight_col, budgets, "__stratum",
                           id_col, seed, portable)
    got = sel.groupBy(F.col("__stratum").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sel"),
        F.sum(weight_col).cast("long").alias("sel_weight"),
    )
    btab = df.sparkSession.createDataFrame(
        sorted(
            (k, weights[k],
             _temperature_q(weights[k], alpha, scale_bits), b)
            for k, b in budgets.items()
        ),
        "stratum string, avail_weight long, q long, budget long",
    )
    return (
        btab.join(got, "stratum", "left")
        .select(
            F.when(F.col("stratum") == "\x00null", F.lit(None))
            .otherwise(F.col("stratum")).alias("stratum"),
            "avail_weight",
            "q",
            "budget",
            F.coalesce("n_sel", F.lit(0)).alias("n_sel"),
            F.coalesce("sel_weight", F.lit(0)).alias("sel_weight"),
            (F.coalesce("sel_weight", F.lit(0)) >= F.col("budget"))
            .alias("filled"),
        )
    )


def mixture_audit(
    df: DataFrame,
    weight_col: str,
    total_budget: int,
    mixture: dict[str, float],
    stratum_col: str,
    id_col: str,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """The mixing plan as data: per target stratum — available weight,
    integer budget, selected doc count/weight, and ``filled`` (selection
    reached the budget).  Selected weight can exceed the budget by at most
    the boundary row (same convention as token_budget_sample)."""
    budgets = mixture_budgets(total_budget, mixture)
    sel = mixture_sample(
        df, weight_col, total_budget, mixture, stratum_col, id_col,
        seed, portable,
    )
    avail = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.sum(weight_col).cast("long").alias("avail_weight")
    )
    got = sel.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sel"),
        F.sum(weight_col).cast("long").alias("sel_weight"),
    )
    btab = df.sparkSession.createDataFrame(
        sorted(budgets.items()), "stratum string, budget long"
    )
    return (
        btab.join(avail, "stratum", "left")
        .join(got, "stratum", "left")
        .select(
            "stratum",
            F.coalesce("avail_weight", F.lit(0)).alias("avail_weight"),
            "budget",
            F.coalesce("n_sel", F.lit(0)).alias("n_sel"),
            F.coalesce("sel_weight", F.lit(0)).alias("sel_weight"),
            (F.coalesce("sel_weight", F.lit(0)) >= F.col("budget")).alias(
                "filled"
            ),
        )
        .orderBy("stratum")
    )


def eval_manifest(
    manifest: DataFrame,
    cap_ms_per_lang: int | dict[str, int],
    lang_col: str = "lang_pred",
    dur_col: str = "dur_ms",
    id_col: str = "clip_id",
    decision_col: str = "decision",
    split_col: str = "split",
    seed: int = 0,
    portable: bool = True,
    default_cap_ms: int = 0,
) -> DataFrame:
    """The eval-side twin of the training manifest: per candidate clip
    (gate ``keep`` ∧ identity-split ``val``), the per-language balanced
    eval-set membership with duration accounting —

        id ▸ lang, [carried cols], dur_ms, cum_before_ms, in_eval

    Balance law: each language's eval budget is ``cap_ms_per_lang``
    milliseconds (an int for a uniform cap, or a per-language dict with
    ``default_cap_ms`` for unlisted languages), filled in the shared
    portable-hash prefix order (``sample_order_col`` — the
    mixture/temperature selection law), boundary clip INCLUDED (its
    ``cum_before`` is under the cap; selected duration may exceed the
    cap by at most that clip, the ``token_budget_sample`` convention).
    Every candidate row is returned with its ``in_eval`` verdict and
    ``cum_before_ms`` — the excluded-for-balance rows are the audit
    surface, not a silent drop.  Eval membership is a pure function of
    (id, seed, lang, caps): growing the corpus never reshuffles an
    existing language's prefix, it only extends it.

    Scale shape: the decision/split filters cut to the val slice of the
    keeps BEFORE any exchange; the only shuffle is that slice keyed by
    language for the per-language running sum.  Language is
    low-cardinality, but the relation under the window is the bounded
    eval candidate pool, not the corpus — if a single language's pool
    is itself 10^9 rows, pre-filter with a coarse hash-prefix before
    the window (the caps make anything past ~cap·10 irrelevant).

    Reference analog: none (the reference gates rows; it has no
    split/balance machinery) — this is the eval-set builder a curation
    pipeline needs beside ``training_manifest``.
    """
    cand = manifest.where(
        (F.col(decision_col) == "keep") & (F.col(split_col) == "val")
    )
    if isinstance(cap_ms_per_lang, dict):
        cap = None
        for k, b in sorted(cap_ms_per_lang.items()):
            clause = F.when(F.col(lang_col) == k, F.lit(int(b)))
            cap = clause if cap is None else cap.when(
                F.col(lang_col) == k, F.lit(int(b)))
        cap = (cap.otherwise(F.lit(int(default_cap_ms))) if cap is not None
               else F.lit(int(default_cap_ms)))
    else:
        cap = F.lit(int(cap_ms_per_lang))
    order = sample_order_col(F.col(id_col), seed, portable)
    w = Window.partitionBy(lang_col).orderBy(order.asc(),
                                             F.col(id_col).asc())
    dur = F.col(dur_col).cast("long")
    cum_before = (F.sum(dur).over(w) - dur).alias("cum_before_ms")
    return (
        cand.select("*", cum_before)
        .withColumn("in_eval", F.col("cum_before_ms") < cap)
    )
