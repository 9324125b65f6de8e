"""Duplicate-cluster resolution: connected components over near-dup pairs.

The dedup ladder (``operators/dedup.py``, ``operators/audio_dedup.py``)
emits verified near-duplicate PAIRS.  A corpus cut needs CLUSTERS: if A~B
and B~C, exactly one of {A, B, C} survives even though (A, C) was never
emitted as a pair.  That closure is connected components over the pair
graph.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).  Unlike naive
label propagation — whose round count is the graph DIAMETER, unbounded on
chain-shaped duplicate runs (crawl mirrors A~B~C~...~Z) — the star
operations contract every component onto its minimum node in
O(log n) rounds regardless of shape:

- large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u})
- small-star(u): connect every neighbor v < u, and u itself, to
  m = min(N<(u))

Each round is two self-joins + a groupBy on node id — shuffles carry only
(node, node) edges, never documents.  The edge relation shrinks toward one
edge per non-root node, so rounds get CHEAPER as they converge; lineage is
truncated with ``localCheckpoint`` so Catalyst never sees an
iteration-deep plan.  Convergence is detected by a per-round
(count, xxhash64-XOR) fingerprint of the canonicalized (distinct) edge
set — one action per round over the edge relation only.

At 10^12 documents the pair graph is orders smaller than the corpus (only
near-dup members appear), and this formulation is exactly the published
MapReduce one — no driver-side union-find, no collect.

Reference analog: none (the reference counts exact duplicate groups,
``quality_scanner.py:554-569``); this is the closure its duplicate family
needs at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "digest_chain_pairs",
    "connected_components",
    "cluster_members",
    "resolve_duplicates",
    "split_by_cluster",
    "balance_by_cluster",
    "decision_consistency",
]


def digest_chain_pairs(slim: DataFrame) -> DataFrame:
    """(id_a, id_b) rep→member chain edges over a (__id, __d) relation:
    k−1 edges per digest family, ONE digest-keyed shuffle, never
    quadratic.  The exact-identity edge law shared by the fingerprint,
    payload, and text digests — exact duplicate families must never
    depend on LSH bucket heat (the guards there bound NEAR-dup work,
    and at high replica density they drop exactly the buckets exact
    families live in; measured in the 1M identity smoke)."""
    fams = (
        slim.groupBy("__d")
        .agg(F.min("__id").alias("__rep"), F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
    )
    return (
        slim.join(fams, "__d")
        .where(F.col("__id") != F.col("__rep"))
        .select(F.col("__rep").alias("id_a"), F.col("__id").alias("id_b"))
    )


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a, b) with a < b, distinct, no
    self-loops."""
    a, b = F.col("a"), F.col("b")
    return (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )


def _sym(edges: DataFrame) -> DataFrame:
    """Both directions: each undirected edge as (u, v) and (v, u)."""
    return edges.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    nbr = _sym(edges)
    mins = nbr.groupBy("u").agg(F.min("v").alias("__mn"))
    m = F.least(F.col("u"), F.col("__mn"))
    return _canon(
        nbr.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), m.alias("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    nbr = _sym(edges).where(F.col("v") < F.col("u"))
    mins = nbr.groupBy("u").agg(F.min("v").alias("__mn"))
    linked = nbr.join(mins, "u").select(
        F.col("v").alias("a"), F.col("__mn").alias("b")
    )
    self_link = mins.select(F.col("u").alias("a"), F.col("__mn").alias("b"))
    return _canon(linked.union(self_link))


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component label is the minimum node id in the component.

    ``max_rounds`` is a safety rail, not a tuning knob: large-star /
    small-star needs O(log n) rounds, so 25 covers far beyond 10^12 nodes.
    Raises if the fixed point is somehow not reached (never silently
    returns a partial clustering).  Pass a ``stats`` dict to receive
    ``{"rounds": k}`` — the scale smokes assert the O(log n) round
    count is real, not hidden behind the convergence action.
    """
    edges = _canon(pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    edges = edges.localCheckpoint(eager=True)

    def fingerprint(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64(F.col("a"), F.col("b"))), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    prev = fingerprint(edges)
    for rounds_done in range(1, max_rounds + 1):
        # checkpoint EVERY round: each star references its input 2-3
        # times, so an unmaterialized k-round tree re-executes O(6^k)
        # scans under the convergence action — materializing first makes
        # the fingerprint a flat scan of the new edge set
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = fingerprint(edges)
        if cur == prev:
            if stats is not None:
                stats["rounds"] = rounds_done
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # fixed point is a star forest in canonical (a < b) form: a is the
    # root (= min of component), b the child; roots label themselves
    return (
        edges.select(F.col("b").alias("node"), F.col("a").alias("__c"))
        .union(
            edges.select(F.col("a").alias("node"), F.col("a").alias("__c"))
        )
        .groupBy("node")
        .agg(F.min("__c").alias("component"))
    )


def cluster_members(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(node, component, cluster_size) — per-member cluster assignment.
    The size join is component-keyed: the heavy side never re-shuffles on
    anything wider than the component label."""
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        "node", "component", "cluster_size"
    )


def resolve_duplicates(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    prefer: Column | None = None,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep-one-per-cluster decision relation: (id, component,
    cluster_size, keep).

    ``prefer`` ranks survivors (higher wins; default: longest ``text``),
    ties broken by smallest id so the choice is deterministic under any
    partitioning.  Rows of ``df`` that are in no cluster are absent —
    callers keep them unconditionally (anti-join on this relation's
    ``keep = false`` slice is the drop list)."""
    if prefer is None:
        prefer = F.length(F.coalesce(F.col("text"), F.lit("")))
    members = cluster_members(pairs, src, dst)
    ranked = (
        df.select(F.col(id_col).alias("node"), prefer.alias("__pref"))
        .join(members, "node")
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__pref").desc(), F.col("node").asc()
    )
    return ranked.select(
        F.col("node").alias(id_col),
        "component",
        "cluster_size",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def decision_consistency(
    members: DataFrame,
    decided: DataFrame,
    id_col: str = "clip_id",
    decision_col: str = "decision",
    keep_value: str = "keep",
    drop_value: str | None = None,
) -> DataFrame:
    """Per-cluster gate-decision consistency audit: near-duplicate
    clusters whose members got DIFFERENT keep/drop verdicts.

    A quality gate judges rows one at a time; dedup judges content.
    When a near-dup cluster is split by the gate — one encoding of a
    recording kept, its re-encoded twin dropped — both failure stories
    are live: the drop didn't remove the content (the kept twin leaks
    it back into training), and the keep is unstable (a re-encode away
    from rejection).  This audit is the join of the two machineries:

        component ▸ cluster_size, n_decided, n_keep, n_drop,
                    mixed, first_keep, first_drop

    ``mixed`` = the cluster saw both verdicts; ``first_keep`` /
    ``first_drop`` are the smallest member ids on each side (NULL when
    that side is empty) — the reviewer's entry point, and boundary
    pins for the differential oracle.  With the default
    ``drop_value=None``, EVERY decided-but-not-``keep_value`` verdict
    counts as a drop (two-outcome law: under a three-way gate, 'review'
    rows tally into ``n_drop`` and can mark a cluster mixed).  Pass an
    explicit ``drop_value`` (e.g. 'reject' for decide3 output) to count
    only that verdict as a drop; the remaining decided verdicts land in
    an extra ``n_other`` column and never flip ``mixed``.  Members
    absent from ``decided``
    (undecided rows) count in ``cluster_size`` but not ``n_decided``;
    a cluster with NO decided member still appears (n_decided = 0,
    mixed false) — vanishing rows would make the report irreconcilable
    against ``cluster_members``.

    Engine shape: one id-keyed join (members is node-level, decisions
    are row-level — both shuffle on the id, never on payloads) + ONE
    partial/final aggregate on the component label.  At 10^12 rows the
    audit touches only cluster MEMBERS (the pair graph's nodes), a
    corpus-orders-smaller relation.

    Reference analog: none — the reference gate (`data_quality`'s
    accept/reject) has no dedup to disagree with; this is the
    cross-check a combined curation pipeline needs.
    """
    dec = decided.select(
        F.col(id_col).alias("node"),
        F.col(decision_col).alias("__dec"),
    )
    joined = members.join(dec, "node", "left")
    is_keep = F.col("__dec") == keep_value
    if drop_value is None:
        is_drop = F.col("__dec").isNotNull() & ~is_keep
    else:
        is_drop = F.col("__dec") == drop_value
    aggs = [
        F.first("cluster_size").cast("long").alias("cluster_size"),
        F.count(F.col("__dec")).cast("long").alias("n_decided"),
        F.coalesce(F.sum(is_keep.cast("long")), F.lit(0)).cast("long")
        .alias("n_keep"),
        F.coalesce(F.sum(is_drop.cast("long")), F.lit(0)).cast("long")
        .alias("n_drop"),
        (F.min(F.when(is_keep, F.col("node"))).isNotNull()
         & F.min(F.when(is_drop, F.col("node"))).isNotNull())
        .alias("mixed"),
        F.min(F.when(is_keep, F.col("node"))).alias("first_keep"),
        F.min(F.when(is_drop, F.col("node"))).alias("first_drop"),
    ]
    if drop_value is not None:
        is_other = F.col("__dec").isNotNull() & ~is_keep & ~is_drop
        aggs.append(
            F.coalesce(F.sum(is_other.cast("long")), F.lit(0))
            .cast("long").alias("n_other")
        )
    return joined.groupBy("component").agg(*aggs)


def split_by_cluster(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    val_frac: float,
    seed: int = 0,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Leakage-safe train/val assignment: every row gets ``split`` ∈
    {'train', 'val'} decided by the portable md5 hash of its duplicate
    CLUSTER representative (the component min-id), so near-duplicates can
    never straddle the split — the per-row i.i.d. coin that leaks eval
    data through surviving near-dups is exactly what this replaces.
    Rows in no cluster are their own representative.

    Membership is a pure function of (representative, seed) via
    ``sampling.fraction_threshold_hex``, so the same corpus + seed yields
    byte-identical splits on any partitioning, engine (DuckDB/Python twins
    hash identically), or rerun — and adding new singleton documents never
    reassigns existing ones.

    Shuffle budget: the star rounds on the (tiny) pair graph, one
    component-keyed join of the assignment relation back onto ``df``'s
    ids; the document rows themselves exchange once on id for that join.
    """
    from .sampling import fraction_threshold_hex, sample_order_col

    comp = connected_components(pairs, src, dst).withColumnRenamed(
        "node", id_col
    )
    rep = F.coalesce(
        F.col("component").cast("string"), F.col(id_col).cast("string")
    )
    thresh = fraction_threshold_hex(val_frac)
    return (
        df.join(comp, id_col, "left")
        .withColumn("__rep", rep)
        .withColumn(
            "split",
            F.when(
                sample_order_col(F.col("__rep"), seed, portable=True)
                < F.lit(thresh),
                F.lit("val"),
            ).otherwise(F.lit("train")),
        )
        .drop("component", "__rep")
    )


def balance_by_cluster(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    cap: int,
    seed: int = 0,
    portable: bool = False,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-cluster contribution cap: keep at most ``cap`` rows from each
    duplicate/speaker cluster of the pair graph, chosen by deterministic
    hash order (ties by id) — the speaker-balancing cut an ASR corpus
    needs so one prolific voice (or one re-uploaded recording family)
    cannot dominate training.  Rows in no cluster are their own singleton
    cluster and survive whenever ``cap >= 1``.

    Output: all ``df`` columns + ``cluster_rep`` (component min-id, or the
    row's own id for singletons), ``cluster_size`` (1 for singletons),
    ``sample_rank`` (1-based within cluster in hash order) and ``keep``
    (= rank <= cap).  Membership is a pure function of (graph, id, seed):
    repartitioning or re-running cannot move a row across the cap line.

    Shuffle budget: the star rounds on the (tiny) pair graph, one id-keyed
    join of the assignment relation onto ``df``, one exchange on
    ``cluster_rep`` for the rank window.  The window partitions are
    cluster-sized — bounded by the dup family's own guards — never the
    corpus; singletons are rank-1 by construction but flow through the
    same window so the law stays one expression.
    """
    from .sampling import sample_order_col

    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    members = cluster_members(pairs, src, dst).withColumnRenamed(
        "node", id_col
    )
    rep = F.coalesce(
        F.col("component").cast("string"), F.col(id_col).cast("string")
    )
    order = sample_order_col(F.col(id_col), seed, portable)
    w = Window.partitionBy("cluster_rep").orderBy(order, F.col(id_col))
    return (
        df.join(members, id_col, "left")
        .withColumn("cluster_rep", rep)
        .withColumn(
            "cluster_size", F.coalesce("cluster_size", F.lit(1)).cast("long")
        )
        .withColumn("sample_rank", F.row_number().over(w))
        .withColumn("keep", F.col("sample_rank") <= F.lit(int(cap)))
        .drop("component")
    )
