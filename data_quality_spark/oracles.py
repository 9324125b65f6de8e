"""Driver-side differential oracles for the non-SQL-expressible queries.

The DuckDB correctness gate can hash-check any query whose twin is
expressible in SQL.  The MinHash-LSH / SimHash / SRP-ANN / media / clips-gate
queries depend on hash families (Spark ``xxhash64``) or Arrow kernels DuckDB
doesn't have — so this module computes their expected outputs with
**independent pure-Python/numpy implementations** (plus ``functions.xxh64``,
a from-spec XXH64 that bit-matches Spark's expression) and materializes them
as parquet under ``<repo>/expected/``.  ``oracle_sql()`` then SELECTs from
those files, turning every remaining rows-only check into a full
rows+schema+value-hash check.

Determinism contract: every generator here is seeded / input-driven (no
wall-clock, no unseeded RNG).  Floating-point replication rules used
throughout (verified empirically against Spark 4.x):

- Spark ``round(x, d)`` == ``Decimal(repr(x))`` quantized ROUND_HALF_UP
  (Java ``BigDecimal.valueOf`` uses the shortest decimal repr, same as
  Python ``repr``);
- Spark double comparisons are NaN-greatest (``nanSafeCompareDoubles``):
  ``NaN > x`` is true, ``NaN < x`` is false;
- ``coalesce`` passes NaN through (NaN is a value, not NULL);
- sequential Catalyst HOF folds (``aggregate``) are replicated with
  explicit left-to-right float64 loops.

Expected files regenerate automatically when the source data or generator
version changes (sidecar ``.meta.json`` key); generation is skipped for
inputs larger than the correctness scale (the bench at sf0.1 never pays
for it, and the committed sf0.01 files stay valid).
"""

from __future__ import annotations

import json
import math
import os
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from .functions.xxh64 import xxh64_int, xxh64_long, xxh64_string

__all__ = ["ensure_expected", "expected_path", "spark_round"]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPECTED_DIR = os.path.join(_REPO, "expected")
# bump to invalidate every committed expected file after a generator change
_VERSION = 17  # 17: exact-digest edges everywhere incl. the incremental index fp
# generation guard: differential oracles only run at correctness scale
_MAX_ORACLE_ROWS = 2500

_WS = re.compile(r"\s+")


def spark_round(x, d: int):
    """Replicate Spark's ``round`` on doubles (HALF_UP over shortest repr)."""
    if x is None:
        return None
    x = float(x)
    if math.isnan(x) or math.isinf(x):
        return x
    q = Decimal(1).scaleb(-d)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _fill(x: float, default: float) -> float:
    """The gate's metric-default law: an unmeasurable metric (NaN — the
    Arrow float encoding of 'no evidence') reads as its default, the
    same fallback the decision twin's ``fillna`` applies.  (Until the
    session-11 review the issues twin replicated Spark's accidental
    NaN-greatest compare instead; the engine now applies the default
    for NaN too, so decision and issue laws agree.)"""
    return default if math.isnan(x) else x


def _tokens(text) -> list[str]:
    """Twin of ``dedup.tokens_col``: trim+lower then split on \\s+."""
    if text is None:
        return []
    t = text.strip().lower()
    if not t:
        return []
    return _WS.split(t)


def _shingles(toks: list[str], k: int) -> list[str]:
    """Twin of ``dedup._shingles``."""
    n = len(toks)
    if n == 0:
        return []
    if n < k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(n - k + 1)]


def _fold_dot(a, b) -> float:
    """Sequential left fold of sum(a_i * b_i) in float64 — the exact
    associativity of ``similarity.dot64`` (zip_with + aggregate)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


# ------------------------------------------------------------------ sources


def _read_documents(sf_dir: str) -> list[tuple[int, str | None]]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _read_embeddings(sf_dir: str) -> list[tuple[int, list[float]]]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    # elements may be float32 on disk; Spark casts per element to double —
    # exact widening, replicated via float() below in the folds
    return list(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )


# ------------------------------------------------------------------ minhash


def _minhash_sigs(docs, num_hashes=64, shingle_k=3) -> dict[int, list[int]]:
    """Twin of ``dedup.minhash_signatures``: per-doc 64-long minhash
    signatures via the from-spec XXH64 (shingle-less docs absent)."""
    sigs: dict[int, list[int]] = {}
    for doc_id, text in docs:
        toks = _tokens(text)
        sh = set(_shingles(toks, shingle_k))
        if not sh:
            continue  # no shingle rows -> doc absent from the signature agg
        bases = [xxh64_string(s, 42) for s in sh]
        sigs[doc_id] = [
            min(xxh64_int(i, b) for b in bases) for i in range(num_hashes)
        ]
    return sigs


def _band_keys(sig, bands, rows_per_band) -> list[tuple[int, int]]:
    """Twin of the banding key: xxhash64 fold over each signature slice."""
    out = []
    for b in range(bands):
        h = 42
        for v in sig[b * rows_per_band : (b + 1) * rows_per_band]:
            h = xxh64_long(v, h)
        out.append((b, h))
    return out


def _minhash_candidates(docs, num_hashes=64, bands=16, shingle_k=3,
                        max_bucket_size=64) -> set[tuple[int, int]]:
    """Twin of the candidate half of ``dedup.minhash_lsh_pairs`` (and of
    ``lsh_candidates_multi`` per config): unverified banded-bucket pairs."""
    rows_per_band = num_hashes // bands
    sigs = _minhash_sigs(docs, num_hashes, shingle_k)
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for k in _band_keys(sig, bands, rows_per_band):
            buckets.setdefault(k, []).append(doc_id)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if 1 < len(members) <= max_bucket_size:
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand.add((ms[i], ms[j]))
    return cand


def _minhash_verified_pairs(docs, num_hashes=64, bands=16, shingle_k=3,
                            verify_threshold=0.5, max_bucket_size=64,
                            ) -> list[tuple[int, int, float]]:
    """Twin of ``dedup.minhash_lsh_pairs``: verified (id_a, id_b, jaccard)
    with id_a < id_b, sorted."""
    tokset: dict[int, set] = {}
    for doc_id, text in docs:
        tokset[doc_id] = set(_tokens(text))
    cand = _minhash_candidates(docs, num_hashes, bands, shingle_k,
                               max_bucket_size)
    pairs = []
    for a, b in sorted(cand):
        ta, tb = tokset[a], tokset[b]
        union = len(ta | tb)
        jac = (len(ta & tb) / union) if union > 0 else 0.0
        if jac >= verify_threshold:
            pairs.append((a, b, jac))
    return pairs


def _lsh_incremental_expected(
    docs, num_hashes=64, bands=16, shingle_k=3, agree_threshold=0.5,
    max_bucket_size=64,
) -> dict:
    """Twin of ``dedup.lsh_probe_index`` over the even/odd corpus split:
    index = even doc_ids, increment = odd.  Signatures/banding via the
    from-spec XXH64 twins; index-side bucket guard; signature-agreement
    verify with the exact integer threshold."""
    import math

    rows_per_band = num_hashes // bands
    agree_min = math.ceil(agree_threshold * num_hashes)
    sigs = _minhash_sigs(docs, num_hashes, shingle_k)
    idx_ids = {d for d, _ in docs if d % 2 == 0 and d in sigs}
    new_ids = {d for d, _ in docs if d % 2 == 1 and d in sigs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d in idx_ids:
        for k in _band_keys(sigs[d], bands, rows_per_band):
            buckets.setdefault(k, []).append(d)
    cand: set[tuple[int, int]] = set()
    for d in new_ids:
        for k in _band_keys(sigs[d], bands, rows_per_band):
            members = buckets.get(k, ())
            if len(members) <= max_bucket_size:
                for m in members:
                    if m != d:
                        cand.add((d, m))
    rows: dict[tuple[int, int], tuple[int, float]] = {}
    for new, old in sorted(cand):
        n_agree = sum(
            1 for a, b in zip(sigs[new], sigs[old]) if a == b)
        if n_agree >= agree_min:
            rows[(new, old)] = (
                n_agree, spark_round(n_agree / float(num_hashes), 6))
    # exact-digest law (engine: fp equi-join): identical non-NULL texts
    # across the split pair at (num_hashes, 1.0) regardless of bucket
    # heat or shingleability — grouping on the text itself
    by_text: dict[str, list[int]] = {}
    for d, text in docs:
        if text is not None:
            by_text.setdefault(text, []).append(d)
    for members in by_text.values():
        for new in members:
            if new % 2 != 1:
                continue
            for old in members:
                if old % 2 == 0 and old != new:
                    rows[(new, old)] = (num_hashes, 1.0)
    out = {"new_id": [], "index_id": [], "n_agree": [],
           "est_jaccard_r": []}
    for (new, old) in sorted(rows):
        n_agree, est = rows[(new, old)]
        out["new_id"].append(new)
        out["index_id"].append(old)
        out["n_agree"].append(n_agree)
        out["est_jaccard_r"].append(est)
    return out


def _minhash_lsh_agg(docs, **kw) -> dict:
    """``minhash_lsh_pairs`` + the (n_pairs, min, max) agg."""
    jacs = [j for _, _, j in _minhash_verified_pairs(docs, **kw)]
    if not jacs:
        return {"n_pairs": [0], "min_jaccard": [None], "max_jaccard": [None]}
    return {
        "n_pairs": [len(jacs)],
        "min_jaccard": [spark_round(min(jacs), 6)],
        "max_jaccard": [spark_round(max(jacs), 6)],
    }


# ------------------------------------------------------- duplicate clusters


def _uf_min_components(pairs) -> dict[int, int]:
    """Union-find closure of the pair graph; node -> min id in component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _exact_text_edges(docs) -> list[tuple[int, int]]:
    """Engine ``dedup.exact_text_pairs`` restated: identical non-NULL
    texts link rep→member (grouping on the text itself — the md5 digest
    is only a grouping key)."""
    fams: dict[str, list[int]] = {}
    for did, text in docs:
        if text is not None:
            fams.setdefault(text, []).append(did)
    return [
        (min(members), m)
        for members in fams.values() if len(members) > 1
        for m in members if m != min(members)
    ]


def _dedup_clusters_expected(docs) -> dict:
    """Twin of the ``dedup_clusters`` query: exact-text edges ∪ the
    minhash pair graph, closed via an independent union-find."""
    pairs = _exact_text_edges(docs) + [
        (a, b) for a, b, _ in _minhash_verified_pairs(docs)]
    comp = _uf_min_components(pairs)
    sizes: dict[int, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    out = {"doc_id": [], "component": [], "cluster_size": []}
    for n in sorted(comp, key=lambda n: (comp[n], n)):
        out["doc_id"].append(n)
        out["component"].append(comp[n])
        out["cluster_size"].append(sizes[comp[n]])
    return out


def _cluster_split_expected(sf_dir: str) -> dict:
    """Twin of the ``cluster_split`` query: union-find closure of the
    minhash pair graph, split decided by hashlib-md5 of the component
    representative against the same 128-bit threshold literal Spark uses
    (``sampling.fraction_threshold_hex``), grouped per (lang, split)."""
    import hashlib
    import os as _os

    import pyarrow.parquet as pq

    from .operators.sampling import fraction_threshold_hex

    docs = _read_documents(sf_dir)
    pairs = _exact_text_edges(docs) + [
        (a, b) for a, b, _ in _minhash_verified_pairs(docs)]
    comp = _uf_min_components(pairs)
    thresh = fraction_threshold_hex(0.2)
    t = pq.read_table(
        _os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    groups: dict[tuple[str, str], list[int]] = {}
    for did, lang, nch in zip(
        t.column("doc_id").to_pylist(),
        t.column("lang").to_pylist(),
        t.column("n_chars").to_pylist(),
    ):
        rep = str(comp.get(did, did))
        h = hashlib.md5(f"{rep}:11".encode()).hexdigest()
        split = "val" if h < thresh else "train"
        g = groups.setdefault((lang, split), [0, 0])
        g[0] += 1
        g[1] += int(nch)
    out = {"lang": [], "split": [], "n_docs": [], "total_chars": []}
    for lang, split in sorted(groups):
        out["lang"].append(lang)
        out["split"].append(split)
        out["n_docs"].append(groups[(lang, split)][0])
        out["total_chars"].append(groups[(lang, split)][1])
    return out


def _dedup_resolve_expected(docs) -> dict:
    """Twin of ``dedup_resolve``: longest-text survivor per cluster
    (exact-text edges ∪ minhash pairs), ties to the smallest doc_id."""
    pairs = _exact_text_edges(docs) + [
        (a, b) for a, b, _ in _minhash_verified_pairs(docs)]
    comp = _uf_min_components(pairs)
    text_len = {d: len(t) if t is not None else 0 for d, t in docs}
    by_comp: dict[int, list[int]] = {}
    for n, c in comp.items():
        by_comp.setdefault(c, []).append(n)
    out = {"doc_id": [], "component": [], "cluster_size": [], "keep": []}
    for c in sorted(by_comp):
        members = by_comp[c]
        winner = min(members, key=lambda n: (-text_len[n], n))
        for n in sorted(members):
            out["doc_id"].append(n)
            out["component"].append(c)
            out["cluster_size"].append(len(members))
            out["keep"].append(n == winner)
    return out


# ------------------------------------------------------------------ winnowing


def _winnow_fps_one(text, shingle_k=5, window=4) -> set[int]:
    """Twin of ``dedup.winnow_fingerprints`` for one document."""
    sh = _shingles(_tokens(text), shingle_k)
    if not sh:
        return set()
    hs = [xxh64_string(s, 42) for s in sh]
    m = len(hs)
    if m < window:
        return {min(hs)}
    return {min(hs[p - window + 1 : p + 1]) for p in range(window - 1, m)}


def _winnow_stats(docs, shingle_k=5, window=4) -> dict:
    n_docs = 0
    total = 0
    all_fps: set[int] = set()
    for _doc_id, text in docs:
        fps = _winnow_fps_one(text, shingle_k, window)
        if not fps:
            continue
        n_docs += 1
        total += len(fps)
        all_fps |= fps
    return {
        "n_docs": [n_docs],
        "total_fps": [total],
        "distinct_fps": [len(all_fps)],
    }


# ------------------------------------------------------------------ simhash


def _simhash_agg(docs, max_hamming=3, max_bucket_size=256) -> dict:
    """Twin of ``dedup.simhash64`` + ``simhash_near_pairs`` + hamming agg."""
    sigs: dict[int, int] = {}
    for doc_id, text in docs:
        toks = set(_tokens(text))
        if not toks:
            continue  # no token rows -> absent from the vote aggregate
        votes = [0] * 64
        for tok in toks:
            h = xxh64_string(tok, 42)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        sig = 0
        for i in range(64):
            if votes[i] > 0:
                sig |= 1 << i
        if sig >= 1 << 63:
            sig -= 1 << 64  # to signed, matching the LongType column
        sigs[doc_id] = sig
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for ci in range(4):
            cv = (sig >> (ci * 16)) & 0xFFFF
            buckets.setdefault((ci, cv), []).append(doc_id)
    pairs: set[tuple[int, int, int]] = set()
    for members in buckets.values():
        if 1 < len(members) <= max_bucket_size:
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    a, b = ms[i], ms[j]
                    ham = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
                    if ham <= max_hamming:
                        pairs.add((a, b, ham))
    counts: dict[int, int] = {}
    for _a, _b, ham in pairs:
        counts[ham] = counts.get(ham, 0) + 1
    hams = sorted(counts)
    return {"hamming": hams, "n_pairs": [counts[h] for h in hams]}


# ------------------------------------------------------------------ SRP ANN


def _ann_lsh_topk(vecs, k=3, bits=8, seed=7, round_to=6) -> dict:
    """Twin of ``similarity.hyperplane_lsh_topk`` (queries = vec_id < 10)."""
    dim = len(vecs[0][1])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))

    def bucket(v) -> int:
        out = 0
        for i in range(bits):
            proj = _fold_dot(v, planes[i])
            if proj >= 0:
                out |= 1 << i
        return out

    norms = {vid: math.sqrt(_fold_dot(v, v)) for vid, v in vecs}
    bkt = {vid: bucket(v) for vid, v in vecs}
    vmap = dict(vecs)
    out = {"q_id": [], "rank": [], "n_id": [], "cosine": []}
    for q_id, qv in vecs:
        if q_id >= 10:
            continue
        scored = []
        for n_id, cv in vecs:
            if n_id == q_id or bkt[n_id] != bkt[q_id]:
                continue
            c = _fold_dot(qv, cv) / (norms[q_id] * norms[n_id])
            scored.append((c, n_id))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (c, n_id) in enumerate(scored[:k], start=1):
            out["q_id"].append(q_id)
            out["rank"].append(rank)
            out["n_id"].append(n_id)
            out["cosine"].append(spark_round(c, round_to))
    _ = vmap
    return out


# ------------------------------------------------------------------ IVF


def _ivf_topk_expected(vecs, n_lists=16, iters=10, seed=7, sample=2048,
                       k=3, nprobe=2) -> dict:
    """Twin of ``similarity.fit_ivf_centroids`` + ``ivf_topk`` (queries =
    vec_id < 10) — identical numpy ops in the same order, so the learned
    centroids and list assignments match the pandas-UDF path."""
    vmap = {vid: np.asarray(v, dtype=np.float64) for vid, v in vecs}
    train_ids = sorted(vmap)[:sample]
    x = np.array([vmap[i] for i in train_ids], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=n_lists, replace=False)]
    for _i in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(n_lists):
            members = x[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
        cent = cent / np.maximum(
            np.linalg.norm(cent, axis=1, keepdims=True), 1e-12
        )
    ids = sorted(vmap)
    m = np.array([vmap[i] for i in ids], dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sims = mn @ cent.T
    lists = {vid: int(a) for vid, a in zip(ids, np.argmax(sims, axis=1))}
    members: dict[int, list[int]] = {}
    for vid, li in lists.items():
        members.setdefault(li, []).append(vid)
    norms = {vid: math.sqrt(_fold_dot(vmap[vid], vmap[vid])) for vid in ids}
    out = {"q_id": [], "rank": [], "n_id": [], "cosine": []}
    for qi, q_id in enumerate(ids):
        if q_id >= 10:
            continue
        order = np.argsort(-sims[qi], kind="stable")[:nprobe]
        scored = []
        for li in order:
            for n_id in members.get(int(li), []):
                if n_id == q_id:
                    continue
                c = _fold_dot(vmap[q_id], vmap[n_id]) / (
                    norms[q_id] * norms[n_id]
                )
                scored.append((c, n_id))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (c, n_id) in enumerate(scored[:k], start=1):
            out["q_id"].append(q_id)
            out["rank"].append(rank)
            out["n_id"].append(n_id)
            out["cosine"].append(spark_round(c, 6))
    return out


def _exact_topk_pairs(vecs, k=3) -> set:
    """Exact cosine top-k (q,n) pair set for queries vec_id < 10 — the
    ground truth the recall curve is measured against."""
    norms = {vid: math.sqrt(_fold_dot(v, v)) for vid, v in vecs}
    out = set()
    for q_id, qv in vecs:
        if q_id >= 10:
            continue
        scored = []
        for n_id, cv in vecs:
            if n_id == q_id:
                continue
            c = _fold_dot(qv, cv) / (norms[q_id] * norms[n_id])
            scored.append((c, n_id))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for _c, n_id in scored[:k]:
            out.add((q_id, n_id))
    return out


#: the recall-curve parameter points, shared by the Spark query and the twin
ANN_RECALL_POINTS = (
    ("ivf_nprobe2", "ivf", {"nprobe": 2}),
    ("ivf_nprobe4", "ivf", {"nprobe": 4}),
    ("lsh_bits4", "lsh", {"bits": 4}),
    ("lsh_bits8", "lsh", {"bits": 8}),
)


def _ann_recall_expected(vecs, k=3) -> dict:
    """recall@k CURVE of the LSH and IVF approximations vs exact top-k (two
    parameter points per method), computed entirely by the pure-Python
    twins — the driver then hash-checks the ACCURACY TRADE-OFF itself, not
    just each method's raw output.  On near-orthogonal random embeddings the
    curve is steep (fine buckets recall ~0), which is exactly the behaviour
    the oracle should pin."""
    exact = _exact_topk_pairs(vecs, k=k)
    out = {"method": [], "hits": [], "total": [], "recall_r": []}
    for method, kind, params in sorted(ANN_RECALL_POINTS):
        if kind == "ivf":
            res = _ivf_topk_expected(vecs, k=k, **params)
        else:
            res = _ann_lsh_topk(vecs, k=k, **params)
        pairs = set(zip(res["q_id"], res["n_id"]))
        hits = len(pairs & exact)
        out["method"].append(method)
        out["hits"].append(hits)
        out["total"].append(len(exact))
        out["recall_r"].append(
            spark_round(hits / len(exact), 6) if exact else 0.0
        )
    return out


def _ann_pq_recall_expected(vecs, k=3) -> dict:
    """recall@k of the PQ path vs exact top-k, both by pure-Python
    replay — extends the ann_recall discipline to the compressed-domain
    method (the accuracy trade-off is driver-hash-checked, not just
    test-asserted)."""
    exact = _exact_topk_pairs(vecs, k=k)
    res = _pq_topk_expected(vecs, k=k)
    pairs = set(zip(res["q_id"], res["n_id"]))
    hits = len(pairs & exact)
    return {
        "method": ["pq_m16_k256"],
        "hits": [hits],
        "total": [len(exact)],
        "recall_r": [spark_round(hits / len(exact), 6) if exact else 0.0],
    }


# ------------------------------------------ blocked embedding near-dup


def _blocked_pairs(vecs, bits=6, seed=11, threshold=0.3):
    """SRP-bucketed exact-cosine near-dup pairs (id_a, id_b, cosine),
    id_a < id_b — the shared pair twin behind the blocked aggregate and
    the semantic-prune closure."""
    dim = len(vecs[0][1])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))

    def bucket(v) -> int:
        out = 0
        for i in range(bits):
            if _fold_dot(v, planes[i]) >= 0:
                out |= 1 << i
        return out

    norms = {vid: math.sqrt(_fold_dot(v, v)) for vid, v in vecs}
    buckets: dict[int, list[int]] = {}
    vmap = dict(vecs)
    for vid, v in vecs:
        buckets.setdefault(bucket(v), []).append(vid)
    pairs = []
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                c = _fold_dot(vmap[a], vmap[b]) / (norms[a] * norms[b])
                if c >= threshold:
                    pairs.append((a, b, c))
    return pairs


def _near_dup_blocked_agg(vecs, bits=6, seed=11, threshold=0.3) -> dict:
    """Twin of SRP-bucketed ``similarity.cosine_near_pairs`` (the scale
    path: all-pairs confined to each hyperplane bucket) + the
    (n_pairs, min, max) aggregate."""
    cos = [c for _, _, c in _blocked_pairs(vecs, bits, seed, threshold)]
    if not cos:
        return {"n_pairs": [0], "min_cosine": [None], "max_cosine": [None]}
    return {
        "n_pairs": [len(cos)],
        "min_cosine": [spark_round(min(cos), 6)],
        "max_cosine": [spark_round(max(cos), 6)],
    }


def _semantic_prune_expected(sf_dir: str, bits=6, seed=11, threshold=0.3) -> dict:
    """Twin of ``similarity.semantic_prune``: the shared blocked-pair twin
    closed by the independent union-find; keep = (id == component)."""
    vecs = _read_embeddings(sf_dir)
    pairs = [(a, b) for a, b, _ in _blocked_pairs(vecs, bits, seed, threshold)]
    comp = _uf_min_components(pairs)
    sizes: dict[int, int] = {}
    for vid, _ in vecs:
        c = comp.get(vid, vid)
        sizes[c] = sizes.get(c, 0) + 1
    out = {"vec_id": [], "component": [], "cluster_size": [], "keep": []}
    for vid, _ in sorted(vecs):
        c = comp.get(vid, vid)
        out["vec_id"].append(vid)
        out["component"].append(c)
        out["cluster_size"].append(sizes[c])
        out["keep"].append(vid == c)
    return out


# ------------------------------------------------------------------ clips


def _clips_oracle_frame(n: int, seed: int):
    from .synth import generate_clips, oracle_gate

    return oracle_gate(generate_clips(n, seed=seed))


def _assert_off_rounding_boundary(values, d: int, tol: float = 1e-9) -> None:
    """Langid/ppl sums are batch-composition-stable only to ~1e-14 (numpy
    reduceat SIMD association), and the gate hash compares conf rounded to
    ``d`` dp against these committed artifacts.  Guard at GENERATION time
    that no raw value sits within ``tol`` of a half-step rounding boundary,
    so a corpus change that would make the hash gate flake between Spark
    batch layouts fails loudly here instead (ADVICE r2)."""
    step = 10.0 ** (-d)
    for v in values:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        frac = math.remainder(float(v) / step - 0.5, 1.0)
        if abs(frac) < tol / step:
            raise AssertionError(
                f"expected-value {v!r} is within {tol} of a {d}dp rounding "
                "boundary; the hash gate would depend on last-ulp batch "
                "composition — perturb the corpus seed/version"
            )


def _clips_gate_expected(n=1200, seed=42) -> dict:
    pdf = _clips_oracle_frame(n, seed)
    _assert_off_rounding_boundary(list(pdf["lang_conf"]), 4)
    rms_r = [
        float("nan") if (v is None or (isinstance(v, float) and math.isnan(v)))
        else spark_round(v, 2)
        for v in pdf["rms_db"]
    ]
    return {
        "clip_id": list(pdf["clip_id"]),
        "decision": list(pdf["decision"]),
        "lang_pred": list(pdf["lang_pred"]),
        "lang_conf_r": [spark_round(v, 4) for v in pdf["lang_conf"]],
        "rms_db_r": rms_r,
        "token_count": [int(v) for v in pdf["token_count"]],
        "scrubbed": list(pdf["scrubbed"]),
    }


def _clips_gate_rollup_expected(n=1200, seed=42) -> dict:
    pdf = _clips_oracle_frame(n, seed)
    groups: dict[tuple[str, str], list] = {}
    for _, r in pdf.iterrows():
        key = (r["lang_pred"], r["codec"])
        g = groups.setdefault(key, [0, 0, 0])
        g[0] += 1
        g[1] += 1 if r["decision"] == "keep" else 0
        g[2] += int(r["dur_ms"])  # exact integer sum -> deterministic double
    out = {"lang_pred": [], "codec": [], "n_clips": [], "n_keep": [],
           "keep_rate_r": [], "audio_seconds_r": []}
    for (lang, codec) in sorted(groups):
        n_clips, n_keep, dur_ms = groups[(lang, codec)]
        out["lang_pred"].append(lang)
        out["codec"].append(codec)
        out["n_clips"].append(n_clips)
        out["n_keep"].append(n_keep)
        out["keep_rate_r"].append(spark_round(n_keep / n_clips, 4))
        out["audio_seconds_r"].append(spark_round(dur_ms / 1000.0, 1))
    return out


def _gate_bias_expected(n=1200, seed=42) -> dict:
    """Wilson keep-rate disparity by codec over the gate decisions — the
    pure-Python twin of ``operators/bias.keep_rate_bias``.  Every double
    operation mirrors the Spark expression tree's association exactly
    (IEEE div/mul/sqrt are correctly rounded in both runtimes), so the
    values match bit-for-bit BEFORE the display rounding."""
    pdf = _clips_oracle_frame(n, seed)
    groups: dict[str, list[int]] = {}
    for _, r in pdf.iterrows():
        g = groups.setdefault(str(r["codec"]), [0, 0])
        g[0] += 1
        g[1] += 1 if r["decision"] == "keep" else 0
    tot_n = sum(v[0] for v in groups.values())
    tot_k = sum(v[1] for v in groups.values())
    z = 1.96
    z2 = z * z
    cols = (
        "codec", "n", "n_keep", "keep_rate_r", "wilson_low_r",
        "wilson_up_r", "rest_rate_r", "impact_ratio_r", "biased_low",
    )
    out: dict[str, list] = {c: [] for c in cols}
    raw: list[float] = []
    for codec in sorted(groups):
        cn, ck = groups[codec]
        nd = float(cn)
        p = float(ck) / nd
        denom = 1.0 + z2 / nd
        center = p + z2 / (2.0 * nd)
        half = z * math.sqrt(p * (1.0 - p) / nd + z2 / ((4.0 * nd) * nd))
        low = (center - half) / denom
        up = (center + half) / denom
        rest_n = float(tot_n - cn)
        rest_k = float(tot_k - ck)
        has_rest = tot_n > cn
        rest_rate = (rest_k / rest_n) if has_rest else None
        impact = (p / (rest_k / rest_n)) if has_rest and rest_k > 0 else None
        biased = bool(has_rest and (up * rest_n) * 5.0 < rest_k * 4.0)
        def _r6(v):
            # Spark's round goes through BigDecimal, which has no -0.0;
            # a p=0 group makes center-half ≈ -1e-19 → keep signs equal
            if v is None:
                return None
            x = spark_round(v, 6)
            return 0.0 if x == 0.0 else x

        out["codec"].append(codec)
        out["n"].append(cn)
        out["n_keep"].append(ck)
        out["keep_rate_r"].append(_r6(p))
        out["wilson_low_r"].append(_r6(low))
        out["wilson_up_r"].append(_r6(up))
        out["rest_rate_r"].append(_r6(rest_rate))
        out["impact_ratio_r"].append(_r6(impact))
        out["biased_low"].append(biased)
        raw.extend(
            v for v in (p, low, up, rest_rate, impact) if v is not None
        )
    _assert_off_rounding_boundary(raw, 6)
    return out


def _clips_row_flags(n=1200, seed=42) -> list[dict[str, bool]]:
    """Per-row twin of ``pipeline.rule_flags`` (Spark NaN semantics)."""
    from .pipeline import DROP_RULES
    from .synth import ALLOWED_SR, GateThresholds

    th = GateThresholds
    pdf = _clips_oracle_frame(n, seed)

    def f(v) -> float:
        return float("nan") if v is None else float(v)

    rows: list[dict[str, bool]] = []
    for _, r in pdf.iterrows():
        sr = int(r["sr_hz"])
        dur_ms = int(r["dur_ms"])
        n_samples = float(int(r["n_samples"]))
        actual_ms = n_samples * 1000.0 / (float(sr) if sr > 0 else 1.0)
        mismatch = (
            abs(actual_ms - float(dur_ms)) / max(float(dur_ms), 1.0)
            if dur_ms > 0
            else 1.0
        )
        flags = {
            "decode_failed": not bool(r["decode_ok"]),
            "bad_sample_rate": sr not in ALLOWED_SR,
            "bad_duration": dur_ms <= 0,
            "duration_mismatch": mismatch > th.DUR_MISMATCH_FRAC,
            "mostly_silence": _fill(f(r["silence_frac"]), 1.0)
            > th.SILENCE_MAX,
            "clipping": _fill(f(r["clip_frac"]), 0.0) > th.CLIP_MAX,
            "too_quiet": _fill(f(r["rms_db"]), -120.0) < th.RMS_MIN_DB,
            "empty_transcript": int(r["token_count"]) == 0,
            "low_lang_confidence": f(r["lang_conf"]) < th.LANG_CONF_MIN,
            "high_perplexity": f(r["ppl"]) > th.PPL_MAX,
            "repetitive": f(r["rep_ratio"]) > th.REP_MAX,
            "length_ratio": (f(r["len_ratio"]) < th.LEN_RATIO_MIN)
            or (f(r["len_ratio"]) > th.LEN_RATIO_MAX),
            "charclass": f(r["charclass_frac"]) > th.CHARCLASS_MAX,
            "digit_flood": f(r["digit_frac"]) > th.DIGIT_MAX,
        }
        assert set(flags) == set(DROP_RULES)
        rows.append(flags)
    return rows


def _clips_funnel_expected(n=1200, seed=42) -> dict:
    """Twin of ``pipeline.clips_funnel``: the per-row flag twin grouped by
    codec with cumulative stage conjunctions (stage order = FUNNEL_STAGES
    insertion order; final column must equal the gate keep count)."""
    from .pipeline import FUNNEL_STAGES

    pdf = _clips_oracle_frame(n, seed)
    rows = _clips_row_flags(n, seed)
    stages = list(FUNNEL_STAGES.items())
    groups: dict[str, list[int]] = {}
    keep_check = 0
    for (_, r), flags in zip(pdf.iterrows(), rows):
        g = groups.setdefault(r["codec"], [0] * (1 + len(stages)))
        g[0] += 1
        ok = True
        for i, (_stage, names) in enumerate(stages, start=1):
            ok = ok and not any(flags[k] for k in names)
            g[i] += 1 if ok else 0
        keep_check += 1 if r["decision"] == "keep" else 0
    cols = ["n_raw", "n_decode_ok", "n_signal_ok", "n_transcript_ok",
            "n_keep"]
    out: dict[str, list] = {"codec": []}
    for c in cols:
        out[c] = []
    for codec in sorted(groups):
        out["codec"].append(codec)
        for i, c in enumerate(cols):
            out[c].append(groups[codec][i])
    # internal law: the funnel adds no predicates — its tail IS the gate
    assert sum(out["n_keep"]) == keep_check
    return out


def _clips_gate_issues_expected(n=1200, seed=42) -> dict:
    """Twin of ``pipeline.gate_issues`` (rule_flags + fused-agg relation)."""
    from .pipeline import DROP_RULES

    rows = _clips_row_flags(n, seed)
    counts = {name: sum(r[name] for r in rows) for name in DROP_RULES}
    total = len(rows)
    out = {"table": [], "column": [], "issue_type": [], "count": [],
           "total": [], "percent": [], "severity": [], "description": []}
    for name, sev in DROP_RULES.items():
        c = counts[name]
        if c == 0:
            continue  # compile_rules default: emit only count > 0
        out["table"].append("clips")
        out["column"].append(None)
        out["issue_type"].append(name)
        out["count"].append(c)
        out["total"].append(total)
        out["percent"].append(c * 100.0 / total)
        out["severity"].append(sev)
        out["description"].append(f"gate rule {name} violated")
    return out


def _v2_row_flags(n=400, seed=42) -> tuple[list, list[dict]]:
    """Per-clip DROP_RULES_V2 flag dicts (clip_ids, flags): v1 flags from
    the pandas reference pipeline (same per-row twin as clips_gate*),
    extended audio flags from the SHARED kernels (each hash-verified by
    its own differential query — audio_snr, audio_loudness, audio_dropout,
    audio_vad, audio_bandwidth), with the NULL→False coalesce semantics
    made explicit.  Shared by the gate-v2 and quality-score twins."""
    import re as _re

    from .functions.audio import _decode_i16
    from .functions.dropout import dropout_stats_i16
    from .functions.loudness import clip_loudness
    from .functions.snr import speech_snr
    from .functions.spectral import bandwidth_stats
    from .functions.vad import vad_stats
    from .operators.audio_audit import LUFS_MAX, LUFS_MIN, SNR_MIN_DB
    from .operators.audio_bandwidth import (
        MAX_UPSAMPLED_HF_DB,
        MIN_MEASURABLE_RMS,
    )
    from .operators.audio_dropout import DC_DEN, DC_NUM, STUCK_MIN_DEFAULT
    from .pipeline import (
        DROP_RULES_V2,
        SPEAK_MAX_CPS,
        SPEAK_MIN_CPS,
        SPEAK_MIN_SPEECH_MS,
    )
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    v1_rows = _clips_row_flags(n, seed)
    clip_ids: list = []
    flag_rows: list[dict] = []
    for (_, r), v1 in zip(pdf.iterrows(), v1_rows):
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        sr = int(r["sr_hz"]) if r["sr_hz"] else 0
        x = q.astype(np.float32) / np.float32(32767.0)
        vd = vad_stats(x, sr)
        sn = speech_snr(x, sr)
        lf = clip_loudness(x, sr)
        dp = dropout_stats_i16(q, sr)
        bw = bandwidth_stats(x, sr)
        n_samples_v1 = int(q.size) if ok else 0
        nws = len(_re.sub(r"[ \t\n\r]+", "", r["transcript"] or ""))
        speech_ms = int(vd["speech_ms"])
        cps = (nws * 1000.0 / speech_ms) if speech_ms > 0 else None
        def _mdef(v, default):
            # the v2 no-evidence law, restated independently of the
            # engine's Column tree: None AND NaN both take the metric's
            # non-firing default (NOT Spark's NaN-greatest compare — a
            # NaN-emitting kernel must hit this law on both sides)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return float(default)
            return float(v)

        flags = dict(v1)
        flags["dropout"] = dp["n_dropouts"] > 0
        flags["stuck_samples"] = dp["max_const_run"] >= STUCK_MIN_DEFAULT
        flags["low_snr"] = _mdef(sn["snr_db"], SNR_MIN_DB) < SNR_MIN_DB
        _lufs = _mdef(lf["lufs_i"], LUFS_MIN)
        flags["loudness_range"] = _lufs < LUFS_MIN or _lufs > LUFS_MAX
        flags["dc_offset"] = (
            abs(dp["dc_sum"]) * DC_DEN > DC_NUM * n_samples_v1 * 32768
        )
        flags["upsampled"] = (
            _mdef(bw["rms"], 0.0) >= MIN_MEASURABLE_RMS
            and _mdef(bw["hf_db"], MAX_UPSAMPLED_HF_DB) < MAX_UPSAMPLED_HF_DB
        )
        flags["speaking_rate"] = (
            speech_ms >= SPEAK_MIN_SPEECH_MS
            and nws > 0
            and cps is not None
            and (cps < SPEAK_MIN_CPS or cps > SPEAK_MAX_CPS)
        )
        assert set(flags) == set(DROP_RULES_V2)
        clip_ids.append(r["clip_id"])
        flag_rows.append(flags)
    return clip_ids, flag_rows


def _clips_gate_v2_expected(n=400, seed=42) -> dict:
    """Twin of ``pipeline.gate_v2``: explicit Python ladder in
    DROP_RULES_V2 order vs the Spark when-chain, over the shared
    ``_v2_row_flags`` flag dicts.  The differential surface is the flag
    ladder composition, the NULL→False coalesce semantics, and the
    one-decode wide featurization."""
    from .pipeline import DROP_RULES_V2

    clip_ids, flag_rows = _v2_row_flags(n, seed)
    out = {"clip_id": [], "decision": [], "decision_reason": []}
    for cid, flags in zip(clip_ids, flag_rows):
        reason = next((name for name in DROP_RULES_V2 if flags[name]), None)
        out["clip_id"].append(cid)
        out["decision"].append("drop" if reason is not None else "keep")
        out["decision_reason"].append(reason)
    return out


def _audio_quality_score_expected(n=400, seed=42) -> dict:
    """Twin of ``operators.audio_score.clip_quality_score``: the exact
    deduction law (critical 25 / warning 10, decode_failed → 0, clamp at
    0, grade buckets) replayed in plain Python over the shared v2 flag
    dicts."""
    from .operators.audio_score import (
        CRIT_WEIGHT,
        GRADE_BOUNDS,
        WARN_WEIGHT,
    )
    from .pipeline import DROP_RULES_V2

    clip_ids, flag_rows = _v2_row_flags(n, seed)
    out = {"clip_id": [], "q_score": [], "grade": []}
    for cid, flags in zip(clip_ids, flag_rows):
        if flags["decode_failed"]:
            score = 0
        else:
            ded = sum(
                (CRIT_WEIGHT if sev == "critical" else WARN_WEIGHT)
                for name, sev in DROP_RULES_V2.items()
                if flags[name]
            )
            score = max(0, 100 - ded)
        grade = "F"
        for bound, g in GRADE_BOUNDS:
            if score >= bound:
                grade = g
                break
        out["clip_id"].append(cid)
        out["q_score"].append(score)
        out["grade"].append(grade)
    return out


def _lsh_tuning_expected(
    sf_dir: str,
    band_configs=(8, 16, 32),
    levels=(3, 6, 12, 24),
) -> dict:
    """Twin of the lsh_tuning query: companions with every m-th token
    replaced (m sweeps the Jaccard axis), candidate sets per banding via
    the shared from-spec XXH64 bucket twin, recovery counted by exact
    (orig, orig + m·10^6) id pairs."""
    import re as _re

    raw_ws = _re.compile(r"\s+")
    docs = _read_documents(sf_dir)
    corpus = list(docs)
    inj_count = 0
    inj_ids: list[int] = []
    for doc_id, text in docs:
        if text is None or doc_id % 10 != 0 or not text.strip():
            continue
        toks = raw_ws.split(text.strip())
        if len(toks) < 40:
            continue
        inj_count += 1
        inj_ids.append(doc_id)
        for m in levels:
            nt = [
                f"zz{doc_id}x{i}" if i % m == 0 else t
                for i, t in enumerate(toks)
            ]
            corpus.append((doc_id + m * 1_000_000, " ".join(nt)))
    out = {
        "bands": [], "n_candidates": [], "n_injected": [],
        **{f"rec_m{m}": [] for m in levels},
    }
    for b in band_configs:
        cand = _minhash_candidates(corpus, bands=b)
        out["bands"].append(b)
        out["n_candidates"].append(len(cand))
        out["n_injected"].append(inj_count)
        for m in levels:
            out[f"rec_m{m}"].append(
                sum(1 for d in inj_ids if (d, d + m * 1_000_000) in cand)
            )
    return out


def _audio_hum_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_hum.hum_flags`` + the query's rounding:
    shared deterministic kernels (decode + hum_stats), explicit Python
    decision law — the differential surface is the decode dispatch, NULL
    totality, the two-signal flag, rounding, and ordering."""
    from .functions.audio import _decode_i16
    from .functions.spectral import HUM_MIN_CONTRAST, HUM_MIN_FRAC, hum_stats
    from .synth import make_audio_hum_corpus

    pdf = make_audio_hum_corpus(n, seed=seed)
    out = {
        "clip_id": [], "n_frames": [], "frac_r": [], "contrast_r": [],
        "hum_hz": [], "is_hum": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        st = hum_stats(x, r["sr_hz"])
        ok = st["hum_frac"] is not None
        flag = bool(
            ok
            and st["hum_frac"] >= HUM_MIN_FRAC
            and st["hum_contrast"] >= HUM_MIN_CONTRAST
        )
        out["clip_id"].append(r["clip_id"])
        out["n_frames"].append(int(st["n_frames"]))
        out["frac_r"].append(spark_round(st["hum_frac"], 6) if ok else None)
        out["contrast_r"].append(
            spark_round(st["hum_contrast"], 6) if ok else None
        )
        out["hum_hz"].append(st["hum_hz"] if ok else None)
        out["is_hum"].append(flag)
    return out


def _audio_reverb_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_reverb.reverb_flags`` + the query's
    rounding: the frame-energy reduction is the ONE shared kernel
    (``vad.frame_energies_db`` — bit-identical float64, so every
    comparison against SILENCE_DB / QUANT_FLOOR / step laws lands on the
    same values), while the offset scan, backward/forward segment walk,
    least squares (math.fsum + exact integer index sums vs the kernel's
    numpy dot), median, decision law, and rounding are replayed
    INDEPENDENTLY; roundings guarded off half-step boundaries and the
    raw rt60 guarded off the flag thresholds at generation time."""
    import math as _m

    from .functions.audio import SILENCE_DB, _decode_i16
    from .functions.reverb import (
        BACK_STEP_DB,
        MAX_SEG,
        MIN_DECAYS,
        MIN_DROP_DB,
        MIN_POINTS,
        QUANT_FLOOR_DB,
        REJOIN_DB,
        RT60_FLAG_MAX,
        RT60_FLAG_MIN,
    )
    from .functions.vad import frame_energies_db
    from .synth import make_audio_reverb_corpus

    pdf = make_audio_reverb_corpus(n, seed=seed)
    out = {
        "clip_id": [], "n_frames": [], "n_offsets": [], "n_decays": [],
        "decay_r": [], "rt60_r": [], "is_reverberant": [],
    }
    raw_decay: list[float] = []
    raw_rt60: list[float] = []
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
        x = q.astype(np.float32) / np.float32(32767.0)
        sr = r["sr_hz"] or 0
        if sr > 0:
            db_a, frame = frame_energies_db(
                np.asarray(x, dtype=np.float64), sr)
            db = [float(v) for v in db_a]
        else:
            db, frame = [], 1
        nf = len(db)
        n_offsets = 0
        slopes: list[float] = []
        if nf >= MIN_POINTS + 1:
            fps = float(sr) / float(frame)
            last_end = -1
            for e in range(nf - 1):
                if not (db[e] >= SILENCE_DB and db[e + 1] < SILENCE_DB):
                    continue
                n_offsets += 1
                if e <= last_end:
                    continue
                b = e
                while (b > 0 and e - b < MAX_SEG
                       and db[b - 1] >= db[b] + BACK_STEP_DB):
                    b -= 1
                j = e + 1
                run_min = db[j]
                while (j + 1 < nf and j - e < MAX_SEG
                       and db[j + 1] > QUANT_FLOOR_DB
                       and db[j + 1] <= run_min + REJOIN_DB):
                    j += 1
                    if db[j] < run_min:
                        run_min = db[j]
                seg = db[b: j + 1]
                last_end = j
                m = len(seg)
                if m >= MIN_POINTS and seg[0] - min(seg) >= MIN_DROP_DB:
                    sx = m * (m - 1) // 2
                    sxx = (m - 1) * m * (2 * m - 1) // 6
                    sy = _m.fsum(seg)
                    sxy = _m.fsum(i * v for i, v in enumerate(seg))
                    s = (m * sxy - sx * sy) / float(m * sxx - sx * sx)
                    s *= fps
                    if s < 0.0:
                        slopes.append(s)
        slopes.sort()
        k = len(slopes)
        if k:
            med = (slopes[k // 2] if k % 2
                   else 0.5 * (slopes[k // 2 - 1] + slopes[k // 2]))
            rt60 = -60.0 / med
            raw_decay.append(med)
            raw_rt60.append(rt60)
        else:
            med = rt60 = None
        flag = bool(k >= MIN_DECAYS and rt60 is not None
                    and RT60_FLAG_MIN <= rt60 <= RT60_FLAG_MAX)
        out["clip_id"].append(r["clip_id"])
        out["n_frames"].append(nf)
        out["n_offsets"].append(n_offsets)
        out["n_decays"].append(k)
        out["decay_r"].append(spark_round(med, 2))
        out["rt60_r"].append(spark_round(rt60, 3))
        out["is_reverberant"].append(flag)
    _assert_off_rounding_boundary(raw_decay, 2)
    _assert_off_rounding_boundary(raw_rt60, 3)
    for v in raw_rt60:
        assert abs(v - RT60_FLAG_MIN) > 1e-6 and abs(v - RT60_FLAG_MAX) > 1e-6, (
            "raw rt60 sits on a flag threshold; the flag would depend on "
            "last-ulp arithmetic — regenerate the corpus with another seed"
        )
    return out


def _audio_flutter_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_flutter.flutter_flags`` + the query's
    rounding: shared deterministic kernels (decode + flutter_stats over
    identical float inputs — bit-identical doubles), explicit Python
    decision law; the differential surface is the decode dispatch, NULL
    totality, the two-signal flag, rounding, and ordering."""
    from .functions.audio import _decode_i16
    from .functions.flutter import (
        DEV_FLAG_PCT,
        MOD_MIN_FRAC,
        flutter_stats,
    )
    from .synth import make_audio_flutter_corpus

    pdf = make_audio_flutter_corpus(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "n_frames": [], "n_track": [], "carrier_r": [],
        "dev_r": [], "mod_hz_r": [], "frac_r": [], "is_flutter": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
        x = q.astype(np.float64) / 32768.0
        st = flutter_stats(x, r["sr_hz"])
        flag = bool(
            st["dev_pct"] is not None
            and st["mod_frac"] is not None
            and st["dev_pct"] >= DEV_FLAG_PCT
            and st["mod_frac"] >= MOD_MIN_FRAC
        )
        out["clip_id"].append(r["clip_id"])
        out["n_frames"].append(int(st["n_frames"]))
        out["n_track"].append(int(st["n_track"]))
        out["carrier_r"].append(spark_round(st["carrier_hz"], 3))
        out["dev_r"].append(spark_round(st["dev_pct"], 5))
        out["mod_hz_r"].append(spark_round(st["mod_hz"], 3))
        out["frac_r"].append(spark_round(st["mod_frac"], 6))
        out["is_flutter"].append(flag)
    return out


def _audio_lra_expected(n=120, seed=42) -> dict:
    """Twin of ``operators.audio_lra.lra_flags``: decode + short-term
    block loudness are shared kernels (each independently verified by
    the audio_loudness query); the LRA LAW — absolute gate, fsum power
    mean (exactly-rounded, order-independent), −20 LU relative gate,
    ascending sort, integer-index percentiles, 3 LU flag — is replayed
    here as explicit Python, so a gating or index-law bug in
    ``loudness_range`` cannot hide."""
    import math as _math

    from .functions.audio import _decode_i16
    from .functions.loudness import (
        ABS_GATE_LUFS,
        LRA_MIN_BLOCKS,
        LRA_REL_GATE_LU,
        ST_BLOCK_S,
        ST_HOP_S,
        _OFFSET,
        block_loudness,
    )
    from .operators.audio_lra import OVERCOMP_LRA_MAX
    from .synth import make_audio_lra_corpus

    pdf = make_audio_lra_corpus(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "ok": [], "n_st_blocks": [], "n_lra_gated": [],
        "lra_r": [], "is_overcompressed": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        x = q.astype(np.float32) / np.float32(32767.0)
        sr = r["sr_hz"] or 0
        lj = (
            block_loudness(x, sr, block_s=ST_BLOCK_S, hop_s=ST_HOP_S)
            if (x.size and sr > 0)
            else np.zeros(0, dtype=np.float64)
        )
        abs_vals = [float(v) for v in lj if v > ABS_GATE_LUFS]
        lra = None
        k = 0
        if abs_vals:
            mean_pw = _math.fsum(
                10.0 ** ((v - _OFFSET) / 10.0) for v in abs_vals
            ) / len(abs_vals)
            rel_thr = (
                _OFFSET + 10.0 * _math.log10(mean_pw) + LRA_REL_GATE_LU
            )
            gated = sorted(v for v in abs_vals if v > rel_thr)
            k = len(gated)
            if k >= LRA_MIN_BLOCKS:
                lra = gated[(95 * (k - 1)) // 100] - gated[(10 * (k - 1)) // 100]
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_st_blocks"].append(int(lj.size))
        out["n_lra_gated"].append(k)
        out["lra_r"].append(spark_round(lra, 4))
        out["is_overcompressed"].append(
            bool(lra is not None and lra < OVERCOMP_LRA_MAX)
        )
    return out


def _audio_musicspeech_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_musicspeech.musicspeech_labels`` + the
    query's rounding: shared deterministic kernels (decode +
    music_speech_stats over identical inputs — per-clip numpy float64,
    batch-layout independent, so the doubles are bit-identical), with
    the LABEL LAW replayed as explicit Python comparisons.  The
    differential surface is the decode dispatch, evaluability totality,
    the four-way label law, rounding, and ordering."""
    from .functions.audio import _decode_i16
    from .functions.musicspeech import (
        MUSIC_STABLE_MIN,
        MUSIC_SYL_MAX,
        SPEECH_STABLE_MAX,
        SPEECH_SYL_MIN,
        music_speech_stats,
    )
    from .synth import make_audio_musicspeech_corpus

    pdf = make_audio_musicspeech_corpus(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "n_env": [], "n_tone": [], "n_active": [],
        "syl_r": [], "stable_r": [], "av_label": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
        st = music_speech_stats(q, r["sr_hz"])
        syl, stab = st["syl_frac"], st["stable_frac"]
        if syl is None or stab is None:
            label = "und"
        elif stab >= MUSIC_STABLE_MIN and syl <= MUSIC_SYL_MAX:
            label = "music"
        elif syl >= SPEECH_SYL_MIN and stab <= SPEECH_STABLE_MAX:
            label = "speech"
        else:
            label = "other"
        out["clip_id"].append(r["clip_id"])
        out["n_env"].append(int(st["n_env"]))
        out["n_tone"].append(int(st["n_tone"]))
        out["n_active"].append(int(st["n_active"]))
        out["syl_r"].append(spark_round(syl, 6))
        out["stable_r"].append(spark_round(stab, 6))
        out["av_label"].append(label)
    return out


def _audio_mel_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_mel.mel_features`` + the query's hash:
    the mel kernel is SHARED (per-clip float64, batch-layout independent
    — bit-equality of the feature BYTES is exactly the claim under
    test), decode dispatch / totality / byte layout replayed row by
    row, and the hash recomputed with the from-spec XXH64 that
    bit-matches Spark's ``xxhash64`` at seed 42 (declip pattern)."""
    from .functions.audio import _decode_i16
    from .functions.mel import N_MELS, log_mel
    from .functions.xxh64 import xxh64_bytes
    from .synth import generate_clips

    def signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "ok": [], "n_frames": [], "n_mels": [],
        "n_bytes": [], "feat_h": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        m = log_mel(q.astype(np.float64) / 32768.0, r["sr_hz"] or 0)
        payload = np.ascontiguousarray(m).tobytes()
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_frames"].append(int(m.shape[0]))
        out["n_mels"].append(N_MELS)
        out["n_bytes"].append(len(payload))
        out["feat_h"].append(signed(xxh64_bytes(payload, 42)))
    return out


def _mel_cmvn_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_cmvn.cmvn_stats``: the mel kernel is
    shared (same per-clip float64 matrices as the audio_mel twin); the
    fixed-point quantization, EXACT integer moment sums (Python
    arbitrary-precision ints standing in for Spark's DECIMAL(38,0)),
    and the fixed scalar float tree for mean/std are replayed
    operation-for-operation."""
    from .functions.audio import _decode_i16
    from .functions.mel import N_MELS, log_mel
    from .operators.audio_cmvn import CMVN_SCALE
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    S = [0] * N_MELS
    S2 = [0] * N_MELS
    n_frames = 0
    n_clips = 0
    for _, r in pdf.iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
        m = log_mel(q.astype(np.float64) / 32768.0, r["sr_hz"] or 0)
        qm = np.rint(m * CMVN_SCALE).astype(np.int64)
        n_clips += 1
        n_frames += int(m.shape[0])
        for b in range(N_MELS):
            S[b] += int(qm[:, b].sum())
            S2[b] += int((qm[:, b] * qm[:, b]).sum())
    out = {"band": [], "n_clips": [], "n_frames": [], "mean_r": [],
           "std_r": []}
    for b in range(N_MELS):
        nf = float(n_frames)
        mean = (float(S[b]) / float(CMVN_SCALE)) / nf
        ex2 = (float(S2[b]) / (float(CMVN_SCALE) * CMVN_SCALE)) / nf
        std = math.sqrt(max(ex2 - mean * mean, 0.0))
        out["band"].append(b)
        out["n_clips"].append(n_clips)
        out["n_frames"].append(n_frames)
        out["mean_r"].append(spark_round(mean, 6))
        out["std_r"].append(spark_round(std, 6))
    return out


def _crop_schedule_expected(
    n=300, seed=42, win_ms=500, crops=2, epoch=0, crop_seed=13
) -> dict:
    """Twin of ``crops.crop_schedule``: the xxhash64 chain (string →
    int → int → int via xxh64_fold, Spark's multi-arg law) and the
    pmod offset replayed per (clip, crop)."""
    from .functions.xxh64 import xxh64_fold
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    out = {"clip_id": [], "epoch": [], "crop_idx": [], "start_ms": [],
           "win_ms": []}
    for _, r in pdf.sort_values("clip_id").iterrows():
        d = r["dur_ms"]
        if d is None or (isinstance(d, float) and math.isnan(d)):
            continue
        d = int(d)
        if d < win_ms:
            continue
        for j in range(crops):
            h = xxh64_fold(
                [r["clip_id"], ("int", epoch), ("int", j),
                 ("int", crop_seed)]
            )
            out["clip_id"].append(r["clip_id"])
            out["epoch"].append(epoch)
            out["crop_idx"].append(j)
            out["start_ms"].append(h % (d - win_ms + 1))
            out["win_ms"].append(win_ms)
    return out


def _mel_cmvn_apply_expected(n=300, seed=42) -> dict:
    """Twin of ``apply_cmvn`` at PAYLOAD grade: the corpus constants
    come from the cmvn twin (same rounded published values the Spark
    path collects), normalization is the same two scalar IEEE ops per
    cell, and the bytes are hashed with the from-spec XXH64."""
    from .functions.audio import _decode_i16
    from .functions.mel import log_mel
    from .functions.xxh64 import xxh64_bytes
    from .synth import generate_clips

    def signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    stats = _mel_cmvn_expected(n, seed)
    mu = np.array(stats["mean_r"], dtype=np.float64)
    sd = np.array(stats["std_r"], dtype=np.float64)
    sd = np.where(sd > 0.0, sd, 1.0)
    pdf = generate_clips(n, seed=seed)
    out = {"clip_id": [], "n_frames": [], "n_bytes": [], "feat_h": []}
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
        m = log_mel(q.astype(np.float64) / 32768.0, r["sr_hz"] or 0)
        y = (m - mu) / sd
        payload = np.ascontiguousarray(y).tobytes()
        out["clip_id"].append(r["clip_id"])
        out["n_frames"].append(int(m.shape[0]))
        out["n_bytes"].append(len(payload))
        out["feat_h"].append(signed(xxh64_bytes(payload, 42)))
    return out


def _audio_specaugment_expected(
    n=300, seed=42, freq_mask=8, time_mask=20, n_freq=2, n_time=2
) -> dict:
    """Twin of q_audio_specaugment: mel features rebuilt with the
    shared kernel, the masking policy replayed with the same
    XXH64-seeded draw order (the draw order IS the spec), masked bytes
    hashed with the from-spec XXH64.  A generation-time assert pins a
    non-trivial mask population so a silently-dead RNG cannot
    re-materialize an unmasked table."""
    from .functions.audio import _decode_i16
    from .functions.mel import LOG_FLOOR, N_MELS, log_mel
    from .functions.xxh64 import xxh64_bytes, xxh64_string

    from .synth import generate_clips

    def signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    log_floor = float(np.log(LOG_FLOOR))
    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "ok": [], "n_frames": [], "n_mels": [],
        "n_freq_masked": [], "n_time_masked": [], "n_bytes": [],
        "feat_h": [],
    }
    total_masked = 0
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        m = log_mel(q.astype(np.float64) / 32768.0, r["sr_hz"] or 0)
        nf = int(m.shape[0])
        fm_cells = tm_cells = 0
        if ok and nf > 0:
            mm = np.ascontiguousarray(m).copy()
            rng = np.random.default_rng(
                xxh64_string(f"{r['clip_id']}:specaug", 42)
                & ((1 << 64) - 1)
            )
            for _k in range(n_freq):
                w = int(rng.integers(0, freq_mask + 1))
                if w == 0 or w >= N_MELS:
                    continue
                f0 = int(rng.integers(0, N_MELS - w + 1))
                mm[:, f0: f0 + w] = log_floor
                fm_cells += w
            for _k in range(n_time):
                w = int(rng.integers(0, time_mask + 1))
                if w == 0 or w >= nf:
                    continue
                t0 = int(rng.integers(0, nf - w + 1))
                mm[t0: t0 + w, :] = log_floor
                tm_cells += w
            payload = mm.astype("<f8").tobytes()
        else:
            payload = np.ascontiguousarray(m).tobytes()
        total_masked += fm_cells + tm_cells
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_frames"].append(nf)
        out["n_mels"].append(N_MELS)
        out["n_freq_masked"].append(fm_cells)
        out["n_time_masked"].append(tm_cells)
        out["n_bytes"].append(len(payload))
        out["feat_h"].append(signed(xxh64_bytes(payload, 42)))
    assert total_masked > 0
    return out


def _text_normalize_expected(sf_dir: str, inject_every=30) -> dict:
    """Twin of ``operators.text_normalize.normalize_stats``: injection
    replayed from the same constants, the normalization law replayed
    INDEPENDENTLY (regex character classes + ``re.sub`` newline folding
    vs the operator's per-char loop; NFC itself is the shared spec),
    counts/md5 with hashlib."""
    import hashlib
    import re
    import unicodedata

    import pyarrow.parquet as pq

    from .operators.text_normalize import NORM_INJECT

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    ctl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-]")
    mod = 4 * inject_every
    out: dict[str, list] = {k: [] for k in
                            ("doc_id", "n_in", "n_out", "n_cr", "n_ctl",
                             "nfc_changed", "changed", "norm_md5")}
    rows = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    inj = {res * inject_every: s for res, s in NORM_INJECT}
    for did, text in rows:
        s = text if text is not None else ""
        r = did % mod
        if r in inj:
            s = (text or "") + inj[r]
        s1 = re.sub("\r\n?", "\n", s)
        n_cr = len(re.findall("\r", s))
        s2 = ctl.sub("", s1)
        n_ctl = len(s1) - len(s2)
        s3 = unicodedata.normalize("NFC", s2)
        out["doc_id"].append(did)
        out["n_in"].append(len(s))
        out["n_out"].append(len(s3))
        out["n_cr"].append(n_cr)
        out["n_ctl"].append(n_ctl)
        out["nfc_changed"].append(s3 != s2)
        out["changed"].append(s3 != s)
        out["norm_md5"].append(hashlib.md5(s3.encode("utf-8")).hexdigest())
    return out


def _corpus_overlap_expected(sf_dir: str, k=256, n=3) -> dict:
    """Twin of ``operators.corpus_overlap.corpus_overlap(with_exact=
    True)`` over documents split by doc_id parity: shingling replayed
    with Java-semantics tokenization (Spark ``trim`` strips SPACES
    only; Java ``\\s`` is the ASCII class), hashing via the from-spec
    XXH64 that bit-matches Spark's ``xxhash64`` at seed 42, bottom-k /
    union-rank / estimator / exact Jaccard all replayed with plain
    Python sets and sorts."""
    import re

    import pyarrow.parquet as pq

    from .functions.xxh64 import xxh64_string

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    ws = re.compile("[ \\t\\n\\x0b\\f\\r]+")
    sets: dict[str, set[int]] = {"even": set(), "odd": set()}
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        if text is None or text.strip(" ") == "":
            continue
        toks = ws.split(text.lower().strip(" "))
        m = max(len(toks) - (n - 1), 1)
        corpus = "even" if did % 2 == 0 else "odd"
        for i in range(m):
            sh = " ".join(toks[i: i + n])
            sets[corpus].add(xxh64_string(sh, 42))
    ska = sorted(sets["even"])[:k]
    skb = sorted(sets["odd"])[:k]
    s = sorted(set(ska) | set(skb))[:k]
    sa, sb = set(ska), set(skb)
    union_k = len(s)
    inter_k = sum(1 for h in s if h in sa and h in sb)
    a_k = sum(1 for h in s if h in sa)
    b_k = sum(1 for h in s if h in sb)
    inter = len(sets["even"] & sets["odd"])
    union = len(sets["even"] | sets["odd"])
    est = inter_k / union_k
    exact = inter / union
    return {
        "ca": ["even"], "cb": ["odd"], "k": [k],
        "union_k": [union_k], "inter_k": [inter_k],
        "jaccard_est_r": [spark_round(est, 6)],
        "contain_b_in_a_r": [spark_round(inter_k / b_k, 6)],
        "contain_a_in_b_r": [spark_round(inter_k / a_k, 6)],
        "jaccard_exact_r": [spark_round(exact, 6)],
        "abs_err_r": [spark_round(
            abs(spark_round(est, 6) - spark_round(exact, 6)), 6)],
    }


def _audio_pitch_dup_expected(n=300, seed=42, max_bucket_size=64) -> dict:
    """Twin of the pitch/stretch-dup chain (clip_profiles →
    pitch_dup_pairs → pitch_dup_confirm): profile/peak/landmark/resample
    kernels are SHARED (deterministic float pipelines on identical
    inputs), while the bucketing (HALF_UP quantizer, probe fan-out,
    bucket guard, a<b dedup), the partner law, the anchored-shift
    search (fsum correlation, generation-asserted to agree with the
    kernel's numpy corr within 1e-9 AND to win by >1e-9 over the
    runner-up anchor so the argmax cannot flip between engines), the
    rational-band enumeration, and the scaled-offset landmark vote
    (independent dict accounting) are replayed INDEPENDENTLY; corr
    rounding guarded off 4dp boundaries."""
    import math as _m
    from fractions import Fraction

    from .functions.audio import _decode_i16
    from .functions.resample import resample_poly
    from .functions.spectral import (
        SPEED_B,
        SPEED_KEY_Q,
        SPEED_MAX_LOG2,
        constellation_landmarks,
        corr_at_shift,
        logf_profile,
        profile_peaks,
    )
    from .operators.audio_pitch import (
        PITCH_CONFIRM_VOTES,
        PITCH_CORR_MIN,
        PITCH_DISTINCT_MIN,
        PITCH_DUR_EQ,
        PITCH_RESAMPLE_DEN,
        PITCH_SNAP_BAND,
        PITCH_SNAP_DEN,
        PITCH_TOL,
        PITCH_TOL2,
        STRETCH_CORR_MIN,
    )
    from .operators.audio_speed import PEAK_COARSE
    from .synth import make_audio_stretch_corpus

    pdf = make_audio_stretch_corpus(n, seed=seed)
    clips: dict[str, tuple] = {}
    for _, r in pdf.iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
        x = q.astype(np.float64) / 32768.0
        prof = logf_profile(x, r["sr_hz"])
        peaks = profile_peaks(prof) if prof is not None else []
        clips[r["clip_id"]] = (prof, peaks, int(q.size), int(r["sr_hz"]), q)

    def qkey(d: int) -> int:
        return _m.floor(d / SPEED_KEY_Q + 0.5)  # Spark HALF_UP, d > 0

    # composite (spacing, coarse top-peak) bucketing — twin of the
    # operator's 3×3 probe fan (spacings ±1 from the shared key helper,
    # coarse peak ±1 here)
    exact: dict[tuple[int, int], list[str]] = {}
    probe: dict[tuple[int, int], set[str]] = {}
    for cid, (prof, pk, ns, sr, q) in clips.items():
        if len(pk) < 2 or sr <= 0:
            continue
        pc = pk[0] // PEAK_COARSE
        c = sorted(pk)
        sp = {c[j] - c[i] for i in range(len(c)) for j in range(i + 1, len(c))}
        ks = {qkey(d) for d in sp}
        for k in ks:
            exact.setdefault((k, pc), []).append(cid)
            for dd in (-1, 0, 1):
                for dp in (-1, 0, 1):
                    probe.setdefault((k + dd, pc + dp), set()).add(cid)
    cands = set()
    for key, ids in exact.items():
        if len(ids) > max_bucket_size:
            continue
        for a in ids:
            for b in probe.get(key, ()):
                if a < b:
                    cands.add((a, b))

    def fsum_corr(a, b, shift: int) -> float:
        nn = len(a)
        if shift >= 0:
            x, y = a[shift:], b[: nn - shift]
        else:
            x, y = a[: nn + shift], b[-shift:]
        if len(x) < 8:
            return -2.0
        mx = _m.fsum(x) / len(x)
        my = _m.fsum(y) / len(y)
        sxx = _m.fsum((v - mx) ** 2 for v in x)
        syy = _m.fsum((v - my) ** 2 for v in y)
        sxy = _m.fsum((u - mx) * (v - my) for u, v in zip(x, y))
        d = _m.sqrt(sxx * syy)
        return sxy / d if d > 0.0 else -2.0

    def partner(ka, kb, sh) -> bool:
        tols = (PITCH_TOL, PITCH_TOL2)
        ok_a = all(any(abs(p1 - sh - p2) <= tols[i] for p2 in kb)
                   for i, p1 in enumerate(ka[:2]))
        ok_b = all(any(abs(p2 + sh - p1) <= tols[i] for p1 in ka)
                   for i, p2 in enumerate(kb[:2]))
        return ok_a and ok_b

    def rationals(shift: int):
        # independent enumeration: walk Fractions by denominator, dedupe
        seen = set()
        for m in range(1, PITCH_SNAP_DEN + 1):
            for l in range(1, int(m * 2.0 ** (SPEED_MAX_LOG2 + 1)) + 2):
                f = Fraction(l, m)
                if f.denominator > PITCH_SNAP_DEN or f in seen:
                    continue
                if abs(-SPEED_B * _m.log2(f) - shift) <= PITCH_SNAP_BAND:
                    seen.add(f)
        return sorted(seen)

    max_cells = SPEED_B * SPEED_MAX_LOG2
    raw_corr: list[float] = []
    rows = []
    for a, b in sorted(cands):
        prof_a, ka, na, sra, qa = clips[a]
        prof_b, kb, nb, srb, qb = clips[b]
        da, db = na / sra, nb / srb
        if da <= 0 or db <= 0:
            continue
        dc = SPEED_B * _m.log2(db / da)
        la = [float(v) for v in prof_a]
        lb = [float(v) for v in prof_b]
        cls, sh, corr = None, 0, -2.0
        if PITCH_TOL < abs(dc) <= max_cells and partner(ka, kb, 0):
            c = max(fsum_corr(la, lb, s) for s in (-1, 0, 1))
            if c >= STRETCH_CORR_MIN:
                cls, sh, corr = "time_stretch", 0, c
        elif abs(dc) <= PITCH_DUR_EQ:
            raw = {ka[0] - p for p in kb[:3]} | {p - kb[0] for p in ka[:3]}
            anchors = {s + d for s in raw for d in (-2, -1, 0, 1, 2)}
            second = -2.0
            for cand in sorted(anchors):
                if abs(cand) <= PITCH_TOL or abs(cand) > max_cells:
                    continue
                if not partner(ka, kb, cand):
                    continue
                c = fsum_corr(la, lb, cand)
                if c >= PITCH_CORR_MIN:
                    if c > corr:
                        second = corr
                        cls, sh, corr = "pitch_shift", cand, c
                    elif c > second:
                        second = c
            if cls is not None:
                # argmax stability across engines: strict separation
                assert corr - second > 1e-9, (a, b, corr, second)
        if cls is None:
            continue
        # fsum corr must agree with the kernel's numpy corr (the Spark
        # side rounds the kernel value)
        if cls == "time_stretch":
            kc = max(corr_at_shift(np.asarray(la), np.asarray(lb), s)
                     for s in (-1, 0, 1))
        else:
            kc = corr_at_shift(np.asarray(la), np.asarray(lb), sh)
        assert abs(kc - corr) < 1e-9, (a, b, kc, corr)
        raw_corr.append(kc)
        # confirm: independent voting over the rational band
        votes = dist = 0
        if qa.size and qb.size:
            ha, ta = constellation_landmarks(qa / 32768.0)
            for s in rationals(sh):
                frac = (Fraction(srb, sra) / s).limit_denominator(
                    PITCH_RESAMPLE_DEN)
                xb = resample_poly(qb / 32768.0,
                                   frac.numerator, frac.denominator)
                hb, tb = constellation_landmarks(xb)
                if not (ha.size and hb.size and len(xb)):
                    continue
                g = qa.size / len(xb)
                by_hash: dict[int, list[int]] = {}
                for h, t in zip(hb.tolist(), tb.tolist()):
                    by_hash.setdefault(h, []).append(t)
                per: dict[int, list] = {}
                for h, t in zip(ha.tolist(), ta.tolist()):
                    for t2 in by_hash.get(h, ()):
                        per.setdefault(t - round(t2 * g), []).append(h)
                if not per:
                    continue
                cnt = {o: len(hs) for o, hs in per.items()}
                best_o = max(
                    per,
                    key=lambda o: (cnt[o] + max(cnt.get(o - 1, 0),
                                                cnt.get(o + 1, 0)),
                                   -abs(o)),
                )
                v = cnt[best_o] + max(cnt.get(best_o - 1, 0),
                                      cnt.get(best_o + 1, 0))
                if v > votes:
                    dset = set(per[best_o])
                    dset.update(per.get(best_o - 1, ()))
                    dset.update(per.get(best_o + 1, ()))
                    votes, dist = v, len(dset)
        rows.append((a, b, cls, int(sh), spark_round(dc, 2),
                     spark_round(kc, 4),
                     spark_round(2.0 ** (-sh / SPEED_B), 4),
                     int(votes), int(dist),
                     bool(dist < PITCH_DISTINCT_MIN),
                     bool(votes >= PITCH_CONFIRM_VOTES)))
    _assert_off_rounding_boundary(raw_corr, 4)
    cols = ("id_a", "id_b", "edit_class", "shift", "dur_cells_r",
            "corr_r", "scale_est_r", "votes", "distinct", "stationary",
            "confirmed")
    out: dict[str, list] = {c: [] for c in cols}
    for row in rows:
        for c, v in zip(cols, row):
            out[c].append(v)
    return out


def _audio_halluc_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_halluc.halluc_flags`` + the query's
    rounding: decode + ``vad_stats`` are the shared deterministic
    kernels (per-clip float64, batch-layout independent), while the
    tail-loop scan is replayed by an INDEPENDENT brute-force enumeration
    (all (period, repeats) pairs verified with explicit slice equality
    vs the kernel's greedy backward walk), caption normalization by an
    independent per-character filter (vs the kernel's regex), and the
    four decision laws as explicit Python comparisons.  The differential
    surface: decode totality, VAD evidence, loop maximization + tie
    rule, normalization, the laws, rounding, ordering."""
    from .functions.audio import _decode_i16
    from .functions.halluc import (
        LOOP_MAX_PERIOD,
        LOOP_MIN_REPEATS,
        LOOP_MIN_TOKENS,
        SNT_MIN_SPEECH_MS,
        STOCK_MIN_DUR_MS,
        STOCK_PHRASES,
        TOS_MAX_SPEECH_MS,
        TOS_MIN_TOKENS,
    )
    from .functions.vad import vad_stats
    from .synth import make_audio_halluc_corpus

    def norm(text) -> str:
        # independent normalization: per-character classification
        if not text:
            return ""
        buf = []
        for ch in str(text).lower():
            buf.append(ch if ("a" <= ch <= "z" or "0" <= ch <= "9") else " ")
        return " ".join("".join(buf).split())

    def brute_tail(toks: list[str]) -> tuple[int, int]:
        # independent: enumerate every (p, k), verify each block explicitly
        n_t = len(toks)
        best = (0, 0)  # (p, k)
        for p in range(1, LOOP_MAX_PERIOD + 1):
            for k in range(2, n_t // p + 1):
                good = all(
                    toks[n_t - j * p : n_t - (j - 1) * p] == toks[n_t - p :]
                    for j in range(1, k + 1)
                )
                if good and (
                    k * p > best[0] * best[1]
                    or (k * p == best[0] * best[1] and best[0] > p)
                ):
                    best = (p, k)
        return best

    pdf = make_audio_halluc_corpus(n, seed=seed)
    cols = (
        "n_tokens", "dur_dec_ms", "speech_ms", "speech_ratio_r",
        "tail_period", "tail_repeats", "text_over_silence",
        "speech_no_text", "end_loop", "stock_caption", "is_halluc",
    )
    out: dict[str, list] = {"clip_id": [], "ok": []}
    out.update({c: [] for c in cols})
    for _, r in pdf.sort_values("clip_id").iterrows():
        sr = r["sr_hz"] or 0
        try:
            q = _decode_i16(r["bytes"], r["codec"], sr)
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        st = vad_stats(q.astype(np.float32) / np.float32(32767.0), sr)
        dur_dec = int(len(q) * 1000 // sr) if (ok and sr > 0) else 0
        toks = (r["transcript"] or "").split()
        p, k = brute_tail(toks)
        nm = norm(r["transcript"])
        tos = bool(ok and len(toks) >= TOS_MIN_TOKENS
                   and st["speech_ms"] <= TOS_MAX_SPEECH_MS)
        snt = bool(ok and len(toks) == 0
                   and st["speech_ms"] >= SNT_MIN_SPEECH_MS)
        loop = bool(k >= LOOP_MIN_REPEATS and p * k >= LOOP_MIN_TOKENS)
        stock = bool(ok and nm in STOCK_PHRASES and dur_dec >= STOCK_MIN_DUR_MS)
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_tokens"].append(len(toks))
        out["dur_dec_ms"].append(dur_dec)
        out["speech_ms"].append(int(st["speech_ms"]))
        out["speech_ratio_r"].append(spark_round(st["speech_ratio"], 6))
        out["tail_period"].append(p)
        out["tail_repeats"].append(k)
        out["text_over_silence"].append(tos)
        out["speech_no_text"].append(snt)
        out["end_loop"].append(loop)
        out["stock_caption"].append(stock)
        out["is_halluc"].append(tos or snt or loop or stock)
    return out


def _audio_truepeak_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_truepeak.truepeak_flags``: the decode
    dispatch and the Q15 tap SPEC TABLE are shared (the taps are part of
    the operator definition, like the pHash cosine table); the
    oversampled stream is recomputed via the LITERAL definition —
    zero-stuff then ONE full int64 convolution — against the kernel's
    4-phase polyphase decomposition.  In exact integer arithmetic the
    two are the same sums term for term (the 3 trailing extra indices of
    the full conv are provably zero), so any divergence is a real kernel
    bug (phase slicing, edge handling).  Static overflow bound:
    48·32768·32768 ≈ 5.2e13 ≪ 2^63.  Flags replayed as explicit Python
    integer laws."""
    from .functions.audio import _decode_i16
    from .functions.truepeak import (
        FS_Q15,
        RAIL_I16,
        TP_L,
        TP_LIMIT_Q15,
        TP_TAPS_Q15,
    )
    from .synth import make_audio_truepeak_corpus

    pdf = make_audio_truepeak_corpus(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "n_samples": [], "sample_peak": [], "tp_q15": [],
        "is_tp_over": [], "is_hidden_over": [], "is_hot": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
        n_s = int(q.size)
        if n_s == 0:
            sp = tp = None
        else:
            x = q.astype(np.int64)
            zs = np.zeros(TP_L * n_s, dtype=np.int64)
            zs[::TP_L] = x
            y = np.convolve(zs, TP_TAPS_Q15)
            sp = int(np.abs(x).max())
            tp = int(np.abs(y).max())
        over = bool(tp is not None and tp > FS_Q15)
        out["clip_id"].append(r["clip_id"])
        out["n_samples"].append(n_s)
        out["sample_peak"].append(sp)
        out["tp_q15"].append(tp)
        out["is_tp_over"].append(over)
        out["is_hidden_over"].append(bool(over and sp < RAIL_I16))
        out["is_hot"].append(bool(tp is not None and tp > TP_LIMIT_Q15))
    return out


def _audio_clicks_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_clicks.click_flags``: the decode dispatch
    is shared, everything after it is an INDEPENDENT pure-Python integer
    replay of the whole detection law (second differences, frame
    prefilter, locality ratio, rail/zero guards, event merge) — every
    quantity is exact integer arithmetic, so the twin is bit-identical to
    the vectorized numpy kernel by construction and any divergence is a
    real kernel bug (reduceat indexing, window clamping, merge logic)."""
    from .functions.audio import FRAME_MS, _decode_i16
    from .functions.clicks import (
        CLICK_ABS_MIN,
        CLICK_BG_WIN,
        CLICK_GAP,
        CLICK_LOC_K,
        CLICK_MAX_WIDTH_MS,
        CLICK_MIN_EVENTS,
        CLICK_PRE_K,
        CLICK_SELF,
        RAIL_I16,
        ZERO_GUARD_MIN,
        ZERO_GUARD_WIN,
    )
    from .synth import make_audio_click_corpus

    pdf = make_audio_click_corpus(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "n_samples": [], "n_frames": [], "n_cand": [],
        "n_clicks": [], "max_d2": [], "is_clicky": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            qa = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            qa = None
        q = [int(v) for v in qa] if qa is not None else []
        nq = len(q)
        sr = int(r["sr_hz"]) if r["sr_hz"] else 0
        if nq < 3 or sr <= 0:
            out["clip_id"].append(r["clip_id"])
            out["n_samples"].append(nq)
            out["n_frames"].append(0)
            out["n_cand"].append(0)
            out["n_clicks"].append(0)
            out["max_d2"].append(None)
            out["is_clicky"].append(False)
            continue
        frame = max(sr * FRAME_MS // 1000, 1)
        d2 = [abs(q[i - 1] - 2 * q[i] + q[i + 1]) for i in range(1, nq - 1)]
        m = len(d2)
        n_frames = (m + frame - 1) // frame
        cand: list[int] = []  # d2 center indices
        for f0 in range(0, m, frame):
            f1 = min(f0 + frame, m)
            s = sum(d2[f0:f1])
            nf = f1 - f0
            for i in range(f0, f1):
                if d2[i] < CLICK_ABS_MIN or d2[i] * nf < CLICK_PRE_K * s:
                    continue
                lo = max(i - CLICK_BG_WIN, 0)
                hi = min(i + CLICK_BG_WIN + 1, m)
                bg = 0
                for j in range(lo, hi):
                    if abs(j - i) > CLICK_SELF and d2[j] > bg:
                        bg = d2[j]
                if d2[i] >= CLICK_LOC_K * bg:
                    cand.append(i)
        pos = []
        for i in cand:
            p = i + 1  # sample index
            if max(abs(q[p]), abs(q[p - 1]),
                   abs(q[min(p + 1, nq - 1)])) >= RAIL_I16:
                continue
            lo = max(p - ZERO_GUARD_WIN, 0)
            hi = min(p + ZERO_GUARD_WIN + 1, nq)
            if sum(1 for j in range(lo, hi) if q[j] == 0) >= ZERO_GUARD_MIN:
                continue
            pos.append(p)
        max_w = max(int(sr * CLICK_MAX_WIDTH_MS / 1000), 3)
        events: list[list[int]] = []
        for p in pos:
            if events and p - events[-1][-1] <= CLICK_GAP:
                events[-1].append(p)
            else:
                events.append([p])
        n_clicks = 0
        max_d2 = None
        for ev in events:
            if ev[-1] - ev[0] + 1 > max_w:
                continue
            n_clicks += 1
            peak = max(d2[p - 1] for p in ev)
            if max_d2 is None or peak > max_d2:
                max_d2 = peak
        out["clip_id"].append(r["clip_id"])
        out["n_samples"].append(nq)
        out["n_frames"].append(int(n_frames))
        out["n_cand"].append(len(pos))
        out["n_clicks"].append(n_clicks)
        out["max_d2"].append(max_d2)
        out["is_clicky"].append(n_clicks >= CLICK_MIN_EVENTS)
    return out


def _oracle_parse_wav(data):
    """Independent (twin-side) RIFF header walk for 1/2-channel 16-bit
    PCM → (int16[n, ch] frames, channels, sr). Deliberately written
    apart from ``functions.stereo.decode_wav_frames``."""
    import struct as _struct

    if data is None or len(data) < 44 or data[0:4] != b"RIFF" \
            or data[8:12] != b"WAVE":
        raise ValueError("bad container")
    pos, ch, sr, raw = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = _struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt_code, ch, sr = _struct.unpack("<HHI", body[0:8])
            bits = _struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1 or ch not in (1, 2) or bits != 16:
                raise ValueError("unsupported")
        elif cid == b"data":
            raw = bytes(body)
        pos += 8 + size + (size & 1)
    if ch is None or raw is None:
        raise ValueError("missing chunk")
    raw = raw[: len(raw) - (len(raw) % (2 * ch))]
    return np.frombuffer(raw, dtype="<i2").reshape(-1, ch), ch, int(sr)


def _audio_stereo_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_stereo.stereo_flags`` + the query's
    rounding: INDEPENDENT RIFF header walk + mono-codec dispatch,
    integer channel sums recomputed with different numpy reductions
    (einsum / add.reduce vs the kernel's ``@`` dots — equal because
    every sum is an exact int64), SHARED ``derive_stereo`` (exact ints
    in, one formula, so the doubles are bit-identical by construction
    and rounding can never diverge), explicit Python decision ladder.
    Generation guard: no evaluable clip's |balance_db| sits within
    0.25 dB of the IMBALANCE_DB decision line."""
    from .functions.audio import _decode_i16
    from .functions.stereo import IMBALANCE_DB, derive_stereo
    from .synth import make_audio_stereo_corpus

    parse_wav = _oracle_parse_wav
    pdf = make_audio_stereo_corpus(n, seed=seed)
    cols = ["clip_id", "n_ch", "n_samples", "n_diff", "n_anti", "nz_l",
            "nz_r", "rms_l_r", "rms_r_r", "bal_r", "corr_r", "dual_mono",
            "phase_inverted", "dead_channel", "dead_side", "imbalanced"]
    out: dict[str, list] = {c: [] for c in cols}
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            if r["codec"] in ("pcm16", "mulaw"):
                _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
                frames, n_ch = None, 1
            else:
                frames, n_ch, _sr = parse_wav(
                    bytes(r["bytes"]) if r["bytes"] is not None else None
                )
        except (ValueError, TypeError):
            frames, n_ch = None, 0
        if n_ch == 2 and frames is not None:
            a = frames[:, 0].astype(np.int64)
            b = frames[:, 1].astype(np.int64)
            ns = int(frames.shape[0])
            sum_l = int(np.add.reduce(a))
            sum_r = int(np.add.reduce(b))
            ss_l = int(np.einsum("i,i->", a, a))
            ss_r = int(np.einsum("i,i->", b, b))
            s_lr = int(np.einsum("i,i->", a, b))
            nz_l = int(np.sum(a != 0))
            nz_r = int(np.sum(b != 0))
            n_diff = int(np.sum(a != b))
            n_anti = int(np.sum(a != -b))
            d = derive_stereo(ns, sum_l, sum_r, ss_l, ss_r, s_lr)
            ev = ns > 0
            live_l, live_r = nz_l > 0, nz_r > 0
            dual = ev and n_diff == 0 and live_l
            anti = ev and n_anti == 0 and live_l
            dead = ev and (live_l != live_r)
            side = ("L" if live_r else "R") if dead else None
            bal = d["balance_db"]
            imb = (ev and live_l and live_r
                   and abs(bal) >= IMBALANCE_DB)
            if ev and live_l and live_r:
                assert abs(abs(bal) - IMBALANCE_DB) > 0.25, (
                    f"{r['clip_id']}: balance {bal} within the guard band "
                    "of the imbalance line — reseed the corpus"
                )
            vals = [n_ch, ns, n_diff, n_anti, nz_l, nz_r,
                    spark_round(d["rms_db_l"], 4),
                    spark_round(d["rms_db_r"], 4),
                    spark_round(bal, 4), spark_round(d["corr"], 6),
                    dual, anti, dead, side, imb]
        else:
            vals = [n_ch] + [None] * 9 + [False, False, False, None, False]
        out["clip_id"].append(r["clip_id"])
        for c, v in zip(cols[1:], vals):
            out[c].append(v)
    return out


def _audio_downmix_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_stereo.downmix_mono`` + the query's
    projection: independent RIFF parse, decision replay with different
    reductions (floor-division mid vs the kernel's arithmetic shift —
    equal on ints by definition), exact-integer duration law, payloads
    hash-checked byte-for-byte via the from-spec Python XXH64 twin of
    Spark's ``xxhash64``."""
    from .functions.audio import _decode_i16
    from .functions.xxh64 import xxh64_bytes
    from .synth import make_audio_stereo_corpus

    def signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    pdf = make_audio_stereo_corpus(n, seed=seed)
    cols = ["clip_id", "n_ch", "downmix_mode", "sr_hz", "dur_ms",
            "n_bytes", "payload_h"]
    out: dict[str, list] = {c: [] for c in cols}
    for _, r in pdf.sort_values("clip_id").iterrows():
        mono = None
        sr = None
        try:
            if r["codec"] in ("pcm16", "mulaw"):
                mono = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
                n_ch, mode, sr = 1, "mono_passthrough", r["sr_hz"]
            else:
                frames, n_ch, sr = _oracle_parse_wav(
                    bytes(r["bytes"]) if r["bytes"] is not None else None
                )
                if n_ch == 1:
                    mono, mode = frames[:, 0], "mono_passthrough"
                else:
                    a = frames[:, 0].astype(np.int64)
                    b = frames[:, 1].astype(np.int64)
                    live_l, live_r = bool(a.any()), bool(b.any())
                    if live_l != live_r:
                        mono = frames[:, 0] if live_l else frames[:, 1]
                        mode = "take_live"
                    elif live_l and int(np.sum(a != -b)) == 0:
                        mono, mode = frames[:, 0], "take_left_inverted"
                    elif live_l and int(np.sum(a != b)) == 0:
                        mono, mode = frames[:, 0], "take_left_dual"
                    else:
                        mono = ((a + b) // 2).astype(np.int16)
                        mode = "mid"
        except (ValueError, TypeError):
            n_ch, mode, mono, sr = 0, "undecodable", None, None
        if mono is not None and sr and int(sr) > 0:
            sr = int(sr)
            nsamp = int(len(mono))
            payload = np.asarray(mono).astype("<i2", copy=False).tobytes()
            vals = [n_ch, mode, sr, (2 * nsamp * 1000 + sr) // (2 * sr),
                    len(payload), signed(xxh64_bytes(payload, 42))]
        else:
            vals = [0, "undecodable", None, None, None, None]
        out["clip_id"].append(r["clip_id"])
        for c, v in zip(cols[1:], vals):
            out[c].append(v)
    return out


def _code_switch_expected(sf_dir: str) -> dict:
    """Twin of ``operators.code_switch.code_switch_scan`` over the
    injected documents: the window split and the langid kernel are
    SHARED; the per-doc fold (Counter, dominant/minority, switch count,
    the integer flag law) is replayed independently.  Generation guard:
    every window re-scored ALONE must agree with the whole-corpus batch
    score (same language, conf within 1e-9) and sit > 1e-9 from the
    CONF_MIN threshold — so Spark's arbitrary Arrow batching cannot
    flip any decision (the reduceat ~1e-14 law in functions/text.py)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from .functions.text import LANGID
    from .operators.code_switch import (
        CONF_MIN,
        doc_windows,
        snippet,
    )

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    sn_a = " " + snippet("en") + " " + snippet("es")
    sn_b = " " + snippet("de") + " " + snippet("ru")
    docs = []
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        tx = text or ""
        if did % 6 == 0:
            tx += sn_a
        if did % 10 == 0:
            tx += sn_b
        docs.append((did, tx))
    docs.sort(key=lambda r: r[0])
    wins = [doc_windows(tx) for _, tx in docs]
    flat = [w for ws in wins for w in ws]
    langs, confs = LANGID.score_batch(flat)
    for i, w in enumerate(flat):
        lg1, cf1 = LANGID.score_one(w)
        assert lg1 == langs[i] and abs(cf1 - confs[i]) < 1e-9, (
            "window language call depends on batch composition; "
            "regenerate with a different seed/snippet")
        assert abs(confs[i] - CONF_MIN) > 1e-9, (
            "window conf sits on the decision threshold")
    out: dict[str, list] = {k: [] for k in
                            ("doc_id", "n_windows", "n_confident",
                             "dominant_lang", "n_langs", "minority_cnt",
                             "n_switches", "code_switched")}
    pos = 0
    for (did, _), ws in zip(docs, wins):
        k = len(ws)
        wl = langs[pos: pos + k]
        wc = confs[pos: pos + k]
        pos += k
        conf_langs = [lg for lg, cf in zip(wl, wc)
                      if cf >= CONF_MIN and lg != "und"]
        cnt = Counter(conf_langs)
        if cnt:
            top = max(cnt.values())
            dominant = min(lg for lg, c in cnt.items() if c == top)
            minority = max((c for lg, c in cnt.items() if lg != dominant),
                           default=0)
        else:
            dominant, minority = "und", 0
        out["doc_id"].append(did)
        out["n_windows"].append(k)
        out["n_confident"].append(len(conf_langs))
        out["dominant_lang"].append(dominant)
        out["n_langs"].append(len(cnt))
        out["minority_cnt"].append(minority)
        out["n_switches"].append(
            sum(1 for a, b in zip(conf_langs, conf_langs[1:]) if a != b))
        out["code_switched"].append(
            bool(len(conf_langs) >= 2 and minority * 4 >= len(conf_langs)))
    return out


def _audio_speed_dup_expected(n=300, seed=42, max_bucket_size=64) -> dict:
    """Twin of the speed-dup chain (clip_profiles → speed_dup_pairs →
    speed_dup_confirm): the profile/peak/landmark/resample kernels are
    SHARED (deterministic float pipelines on identical inputs), while
    the bucketing (exact-vs-probe sides, HALF_UP key quantizer, bucket
    guard, a<b dedup), the implied-shift law, the peak-partner law, the
    correlation (math.fsum arithmetic vs the kernel's numpy dot), the
    rational-speed approximation, and the landmark vote counter are
    replayed INDEPENDENTLY; corr rounding guarded off 4dp boundaries."""
    import math as _m
    from collections import Counter
    from fractions import Fraction

    from .functions.audio import _decode_i16
    from .functions.resample import resample_poly
    from .functions.spectral import (
        SPEED_B,
        SPEED_CORR_MIN,
        SPEED_KEY_Q,
        SPEED_MAX_LOG2,
        constellation_landmarks,
        logf_profile,
        profile_peaks,
    )
    from .operators.audio_speed import CONFIRM_MAX_DEN, CONFIRM_MIN_VOTES
    from .synth import make_audio_speed_corpus

    pdf = make_audio_speed_corpus(n, seed=seed)
    clips: dict[str, tuple] = {}
    for _, r in pdf.iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
        x = q.astype(np.float64) / 32768.0
        prof = logf_profile(x, r["sr_hz"])
        peaks = profile_peaks(prof) if prof is not None else []
        clips[r["clip_id"]] = (prof, peaks, int(q.size), int(r["sr_hz"]),
                               q, r["codec"])

    def qkey(d: int) -> int:
        return _m.floor(d / SPEED_KEY_Q + 0.5)  # Spark HALF_UP, d > 0

    # composite (spacing, coarse top-peak) bucketing — twin of
    # audio_speed.bucket_candidates' 3x3 probe fan
    from .operators.audio_speed import PEAK_COARSE

    exact: dict[tuple[int, int], list[str]] = {}
    probe: dict[tuple[int, int], set[str]] = {}
    for cid, (prof, pk, ns, sr, q, codec) in clips.items():
        if len(pk) < 2:
            continue
        pc = pk[0] // PEAK_COARSE
        c = sorted(pk)
        sp = {c[j] - c[i] for i in range(len(c)) for j in range(i + 1, len(c))}
        ks = {qkey(d) for d in sp}
        for k in ks:
            exact.setdefault((k, pc), []).append(cid)
            for dd in (-1, 0, 1):
                for dp in (-1, 0, 1):
                    probe.setdefault((k + dd, pc + dp), set()).add(cid)
    cands = set()
    for key, ids in exact.items():
        if len(ids) > max_bucket_size:
            continue
        for a in ids:
            for b in probe.get(key, ()):
                if a < b:
                    cands.add((a, b))

    def fsum_corr(a: list[float], b: list[float], shift: int) -> float:
        nn = len(a)
        if shift >= 0:
            x, y = a[shift:], b[: nn - shift]
        else:
            x, y = a[: nn + shift], b[-shift:]
        if len(x) < 8:
            return -2.0
        mx = _m.fsum(x) / len(x)
        my = _m.fsum(y) / len(y)
        sxx = _m.fsum((v - mx) ** 2 for v in x)
        syy = _m.fsum((v - my) ** 2 for v in y)
        sxy = _m.fsum((u - mx) * (v - my) for u, v in zip(x, y))
        d = _m.sqrt(sxx * syy)
        return sxy / d if d > 0.0 else -2.0

    rows = []
    raw_corr: list[float] = []
    for a, b in sorted(cands):
        prof_a, ka, na, sra, qa, _ = clips[a]
        prof_b, kb, nb, srb, qb, _ = clips[b]
        da, db = na / sra, nb / srb
        if da <= 0 or db <= 0:
            continue
        r = _m.log2(db / da)
        if abs(r) > SPEED_MAX_LOG2:
            continue
        sh = SPEED_B * r
        ok_a = all(any(abs(p1 - sh - p2) <= 2.5 for p2 in kb)
                   for p1 in ka[:2])
        ok_b = all(any(abs(p2 + sh - p1) <= 2.5 for p1 in ka)
                   for p2 in kb[:2])
        if not (ok_a and ok_b):
            continue
        la = [float(v) for v in prof_a]
        lb = [float(v) for v in prof_b]
        lo, hi = _m.floor(sh), _m.ceil(sh)
        best = max(fsum_corr(la, lb, s) for s in {lo - 1, lo, hi, hi + 1})
        if best < SPEED_CORR_MIN:
            continue
        raw_corr.append(best)
        # confirm: rational resample + independent landmark vote
        votes = 0
        if qa.size and qb.size:
            frac = Fraction(int(qa.size), int(qb.size)).limit_denominator(
                CONFIRM_MAX_DEN)
            xb = resample_poly(qb / 32768.0, frac.denominator, frac.numerator)
            ha, ta = constellation_landmarks(qa / 32768.0)
            hb, tb = constellation_landmarks(xb)
            if ha.size and hb.size:
                cnt: Counter = Counter()
                bset: dict[int, list[int]] = {}
                for h, t in zip(hb.tolist(), tb.tolist()):
                    bset.setdefault(h, []).append(t)
                for h, t in zip(ha.tolist(), ta.tolist()):
                    for t2 in bset.get(h, ()):
                        cnt[t - t2] += 1
                if cnt:
                    votes = max(
                        cnt[o] + max(cnt.get(o - 1, 0), cnt.get(o + 1, 0))
                        for o in cnt)
        rows.append((a, b, round(sh, 2), round(best, 4),
                     round(2.0 ** (-r), 4), votes,
                     bool(votes >= CONFIRM_MIN_VOTES)))
    _assert_off_rounding_boundary(raw_corr, 4)
    out: dict[str, list] = {k: [] for k in
                            ("id_a", "id_b", "shift_r", "corr_r",
                             "speed_est", "votes", "confirmed")}
    for a, b, sh, co, sp, v, cf in rows:
        out["id_a"].append(a)
        out["id_b"].append(b)
        out["shift_r"].append(sh)
        out["corr_r"].append(co)
        out["speed_est"].append(sp)
        out["votes"].append(v)
        out["confirmed"].append(cf)
    return out


def _dsir_weights_expected(sf_dir: str, num_buckets=1024, k=100) -> dict:
    """Twin of ``operators.dsir``: from-spec XXH64 bucket assignment,
    Laplace-smoothed log-ratio weights via math.log, the shared
    fixed-point quantization law, per-doc EXACT integer sums (order-free
    by construction), and deterministic top-k by (log_w DESC, doc_id)."""
    import math
    import re as _re

    from .operators.dsir import FIXED_POINT_BITS, quantize_weights

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("source").to_pylist(),
        )
    )

    def buckets(text: str | None) -> list[int]:
        if text is None or not text.strip():
            return []
        toks = _re.split(r"\s+", text.strip())
        out = []
        for n in (1, 2):
            for i in range(len(toks) - n + 1):
                g = toks[i] if n == 1 else " ".join(toks[i : i + n])
                h = xxh64_string(g, 42)
                if h >= 1 << 63:
                    h -= 1 << 64
                out.append(h % num_buckets)
        return out

    doc_buckets = {d: buckets(tx) for d, tx, _ in rows}
    t_counts: dict[int, int] = {}
    r_counts: dict[int, int] = {}
    for d, _, src in rows:
        for b in doc_buckets[d]:
            r_counts[b] = r_counts.get(b, 0) + 1
            if src == "src0":
                t_counts[b] = t_counts.get(b, 0) + 1
    t_total = sum(t_counts.values())
    r_total = sum(r_counts.values())
    weights = [
        math.log((t_counts.get(b, 0) + 1) / (t_total + num_buckets))
        - math.log((r_counts.get(b, 0) + 1) / (r_total + num_buckets))
        for b in range(num_buckets)
    ]
    qw = quantize_weights(weights)
    scale = float(1 << FIXED_POINT_BITS)
    scored = []
    for d, _, _ in rows:
        bs = doc_buckets[d]
        acc = 0
        for b in bs:
            acc += qw[b]
        scored.append((d, len(bs), acc / scale))
    scored.sort(key=lambda x: (-x[2], x[0]))
    top = scored[:k]
    return {
        "doc_id": [x[0] for x in top],
        "n_grams": [x[1] for x in top],
        "log_w": [x[2] for x in top],
    }


def _clf_twin_state(sf_dir: str):
    """Shared derivation for the trained-classifier twins: Gopher
    weak-supervision labels, the four scorer features, the
    (xxhash64(doc_id), doc_id) bounded sample, and the written GD spec
    (plain-float ascending-id fold) — all re-derived in pure Python
    (from-spec XXH64; ``re`` for every regex signal).  Returns
    (docs, sig, w) with sig[doc_id] = (label, features) and w the
    5-weight vector."""
    import math
    import re as _re

    import pyarrow.parquet as pq

    from .operators.quality_model import (
        LEN_CAP, TRAIN_ITERS, TRAIN_LR, TRAIN_SAMPLE,
    )

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    from .operators.docs import _ALL_STOPWORDS

    stopset = set(_ALL_STOPWORDS)

    def signals(text):
        s = text if text is not None else ""
        toks = _re.split(r"\s+", s.strip()) if s.strip() else []
        nt = len(toks)
        low = _re.split(r"\s+", s.lower().strip()) if s.strip() else []
        n_stop = sum(1 for w in low if w in stopset) if nt else 0
        nc = len(s)
        nd = len(_re.findall(r"[0-9]", s))
        nsp = len(_re.sub(r"[A-Za-z0-9À-ÿ \t\n\r]", "", s))
        nns = len(_re.sub(r"\s", "", s))
        alpha = len(_re.findall(r"[^\s]*[A-Za-z][^\s]*", s))
        sym = len(_re.findall(r"#|\.\.\.", s))
        label = not (
            (nt < 50 or nt > 100_000)
            or (nns < 3 * nt or nns > 10 * nt)
            or (10 * sym > 1 * nt)
            or (5 * alpha < 4 * nt)
            or (n_stop < 2)
        )
        return label, _clf_features_py(s)

    sig = {i: signals(text) for i, text in docs}
    order = sorted(docs, key=lambda r: (xxh64_long(r[0], 42), r[0]))
    sample = sorted(i for i, _ in order[:TRAIN_SAMPLE])
    w = _train_gd_py(sig, sample, TRAIN_ITERS, TRAIN_LR)
    return docs, sig, w


def _clf_features_py(s: str):
    """The scorer's four feature ratios in pure Python (twin of
    ``quality_model.quality_features``)."""
    import re as _re

    from .operators.quality_model import LEN_CAP

    s = s if s is not None else ""
    toks = _re.split(r"\s+", s.strip()) if s.strip() else []
    nt = len(toks)
    from .operators.docs import _ALL_STOPWORDS

    stopset = set(_ALL_STOPWORDS)
    low = _re.split(r"\s+", s.lower().strip()) if s.strip() else []
    n_stop = sum(1 for w in low if w in stopset) if nt else 0
    nc = len(s)
    nd = len(_re.findall(r"[0-9]", s))
    nsp = len(_re.sub(r"[A-Za-z0-9À-ÿ \t\n\r]", "", s))
    return (
        (n_stop / nt) if nt > 0 else 0.0,
        min(nt, LEN_CAP) / float(LEN_CAP),
        (nd / nc) if nc > 0 else 0.0,
        (nsp / nc) if nc > 0 else 0.0,
    )


def _train_gd_py(sig: dict, sample: list, iters: int, lr: float) -> list:
    """The GD spec, re-implemented: ascending-id fold, plain floats."""
    import math

    w = [0.0] * 5
    m = float(len(sample))
    for _ in range(iters):
        g = [0.0] * 5
        for i in sample:
            y, x = sig[i]
            z = w[0]
            for j in range(4):
                z = z + (w[j + 1] * x[j])
            e = 1.0 / (1.0 + math.exp(-z)) - (1.0 if y else 0.0)
            g[0] = g[0] + e
            for j in range(4):
                g[j + 1] = g[j + 1] + (e * x[j])
        for j in range(5):
            w[j] = w[j] - (lr * (g[j] / m))
    return w


def _clf_z(w, x):
    z = w[0]
    for j in range(4):
        z = z + (w[j + 1] * x[j])
    return z


def _quality_classifier_expected(sf_dir: str) -> dict:
    """Twin of q_quality_classifier (see :func:`_clf_twin_state`): the
    z>0 sign test and the full-corpus confusion over the re-derived
    labels/features/weights."""
    docs, sig, w = _clf_twin_state(sf_dir)
    return _clf_report_rows(sig, w, [i for i, _ in docs])


def _clf_report_rows(sig: dict, w: list, ids: list) -> dict:
    """(metric, value) confusion + weights — twin of
    ``quality_model.classifier_report``'s output relation."""
    conf = {"tp": 0, "fp": 0, "fn": 0, "tn": 0}
    for i in ids:
        y, x = sig[i]
        pred = _clf_z(w, x) > 0.0
        conf["tp" if pred and y else "fp" if pred else "fn" if y else "tn"] += 1
    rows = dict(
        w_bias=w[0], w_stopword_frac=w[1], w_len_capped=w[2],
        w_digit_frac=w[3], w_special_frac=w[4],
        tp=float(conf["tp"]), fp=float(conf["fp"]),
        fn=float(conf["fn"]), tn=float(conf["tn"]), n=float(len(ids)),
    )
    keys = sorted(rows)
    return {"metric": keys, "value": [rows[k] for k in keys]}


def _gate_distill_expected(n=1200, seed=42) -> dict:
    """Twin of q_gate_distill: the pandas-oracle gate decisions label the
    clips (keep=True), transcript features come from the shared pure-
    Python feature law, sampling uses from-spec XXH64 over the STRING
    clip ids, and the GD spec + confusion replay as in the documents
    twin — a text-only model distilling the audio gate."""
    from .operators.quality_model import TRAIN_ITERS, TRAIN_LR, TRAIN_SAMPLE

    pdf = _clips_oracle_frame(n, seed)
    ids = list(pdf["clip_id"])
    sig = {
        i: (d == "keep", _clf_features_py(t))
        for i, t, d in zip(ids, pdf["transcript"], pdf["decision"])
    }
    order = sorted(ids, key=lambda i: (xxh64_string(i, 42), i))
    sample = sorted(order[:TRAIN_SAMPLE])
    w = _train_gd_py(sig, sample, TRAIN_ITERS, TRAIN_LR)
    return _clf_report_rows(sig, w, ids)


def _embed_pairs_twin(pdf) -> tuple[set, set]:
    """Shared pair-stage twin of ``embed_near_dup`` (see
    ``_audio_embed_dedup_expected`` for the full law description):
    returns (verified pair set, decodable clip-id set).  Used by both the
    embed-dedup accounting oracle and the speaker-balance oracle so the
    two queries pin the SAME pair law."""
    import numpy as np

    from .functions.audio import _decode_i16
    from .functions.mel import N_MELS, log_mel
    from .operators.audio_embed import (
        EMBED_BITS, EMBED_SEED, EMBED_TABLES,
        PROFILE_NCC_MIN, TRAJ_NCC_MIN, _profile_stats,
    )
    from .operators.similarity import _hyperplanes

    rel = {}
    for _, r in pdf.iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], int(r["sr_hz"]))
        except (ValueError, TypeError):
            continue
        m = log_mel(q.astype(np.float64) / 32768.0, int(r["sr_hz"]))
        if m.shape[0] < 4:
            continue
        _, centered, norm, _ = _profile_stats(m)
        if not norm > 0:
            continue
        rel[r["clip_id"]] = (centered, norm, m)

    tables = [
        _hyperplanes(N_MELS, EMBED_BITS, EMBED_SEED + t)
        for t in range(EMBED_TABLES)
    ]
    buckets: dict[tuple[int, int], list[str]] = {}
    for cid, (centered, _, _) in rel.items():
        for t, planes in enumerate(tables):
            b = 0
            for i in range(planes.shape[0]):
                acc = 0.0
                for j in range(N_MELS):
                    acc = acc + (float(centered[j]) * float(planes[i][j]))
                bit = 1 if acc >= 0 and not math.isnan(acc) else 0
                b |= bit << i
            buckets.setdefault((t, b), []).append(cid)

    cands = set()
    for members in buckets.values():
        if len(members) > 64:  # hot-bucket guard
            continue
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cands.add((ms[x], ms[y]))

    def dot_fold(a, b):
        acc = 0.0
        for j in range(len(a)):
            acc = acc + (float(a[j]) * float(b[j]))
        return acc

    pairs = set()
    for ida, idb in cands:
        ca, na, ma = rel[ida]
        cb, nb, mb = rel[idb]
        if dot_fold(ca, cb) / (na * nb) < PROFILE_NCC_MIN:
            continue
        k = min(ma.shape[0], mb.shape[0])
        x = ma[:k].ravel()
        y = mb[:k].ravel()
        x = x - (x.sum() / float(x.size))
        y = y - (y.sum() / float(y.size))
        den = float(np.sqrt((x * x).sum() * (y * y).sum()))
        traj = float((x * y).sum() / den) if den > 0 else 0.0
        if traj >= TRAJ_NCC_MIN:
            pairs.add((ida, idb))
    return pairs, set(rel.keys())


def _audio_embed_dedup_expected(n=200, seed=42) -> dict:
    """Twin of q_audio_embed_dedup: shared decode/log_mel/profile-stat
    kernels (the mel byte-hash oracle owns their correctness); the SRP
    projections (index-order plain-float folds matching zip_with +
    aggregate), sign/bit packing, hot-bucket guard, candidate join,
    profile-NCC prune, aligned trajectory verify, and the per-SNR /
    coincidence accounting replayed independently in pure Python."""
    from .synth import make_audio_noise_corpus

    pdf = make_audio_noise_corpus(n, seed=seed)
    pairs, rel = _embed_pairs_twin(pdf)

    seeded = {}
    for cid in rel:
        if "_n" in cid:
            base, snr = cid.rsplit("_n", 1)
            seeded[(base, cid)] = int(snr)
    # expected counts come from ALL injected ids present in the corpus
    # (the query's inj relation does not require decodability)
    exp_counts: dict[int, int] = {}
    for cid in pdf["clip_id"]:
        if "_n" in str(cid):
            snr = int(str(cid).rsplit("_n", 1)[1])
            exp_counts[snr] = exp_counts.get(snr, 0) + 1
    caught: dict[int, int] = {}
    coin = 0
    for p in pairs:
        if p in seeded:
            s = seeded[p]
            caught[s] = caught.get(s, 0) + 1
        else:
            coin += 1
    out = {"level": [], "n_pairs": [], "n_caught": []}
    rows = [("coincidence", coin, None)] + [
        (f"snr_{s}", exp_counts[s], caught.get(s, 0)) for s in exp_counts
    ]
    for level, npairs, ncaught in sorted(rows, key=lambda r: r[0]):
        out["level"].append(level)
        out["n_pairs"].append(npairs)
        out["n_caught"].append(ncaught)
    return out


def _speaker_balance_expected(n=200, seed=42, cap=2, bal_seed=5) -> dict:
    """Twin of q_speaker_balance: the shared embed-pair law
    (``_embed_pairs_twin``), then plain-Python union-find over the pair
    graph (component label = min id — the large/small-star fixed point),
    singleton clusters for unpaired clips, and the per-cluster cap in
    (md5(id:seed), id) order.  kept_ids pins EXACT kept membership per
    cluster, so one row crossing the cap line anywhere flips the hash."""
    import hashlib

    from .synth import make_audio_noise_corpus

    pdf = make_audio_noise_corpus(n, seed=seed)
    pairs, _ = _embed_pairs_twin(pdf)

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    groups: dict[str, list[str]] = {}
    for cid in (str(c) for c in pdf["clip_id"]):
        groups.setdefault(find(cid), []).append(cid)

    out = {"cluster_rep": [], "n_members": [], "n_kept": [], "kept_ids": []}
    for rep in sorted(groups):
        members = groups[rep]
        order = sorted(
            members,
            key=lambda c: (
                hashlib.md5(f"{c}:{bal_seed}".encode()).hexdigest(), c
            ),
        )
        kept = sorted(order[:cap])
        out["cluster_rep"].append(rep)
        out["n_members"].append(len(members))
        out["n_kept"].append(len(kept))
        out["kept_ids"].append(",".join(kept))
    return out


def _codec_sniff_classify(
    data, codec, sr: int | None, dur: int | None
) -> str:
    """Independent plain-Python replay of the payload-triage evidence
    ladder (struct-based header walk, exact-integer grid arithmetic) —
    does NOT call the operator's Column builder."""
    import struct

    if data is None or len(data) == 0:
        return "empty_payload"
    if codec not in ("pcm16", "mulaw", "wav"):
        return "codec_unknown"
    if sr is None or sr <= 0 or sr > 384000:
        return "sr_invalid"
    blen = len(data)
    n_exp = (int(dur) * int(sr) + 500) // 1000
    slack = -(-int(sr) // 1000)  # ceil

    def off_grid(samples: int) -> bool:
        return abs(samples - n_exp) > slack

    is_riff = blen >= 12 and data[0:4] == b"RIFF" and data[8:12] == b"WAVE"
    if codec == "wav":
        if not is_riff or blen < 44:
            return "bad_container"
        fmt_size = struct.unpack("<I", data[16:20])[0]
        dsize = struct.unpack("<I", data[40:44])[0]
        canonical = (
            data[12:16] == b"fmt " and fmt_size == 16
            and data[36:40] == b"data"
            and dsize + 44 <= blen <= dsize + 45
        )
        if not canonical:
            return "noncanonical_wav"
        fmt_code, channels = struct.unpack("<HH", data[20:24])
        hdr_sr = struct.unpack("<I", data[24:28])[0]
        bits = struct.unpack("<H", data[34:36])[0]
        if fmt_code != 1 or channels != 1 or bits != 16:
            return "unsupported_wav"
        if hdr_sr != sr:
            return "header_sr_mismatch"
        if off_grid(dsize // 2):
            return "length_mismatch"
        return "ok"
    if is_riff:
        return "container_in_raw"
    if codec == "pcm16":
        if blen % 2 != 0:
            return "odd_length"
        if off_grid(blen // 2):
            return "length_mismatch"
        return "ok"
    if off_grid(blen):
        return "length_mismatch"
    return "ok"


# spec copy of the operator's severity law (gate DROP_RULES convention)
_SNIFF_SEVERITY = {
    "empty_payload": "critical", "codec_unknown": "critical",
    "sr_invalid": "critical", "bad_container": "critical",
    "unsupported_wav": "critical", "header_sr_mismatch": "critical",
    "container_in_raw": "critical", "noncanonical_wav": "warning",
    "odd_length": "warning", "length_mismatch": "warning", "ok": "info",
}


def _codec_sniff_expected(n=1200, seed=42) -> dict:
    """Twin of q_codec_sniff: the byte-evidence ladder replayed per clip
    with struct.unpack + Python ints, rolled into the (codec, class)
    confusion cells with min-id examples."""
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    cells: dict[tuple[str, str], list] = {}
    for _, r in pdf.iterrows():
        cls = _codec_sniff_classify(
            r["bytes"], r["codec"], int(r["sr_hz"]), int(r["dur_ms"])
        )
        key = (str(r["codec"]), cls)
        cid = str(r["clip_id"])
        if key not in cells:
            cells[key] = [0, cid]
        cells[key][0] += 1
        cells[key][1] = min(cells[key][1], cid)
    out = {"codec": [], "payload_class": [], "payload_severity": [],
           "n": [], "example_clip": []}
    for (codec, cls) in sorted(cells):
        out["codec"].append(codec)
        out["payload_class"].append(cls)
        out["payload_severity"].append(_SNIFF_SEVERITY[cls])
        out["n"].append(cells[(codec, cls)][0])
        out["example_clip"].append(cells[(codec, cls)][1])
    return out


# spec copies of the bpe_train query constants (operators/bpe_train.py)
_BPE_NUM_MERGES = 100
_BPE_TOP_WORDS = 50_000
_BPE_MIN_COUNT = 2
_BPE_END = "</w>"
_BPE_WORD_RE = r"[^ \t\n\r\f\x0b]+"  # complement of the pinned ws class


def _bpe_twin_learn(sf_dir: str):
    """Independent replay of the BPE written spec: pyarrow word Counter,
    (n DESC, word ASC) top-V capture, tuple-keyed aggregated vocab,
    zip-pair counting, min-key selection — structurally distinct from the
    operator's list-per-word trainer."""
    import re
    from collections import Counter

    wc: Counter = Counter()
    for _id, text in _read_documents(sf_dir):
        if text:
            wc.update(re.findall(_BPE_WORD_RE, text))
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:_BPE_TOP_WORDS]
    # aggregate identical symbol sequences (the operator keeps them
    # per-word; counts are additive either way)
    vocab: dict[tuple, int] = {}
    for w, c in top:
        key = tuple(w) + (_BPE_END,)
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(_BPE_NUM_MERGES):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < _BPE_MIN_COUNT:
            break
        merges.append((left, right, left + right, n))
        nxt: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges


def _bpe_merges_expected(sf_dir: str) -> dict:
    merges = _bpe_twin_learn(sf_dir)
    return {
        "rank": list(range(len(merges))),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "merged": [m[2] for m in merges],
        "pair_count": [m[3] for m in merges],
    }


def _bpe_twin_encode_len(word: str, ranks: dict) -> int:
    """Independent greedy lowest-rank-first encoder (length only)."""
    syms = list(word) + [_BPE_END]
    while True:
        cand = [
            (ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks
        ]
        if not cand:
            return len(syms)
        _, (lft, rgt) = min(cand)
        # apply the chosen merge left-to-right non-overlapping
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                out.append(lft + rgt)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out


def _bpe_encode_expected(sf_dir: str) -> dict:
    """Twin of q_bpe_encode: re-learn merges, replay the encoder per doc,
    exact-int rollup by lang."""
    import re

    import pyarrow.parquet as pq

    merges = _bpe_twin_learn(sf_dir)
    ranks = {(l, r): i for i, (l, r, _m, _n) in enumerate(merges)}
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    cache: dict[str, int] = {}
    groups: dict[str, list[int]] = {}
    for lang, text in zip(t.column("lang").to_pylist(),
                          t.column("text").to_pylist()):
        words = re.findall(_BPE_WORD_RE, text or "")
        g = groups.setdefault(str(lang), [0, 0, 0, 0])
        g[0] += 1
        g[1] += len(words)
        for w in words:
            if w not in cache:
                cache[w] = _bpe_twin_encode_len(w, ranks)
            g[2] += cache[w]
            g[3] += len(w)
    out = {"lang": [], "n_docs": [], "total_words": [],
           "total_tokens": [], "total_chars": []}
    for lang in sorted(groups):
        g = groups[lang]
        out["lang"].append(lang)
        out["n_docs"].append(g[0])
        out["total_words"].append(g[1])
        out["total_tokens"].append(g[2])
        out["total_chars"].append(g[3])
    return out


# spec copies of the bloom_decontaminate query constants
_BLOOM_N = 4
_BLOOM_BPK = 12
_BLOOM_K = 6
_BLOOM_SRC = "src0"


def _bloom_grams(text: str | None, n: int) -> set:
    """Replay of quality_filters.word_ngrams (lower/trim/\\s+ split,
    space-joined), deduplicated as the report's distinct() does."""
    import re

    toks = [
        w
        for w in re.split(
            "[ \t\n\x0b\f\r]+", (text or "").strip().lower()
        )
        if w
    ]
    return {
        " ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)
    }


def _bloom_decon_expected(sf_dir: str) -> dict:
    """Twin of q_bloom_decontaminate: from-spec XXH64 column fold →
    positions → bitset membership → exact verify, per-source ints."""
    import pyarrow.parquet as pq

    from .functions.xxh64 import xxh64_long, xxh64_string

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("source").to_pylist(),
            t.column("text").to_pylist(),
        )
    )
    bench_set: set = set()
    for _id, src, text in rows:
        if src == _BLOOM_SRC:
            bench_set |= _bloom_grams(text, _BLOOM_N)
    m = max(64, ((_BLOOM_BPK * max(len(bench_set), 1) + 63) // 64) * 64)

    def positions(gram: str) -> list[int]:
        h = xxh64_string(gram, 42)
        out = []
        for i in range(_BLOOM_K):
            out.append(xxh64_long(i, h) % m)
        return out

    bits: set = set()
    for g in bench_set:
        bits.update(positions(g))

    groups: dict[str, list[int]] = {}
    for _id, src, text in rows:
        if src == _BLOOM_SRC:
            continue
        g = groups.setdefault(str(src), [0, 0, 0, 0, 0])
        g[0] += 1
        grams = _bloom_grams(text, _BLOOM_N)
        bloom_hits = [
            gr for gr in grams if all(p in bits for p in positions(gr))
        ]
        confirmed = [gr for gr in bloom_hits if gr in bench_set]
        if bloom_hits:
            g[1] += 1
        if confirmed:
            g[2] += 1
        g[3] += len(bloom_hits)
        g[4] += len(confirmed)
    out = {"source": [], "n_docs": [], "bloom_docs": [],
           "confirmed_docs": [], "bloom_grams": [], "confirmed_grams": []}
    for src in sorted(groups):
        g = groups[src]
        out["source"].append(src)
        out["n_docs"].append(g[0])
        out["bloom_docs"].append(g[1])
        out["confirmed_docs"].append(g[2])
        out["bloom_grams"].append(g[3])
        out["confirmed_grams"].append(g[4])
    return out


def _quality_calibration_expected(sf_dir: str, n_buckets: int = 10) -> dict:
    """Twin of q_quality_calibration: Spark's NTILE law replayed over
    (z DESC, doc_id ASC) — n//B (+1 for the first n%B buckets) rows per
    bucket — then per-bucket exact label counts + min/max of the
    bit-exact scores."""
    docs, sig, w = _clf_twin_state(sf_dir)
    scored = sorted(
        ((_clf_z(w, sig[i][1]), i) for i, _ in docs),
        key=lambda t: (-t[0], t[1]),
    )
    n = len(scored)
    base, extra = divmod(n, n_buckets)
    out = {"bucket": [], "n_docs": [], "n_pass": [], "pass_rate": [],
           "min_score": [], "max_score": []}
    pos = 0
    for b in range(1, n_buckets + 1):
        size = base + (1 if b <= extra else 0)
        chunk = scored[pos:pos + size]
        pos += size
        if not chunk:
            continue
        n_pass = sum(1 for z, i in chunk if sig[i][0])
        zs = [z for z, _ in chunk]
        out["bucket"].append(b)
        out["n_docs"].append(len(chunk))
        out["n_pass"].append(n_pass)
        out["pass_rate"].append(float(n_pass) / float(len(chunk)))
        out["min_score"].append(min(zs))
        out["max_score"].append(max(zs))
    return out


def _clips_gate_decide3_expected(n=1200, seed=42) -> dict:
    """Twin of ``pipeline.decide3`` (reference 3-way decision enum,
    checkpoints.py:216-252): critical rule hit → reject, warning-only →
    graylist, clean → accept; grouped counts."""
    from .pipeline import DROP_RULES

    rows = _clips_row_flags(n, seed)
    counts = {"accept": 0, "graylist": 0, "reject": 0}
    for flags in rows:
        crit = any(flags[k] for k, sev in DROP_RULES.items() if sev == "critical")
        warn = any(flags[k] for k, sev in DROP_RULES.items() if sev != "critical")
        counts["reject" if crit else "graylist" if warn else "accept"] += 1
    keys = sorted(k for k in counts if counts[k] > 0)
    return {"decision": keys, "n_clips": [counts[k] for k in keys]}


def _media_features_expected(n=300, seed=42) -> dict:
    from .functions import audio as A
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    groups: dict[tuple[str, bool], list] = {}
    for _, r in pdf.iterrows():
        payload = r["bytes"] if r["bytes"] is not None else b""
        try:
            pcm = A.decode_clip(payload, r["codec"], int(r["sr_hz"]))
            A.clip_stats(pcm, int(r["sr_hz"]))
            ok = True
        except (ValueError, TypeError):
            ok = False
        g = groups.setdefault(("audio", ok), [0, 0])
        g[0] += 1
        g[1] += len(payload)
    out = {"kind": [], "ok": [], "n_media": [], "total_bytes": []}
    for key in sorted(groups):
        out["kind"].append(key[0])
        out["ok"].append(key[1])
        out["n_media"].append(groups[key][0])
        out["total_bytes"].append(groups[key][1])
    return out


def _bmp_rgb_py(data: bytes):
    """Independent pure-Python BMP parser (struct + per-pixel loops) —
    the twin-side decoder shared by the image-feature and image-dedup
    oracles."""
    import struct as _st

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("bad bmp")
    off = _st.unpack("<I", data[10:14])[0]
    hdr, w, h, planes, bpp, comp = _st.unpack("<IiiHHI", data[14:34])
    if hdr < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError("variant")
    if w <= 0 or h == 0:
        raise ValueError("degenerate")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(data) < off + stride * h:
        raise ValueError("truncated")
    rows = []
    for y in range(h):
        base = off + y * stride
        row = []
        for x in range(w):
            b0 = data[base + 3 * x]
            g0 = data[base + 3 * x + 1]
            r0 = data[base + 3 * x + 2]
            row.append((r0, g0, b0))
        rows.append(row)
    if flip:
        rows.reverse()
    return rows


def _image_features_expected(n=200, seed=42) -> dict:
    """Twin of ``extract_media_features(fake_decode=False)`` over the
    generate_media corpus: INDEPENDENT pure-Python BMP/RVID parsing
    (struct + per-pixel byte loops vs the kernel's numpy reshape views),
    exact-integer feature arithmetic, and the frame-sampling index
    formula re-derived.  The payload GENERATOR is shared; everything
    after the bytes is independent."""
    import struct as _st

    from .synth import generate_media

    pdf = generate_media(n, seed=seed)
    bmp_rgb = _bmp_rgb_py

    def feats_of(rows) -> list[float]:
        h = len(rows)
        w = len(rows[0])
        cnt = h * w
        sr_ = sg_ = sb_ = sl_ = 0
        lmin, lmax = None, None
        for row in rows:
            for (r0, g0, b0) in row:
                sr_ += r0
                sg_ += g0
                sb_ += b0
                lum = 299 * r0 + 587 * g0 + 114 * b0
                sl_ += lum
                lmin = lum if lmin is None or lum < lmin else lmin
                lmax = lum if lmax is None or lum > lmax else lmax
        return [float(h), float(w), sr_ / cnt, sg_ / cnt, sb_ / cnt,
                (sl_ / cnt) / 1000.0, lmin / 1000.0, lmax / 1000.0]

    out = {"media_id": [], "kind": [], "ok": [], "n_bytes": []}
    for i in range(8):
        out[f"f{i}"] = []
    for _, r in pdf.iterrows():
        payload = bytes(r["payload"]) if r["payload"] is not None else b""
        feats = None
        try:
            if r["kind"] == "image" and payload[:2] == b"BM":
                feats = feats_of(bmp_rgb(payload))
            elif r["kind"] == "video" and payload[:4] == b"RVID":
                if len(payload) < 10:
                    raise ValueError("short")
                f, h, w = _st.unpack("<HHH", payload[4:10])
                if f == 0 or h == 0 or w == 0:
                    raise ValueError("degenerate")
                if len(payload) < 10 + f * h * w * 3:
                    raise ValueError("truncated")
                k = 3
                if f <= k:
                    idx = list(range(f))
                else:
                    idx = []
                    for i in range(k):
                        j = (i * (f - 1) * 2 + (k - 1)) // (2 * (k - 1))
                        if not idx or j != idx[-1]:
                            idx.append(j)
                per = []
                for j in idx:
                    base = 10 + j * h * w * 3
                    rows = [
                        [
                            (
                                payload[base + (y * w + x) * 3],
                                payload[base + (y * w + x) * 3 + 1],
                                payload[base + (y * w + x) * 3 + 2],
                            )
                            for x in range(w)
                        ]
                        for y in range(h)
                    ]
                    per.append(feats_of(rows))
                feats = []
                for c in range(8):
                    s = 0.0
                    for p in per:
                        s += p[c]  # sequential, matches numpy's small-k sum
                    feats.append(s / len(per))
            else:
                raise ValueError("undecodable")
        except (ValueError, _st.error):
            feats = None
        out["media_id"].append(r["media_id"])
        out["kind"].append(r["kind"])
        out["ok"].append(feats is not None)
        out["n_bytes"].append(len(payload))
        for i in range(8):
            out[f"f{i}"].append(feats[i] if feats is not None else None)
    return out


def _dhash_py(rows) -> int:
    """Independent pure-Python dHash twin: explicit per-cell block-sum
    loops (vs the kernel's 2-D prefix sums), same integer grid/compare."""
    h = len(rows)
    w = len(rows[0])
    if h < 8 or w < 9:
        raise ValueError("too small")
    luma = [
        [299 * r0 + 587 * g0 + 114 * b0 for (r0, g0, b0) in row]
        for row in rows
    ]
    rb = [(i * h) // 8 for i in range(9)]
    cb = [(j * w) // 9 for j in range(10)]
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for i in range(8):
        for j in range(9):
            s = 0
            for y in range(rb[i], rb[i + 1]):
                for x in range(cb[j], cb[j + 1]):
                    s += luma[y][x]
            sums[i][j] = s
            cnts[i][j] = (rb[i + 1] - rb[i]) * (cb[j + 1] - cb[j])
    v = 0
    for i in range(8):
        for j in range(8):
            if sums[i][j] * cnts[i][j + 1] > sums[i][j + 1] * cnts[i][j]:
                v |= 1 << (i * 8 + j)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _image_near_dup_expected(n=120, seed=42) -> dict:
    """Twin of ``image_hashes → image_near_pairs``: independent BMP parse
    (_bmp_rgb_py) + independent dHash (_dhash_py) + brute-force O(n²)
    Hamming pairing — vs the kernel's prefix-sum hash and the Manku
    chunk-band bucket join.  (At this corpus size no chunk bucket
    approaches the 256 hot-bucket guard, so banding recall ≤3 is exactly
    the brute-force set by pigeonhole.)"""
    from .synth import generate_image_corpus

    pdf = generate_image_corpus(n, seed=seed)
    sigs: list[tuple[str, int]] = []
    for _, r in pdf.iterrows():
        try:
            sigs.append(
                (r["media_id"], _dhash_py(_bmp_rgb_py(bytes(r["payload"]))))
            )
        except ValueError:
            continue
    out = {"id_a": [], "id_b": [], "hamming": []}
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            a, ha = sigs[i]
            b, hb = sigs[j]
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                ia, ib = (a, b) if a < b else (b, a)
                out["id_a"].append(ia)
                out["id_b"].append(ib)
                out["hamming"].append(d)
    order = sorted(range(len(out["id_a"])),
                   key=lambda k: (out["id_a"][k], out["id_b"][k]))
    return {k: [vs[i] for i in order] for k, vs in out.items()}


def _phash_py(rows) -> int:
    """Independent pure-Python pHash twin: explicit per-cell block-sum
    loops and O(16³) DCT loops with arbitrary-precision Python ints (vs
    the kernel's prefix sums + int64 matmuls — an int64 overflow on the
    kernel side would break the hash match).  Shares only the spec
    constants: the fixed-point cosine table and the scale/floor laws."""
    from .functions.image import (
        _DCT16_SCALE,
        _PHASH_MEAN_SCALE,
        DCT16_TABLE,
    )

    h = len(rows)
    w = len(rows[0])
    if h < 16 or w < 16:
        raise ValueError("too small")
    C = [[int(v) for v in row] for row in DCT16_TABLE]
    luma = [
        [299 * r0 + 587 * g0 + 114 * b0 for (r0, g0, b0) in row]
        for row in rows
    ]
    rb = [(i * h) // 16 for i in range(17)]
    cb = [(j * w) // 16 for j in range(17)]
    grid = [[0] * 16 for _ in range(16)]
    for i in range(16):
        for j in range(16):
            s = 0
            for y in range(rb[i], rb[i + 1]):
                for x in range(cb[j], cb[j + 1]):
                    s += luma[y][x]
            cnt = (rb[i + 1] - rb[i]) * (cb[j + 1] - cb[j])
            grid[i][j] = (s * _PHASH_MEAN_SCALE) // cnt
    t1 = [[0] * 16 for _ in range(16)]
    for u in range(16):
        for j in range(16):
            acc = 0
            for m in range(16):
                acc += C[u][m] * grid[m][j]
            t1[u][j] = acc // _DCT16_SCALE  # Python floor matches np
    coef = [[0] * 8 for _ in range(8)]
    for u in range(8):
        for vv in range(8):
            acc = 0
            for j in range(16):
                acc += t1[u][j] * C[vv][j]
            coef[u][vv] = acc
    vals = sorted(
        coef[u][vv] for u in range(8) for vv in range(8)
        if (u, vv) != (0, 0)
    )
    med = vals[31]
    v = 0
    for u in range(8):
        for j in range(8):
            if (u, j) != (0, 0) and coef[u][j] > med:
                v |= 1 << (u * 8 + j)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _ahash_py(rows) -> int:
    """Independent pure-Python aHash twin: explicit block-sum loops,
    cell-vs-global cross-multiplied compare (same law as the kernel,
    different execution)."""
    h = len(rows)
    w = len(rows[0])
    if h < 8 or w < 8:
        raise ValueError("too small")
    luma = [
        [299 * r0 + 587 * g0 + 114 * b0 for (r0, g0, b0) in row]
        for row in rows
    ]
    total_sum = sum(sum(r) for r in luma)
    total_cnt = h * w
    rb = [(i * h) // 8 for i in range(9)]
    cb = [(j * w) // 8 for j in range(9)]
    v = 0
    for i in range(8):
        for j in range(8):
            s = 0
            for y in range(rb[i], rb[i + 1]):
                for x in range(cb[j], cb[j + 1]):
                    s += luma[y][x]
            cnt = (rb[i + 1] - rb[i]) * (cb[j + 1] - cb[j])
            if s * total_cnt > total_sum * cnt:
                v |= 1 << (i * 8 + j)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _image_hash_recall_expected(n=120, seed=42, max_hamming=3) -> dict:
    """Twin of the hash-method recall relation: all three perceptual
    families brute-forced independently (``_dhash_py`` / ``_ahash_py`` /
    ``_phash_py`` over ``_bmp_rgb_py``), pair sets intersected with
    explicit Python set algebra.  All-integer outputs — exact."""
    from .synth import generate_image_corpus

    pdf = generate_image_corpus(n, seed=seed)
    fns = {"ahash": _ahash_py, "dhash": _dhash_py, "phash": _phash_py}
    pair_sets: dict[str, set] = {}
    hashed: dict[str, int] = {}
    for method, fn in fns.items():
        sigs = []
        for _, r in pdf.iterrows():
            try:
                sigs.append((r["media_id"],
                             fn(_bmp_rgb_py(bytes(r["payload"])))))
            except ValueError:
                continue
        hashed[method] = len(sigs)
        ps = set()
        for i in range(len(sigs)):
            for j in range(i + 1, len(sigs)):
                a, ha = sigs[i]
                b, hb = sigs[j]
                d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    ps.add((min(a, b), max(a, b)))
        pair_sets[method] = ps
    out = {"method": [], "n_hashed": [], "n_pairs": [],
           "n_shared_all": [], "n_unique": []}
    for method in sorted(fns):
        mine = pair_sets[method]
        others = [pair_sets[m] for m in fns if m != method]
        out["method"].append(method)
        out["n_hashed"].append(hashed[method])
        out["n_pairs"].append(len(mine))
        out["n_shared_all"].append(
            len(mine & others[0] & others[1]))
        out["n_unique"].append(
            len(mine - others[0] - others[1]))
    return out


def _image_probe_expected(n=120, seed=42, max_hamming=3) -> dict:
    """Twin of q_image_dedup_incremental: the image corpus split by
    pmod(xxhash64(media_id), 2) (index = 0, increment = 1); independent
    BMP parse + fixed-point pHash; brute-force NEW×INDEX Hamming
    (banding recall ≤3 exact by pigeonhole; equal hashes pair at 0 by
    the exact law either way)."""
    from .synth import generate_image_corpus

    pdf = generate_image_corpus(n, seed=seed)
    sigs: dict[str, int] = {}
    for _, r in pdf.iterrows():
        try:
            sigs[r["media_id"]] = _phash_py(_bmp_rgb_py(bytes(r["payload"])))
        except ValueError:
            continue
    side = {m: xxh64_string(m, 42) % 2 for m in sigs}
    out = {"new_id": [], "index_id": [], "hamming": []}
    rows = []
    for new, hn in sigs.items():
        if side[new] != 1:
            continue
        for old, ho in sigs.items():
            if side[old] != 0 or old == new:
                continue
            d = bin((hn ^ ho) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                rows.append((new, old, d))
    for new, old, d in sorted(rows):
        out["new_id"].append(new)
        out["index_id"].append(old)
        out["hamming"].append(d)
    return out


def _image_phash_near_dup_expected(n=120, seed=42) -> dict:
    """Twin of ``image_hashes(method='phash') → image_near_pairs``:
    independent BMP parse + independent fixed-point DCT hash +
    brute-force O(n²) Hamming pairing (banding recall ≤3 is exact by
    pigeonhole at this corpus size — no chunk bucket nears the guard)."""
    from .synth import generate_image_corpus

    pdf = generate_image_corpus(n, seed=seed)
    sigs: list[tuple[str, int]] = []
    for _, r in pdf.iterrows():
        try:
            sigs.append(
                (r["media_id"], _phash_py(_bmp_rgb_py(bytes(r["payload"]))))
            )
        except ValueError:
            continue
    out = {"id_a": [], "id_b": [], "hamming": []}
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            a, ha = sigs[i]
            b, hb = sigs[j]
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                ia, ib = (a, b) if a < b else (b, a)
                out["id_a"].append(ia)
                out["id_b"].append(ib)
                out["hamming"].append(d)
    order = sorted(range(len(out["id_a"])),
                   key=lambda k: (out["id_a"][k], out["id_b"][k]))
    return {k: [vs[i] for i in order] for k, vs in out.items()}


def _image_cluster_split_expected(
    n=120, seed=42, val_frac=0.25, split_seed=7
) -> dict:
    """Twin of the image ``split_by_cluster`` composition: union-find
    over the independent dHash pair twin, split decided by hashlib-md5
    of the component representative vs the same 128-bit threshold
    literal Spark uses."""
    import hashlib

    from .operators.sampling import fraction_threshold_hex
    from .synth import generate_image_corpus

    exp = _image_near_dup_expected(n, seed)
    comp = _uf_min_components(list(zip(exp["id_a"], exp["id_b"])))
    thresh = fraction_threshold_hex(val_frac)
    pdf = generate_image_corpus(n, seed=seed)
    out = {"media_id": [], "split": []}
    for mid in sorted(pdf["media_id"]):
        rep = str(comp.get(mid, mid))
        h = hashlib.md5(f"{rep}:{split_seed}".encode()).hexdigest()
        out["media_id"].append(mid)
        out["split"].append("val" if h < thresh else "train")
    return out


def _image_dedup_clusters_expected(n=120, seed=42) -> dict:
    """Twin of ``image_dedup_clusters``: union-find closure of the
    independent image near-dup pair twin (component = min media_id)."""
    exp = _image_near_dup_expected(n, seed)
    pairs = list(zip(exp["id_a"], exp["id_b"]))
    comp = _uf_min_components(pairs)
    sizes: dict[str, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    out = {"media_id": [], "component": [], "cluster_size": []}
    for node in sorted(comp):
        out["media_id"].append(node)
        out["component"].append(comp[node])
        out["cluster_size"].append(sizes[comp[node]])
    return out


# ------------------------------------------------------------ audio dedup


def _audio_verified_pairs(
    n=400, seed=42, window=3, stride=1, ber_max=0.30, max_bucket=64,
    relabel_every=0,
) -> list[tuple[str, str, float]]:
    """Pure-Python twin of ``audio_dedup.clip_fingerprints`` +
    ``fingerprint_near_dup`` over ``synth.make_audio_dup_corpus``: bucket
    keys rebuilt with the from-spec XXH64 (bit-matching Spark's
    ``xxhash64`` array fold), BER via per-word popcount loops — no Spark,
    no vectorized shortcuts in the join/verify logic.  Sorted (a, b,
    ber_rounded) triples; shared by the pair and cluster twins."""
    from .functions.audio import _decode_i16
    from .functions.spectral import fingerprint_i32
    from .synth import make_audio_dup_corpus

    pdf = make_audio_dup_corpus(n, seed=seed, relabel_every=relabel_every)
    fps: dict[str, list[int]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        fps[r["clip_id"]] = [int(v) for v in fingerprint_i32(x)]
    return _fp_pair_replay(fps, window, stride, ber_max, max_bucket)


def _fp_pair_replay(
    fps: dict[str, list[int]], window=3, stride=1, ber_max=0.30,
    max_bucket=64,
) -> list[tuple[str, str, float]]:
    """The ``fingerprint_near_dup`` relational law over a fingerprint
    map: stable-byte XXH64 window buckets, skew guard, popcount BER
    verify.  Shared by the dup-corpus twins and the identity-split
    twin."""
    from .functions.spectral import STABLE_MASK, STABLE_SHIFT

    buckets: dict[tuple[int, int], list[str]] = {}
    for cid, fp in fps.items():
        if len(fp) < window:
            continue
        sb = [(v >> STABLE_SHIFT) & STABLE_MASK for v in fp]
        for wi in range((len(sb) - window) // stride + 1):
            off = wi * stride
            h = 42
            for v in sb[off:off + window]:
                h = xxh64_long(v, h)
            buckets.setdefault((off, h), []).append(cid)
    cand: set[tuple[str, str]] = set()
    for members in buckets.values():
        if 1 < len(members) <= max_bucket:
            ms = sorted(set(members))
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand.add((ms[i], ms[j]))
    rows = []
    for a, b in cand:
        fa, fb = fps[a], fps[b]
        m = min(len(fa), len(fb))
        if m == 0:
            continue
        diff = 0
        for va, vb in zip(fa[:m], fb[:m]):
            diff += bin((va ^ vb) & 0x7FFF).count("1")
        ber = diff / (15.0 * m)
        if ber <= ber_max:
            rows.append((a, b, spark_round(ber, 6)))
    rows.sort()
    return rows


def _audio_fingerprint_expected(n=400, seed=42) -> dict:
    rows = _audio_verified_pairs(n, seed)
    return {
        "id_a": [r[0] for r in rows],
        "id_b": [r[1] for r in rows],
        "ber_r": [r[2] for r in rows],
    }


def _audio_loop_expected(n=300, seed=42, min_lag=8, min_overlap=16) -> dict:
    """Twin of ``audio_loop.loop_scan`` over ``make_audio_loop_corpus``:
    decode + fingerprint kernels are SHARED (hash-verified by their own
    queries); the lag scan, best-fraction tracking, dominant-word
    accounting (explicit Counter vs numpy unique), and decision ladder
    are replayed as explicit Python int loops (per-element equality,
    cross-multiplied rational compares, first-wins tiebreak) — every
    output is an int or bool, so agreement is exact by construction."""
    from collections import Counter

    from .functions.audio import _decode_i16
    from .functions.spectral import fingerprint_i32
    from .operators.audio_loop import (
        DOMINANT_DEN,
        DOMINANT_NUM,
        LOOP_FRAC_DEN,
        LOOP_FRAC_NUM,
        MIN_DISTINCT,
    )
    from .synth import make_audio_loop_corpus

    pdf = make_audio_loop_corpus(n, seed=seed)
    out: dict[str, list] = {k: [] for k in
                            ("clip_id", "ok", "n_frames", "n_distinct",
                             "n_dominant", "best_lag", "match_num",
                             "match_den", "looped")}
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        fp = [int(v) for v in fingerprint_i32(q)]
        nf = len(fp)
        counts = Counter(fp)
        distinct = len(counts)
        dominant = max(counts.values()) if counts else 0
        best = None
        for lag in range(min_lag, nf - min_overlap + 1):
            valid = nf - lag
            m = 0
            for i in range(valid):
                if fp[i] == fp[i + lag]:
                    m += 1
            if best is None or m * best[1] > best[0] * valid:
                best = (m, valid, lag)
        looped = (
            best is not None
            and distinct >= MIN_DISTINCT
            and dominant * DOMINANT_DEN <= DOMINANT_NUM * nf
            and best[0] * LOOP_FRAC_DEN >= LOOP_FRAC_NUM * best[1]
        )
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_frames"].append(nf)
        out["n_distinct"].append(distinct)
        out["n_dominant"].append(dominant)
        out["best_lag"].append(best[2] if best else None)
        out["match_num"].append(best[0] if best else None)
        out["match_den"].append(best[1] if best else None)
        out["looped"].append(looped)
    return out


def _audio_loop_arbitrary_expected(
    n=300, seed=42, arbitrary_every=2, min_lag_ms=20, min_overlap_ms=100,
) -> dict:
    """Twin of ``audio_loop.loop_scan_samples`` over the corpus with
    off-grid loop periods: decode and the FFT candidate PROPOSAL are
    SHARED (a pure per-clip function; floats never decide anything);
    the candidate-selection cross-multiply, distinct/dominant accounting
    (Counter vs numpy unique), and the decision ladder are replayed
    independently, and the WINNING lag's match count is re-derived with
    an explicit per-sample Python loop (the numpy count used during
    selection must agree exactly or the assert fires)."""
    from collections import Counter

    from .functions.audio import _decode_i16
    from .operators.audio_loop import (
        DOMINANT_DEN,
        DOMINANT_NUM,
        LOOP_FRAC_DEN,
        LOOP_FRAC_NUM,
        SAMPLE_MIN_DISTINCT,
        propose_lag_candidates,
    )
    from .synth import make_audio_loop_corpus

    pdf = make_audio_loop_corpus(n, seed=seed,
                                 arbitrary_every=arbitrary_every)
    out: dict[str, list] = {k: [] for k in
                            ("clip_id", "ok", "n_samples", "n_distinct",
                             "n_dominant", "best_lag", "match_num",
                             "match_den", "looped")}
    for _, r in pdf.sort_values("clip_id").iterrows():
        sr = r["sr_hz"] or 0
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        ns = int(q.size)
        samples = [int(v) for v in q]
        counts = Counter(samples)
        distinct = len(counts)
        dominant = max(counts.values()) if counts else 0
        min_lag = max(1, sr * min_lag_ms // 1000)
        min_overlap = max(1, sr * min_overlap_ms // 1000)
        cands = (propose_lag_candidates(q, min_lag, min_overlap)
                 if ok and sr > 0 else [])
        lag = valid = m = None
        for c in cands:
            v = ns - c
            mc = int((q[:v] == q[c:]).sum())
            if lag is None or mc * valid > m * v:
                lag, valid, m = c, v, mc
        if lag is not None:
            m_py = 0
            for i in range(valid):
                if samples[i] == samples[i + lag]:
                    m_py += 1
            assert m_py == m, (r["clip_id"], lag, m, m_py)
        looped = (
            lag is not None
            and distinct >= SAMPLE_MIN_DISTINCT
            and dominant * DOMINANT_DEN <= DOMINANT_NUM * ns
            and m * LOOP_FRAC_DEN >= LOOP_FRAC_NUM * valid
        )
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_samples"].append(ns)
        out["n_distinct"].append(distinct)
        out["n_dominant"].append(dominant)
        out["best_lag"].append(lag)
        out["match_num"].append(m)
        out["match_den"].append(valid)
        out["looped"].append(looped)
    return out


def _tokens_py(text) -> set[str]:
    """Independent twin of ``array_distinct(tokens_col(...))`` as a SET:
    Spark's ``trim`` strips SPACES only (not tabs/newlines), ``lower`` is
    full-Unicode on both engines, and Java ``\\s`` is exactly
    ``[ \\t\\n\\x0b\\f\\r]`` — spelled out so the Python twin cannot
    silently diverge on Unicode whitespace."""
    import re as _re

    if text is None:
        return set()
    t = str(text).lower().strip(" ")
    if not t:
        return set()
    return set(_re.split(r"[ \t\n\r\x0b\f]+", t))


def _levenshtein_py(a, b) -> int | None:
    """Independent DP edit distance over code points (the definition
    Spark's ``levenshtein`` and DuckDB's ``levenshtein`` both implement:
    unit-cost insert/delete/substitute)."""
    if a is None or b is None:
        return None
    a, b = str(a), str(b)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def _label_noise_expected(
    n=400, seed=42, relabel_every=3, jaccard_max=0.5
) -> dict:
    """Twin of ``transcript_mismatch(fingerprint_near_dup(...), clips)``
    over the relabelled dup corpus: the verified pair set is the shared
    from-spec XXH64 + popcount twin; on top, token SETS and Jaccard are
    rebuilt with explicit Python set algebra (vs Spark array_intersect/
    array_union), the edit distance with an independent Python DP (vs
    the JVM's levenshtein), the two-empty-sets-agree convention
    replayed, and the 6dp rounding guarded off half-step boundaries at
    generation time."""
    from .synth import make_audio_dup_corpus

    pairs = _audio_verified_pairs(n, seed, relabel_every=relabel_every)
    pdf = make_audio_dup_corpus(n, seed=seed, relabel_every=relabel_every)
    toks = {r["clip_id"]: _tokens_py(r["transcript"])
            for _, r in pdf.iterrows()}
    texts = {r["clip_id"]: r["transcript"] for _, r in pdf.iterrows()}
    out = {"id_a": [], "id_b": [], "ber_r": [], "jaccard_r": [],
           "edit_dist": [], "label_mismatch": []}
    raw: list[float] = []
    for a, b, ber_r in pairs:
        ta, tb = toks[a], toks[b]
        union = len(ta | tb)
        jac = len(ta & tb) / union if union > 0 else 1.0
        raw.append(jac)
        out["id_a"].append(a)
        out["id_b"].append(b)
        out["ber_r"].append(ber_r)
        out["jaccard_r"].append(spark_round(jac, 6))
        out["edit_dist"].append(_levenshtein_py(texts[a], texts[b]))
        out["label_mismatch"].append(jac < jaccard_max)
    _assert_off_rounding_boundary(raw, 6)
    return out


def _audio_decontaminate_expected(
    n=400, seed=42, window=3, stride=1, ber_max=0.30, relabel_every=0
) -> dict:
    """Twin of ``audio_dedup.audio_decontaminate`` over
    ``synth.make_audio_dup_corpus`` split into corpus (base ids) vs eval
    (the ``_re`` re-encodes): cross-set bucket probe rebuilt with the
    from-spec XXH64, BER via per-word popcount loops, per-corpus-clip
    aggregation as explicit dict bookkeeping."""
    from .functions.audio import _decode_i16
    from .functions.spectral import (
        N_BANDS,
        STABLE_MASK,
        STABLE_SHIFT,
        fingerprint_i32,
    )
    from .synth import make_audio_dup_corpus

    pdf = make_audio_dup_corpus(n, seed=seed, relabel_every=relabel_every)
    fps: dict[str, list[int]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        fps[r["clip_id"]] = [int(v) for v in fingerprint_i32(x)]
    corpus = sorted(c for c in fps if not c.endswith("_re"))
    evals = sorted(c for c in fps if c.endswith("_re"))

    def bucket_keys(fp: list[int]) -> set[tuple[int, int]]:
        if len(fp) < window:
            return set()
        sb = [(v >> STABLE_SHIFT) & STABLE_MASK for v in fp]
        keys = set()
        for wi in range((len(sb) - window) // stride + 1):
            off = wi * stride
            h = 42
            for v in sb[off:off + window]:
                h = xxh64_long(v, h)
            keys.add((off, h))
        return keys

    eval_buckets: dict[tuple[int, int], set[str]] = {}
    for eid in evals:
        for k in bucket_keys(fps[eid]):
            eval_buckets.setdefault(k, set()).add(eid)
    out = {"clip_id": [], "contaminated": [], "n_matches": [],
           "min_ber_r": []}
    for cid in corpus:
        hits: set[str] = set()
        for k in bucket_keys(fps[cid]):
            hits |= eval_buckets.get(k, set())
        n_matches = 0
        min_ber = None
        for eid in sorted(hits):
            fa, fb = fps[cid], fps[eid]
            m = min(len(fa), len(fb))
            if m == 0:
                continue
            diff = 0
            for a, b in zip(fa[:m], fb[:m]):
                diff += bin((a ^ b) & 0x7FFF).count("1")
            ber = diff / ((N_BANDS - 1) * m)
            if ber <= ber_max:
                n_matches += 1
                min_ber = ber if min_ber is None else min(min_ber, ber)
        out["clip_id"].append(cid)
        out["contaminated"].append(n_matches > 0)
        out["n_matches"].append(n_matches)
        out["min_ber_r"].append(spark_round(min_ber, 4))
    return out


def _clip_decontaminate_expected(
    n=400, seed=42, relabel_every=3, ngram_n=4
) -> dict:
    """Twin of ``label_noise.clip_decontaminate``: the audio half reuses
    the cross-set fingerprint twin (relabeled corpus), the text half is an
    explicit Python n-gram set intersection with the same lowercase
    tokenization as ``word_ngrams``; OR-composed per corpus clip."""
    from .synth import make_audio_dup_corpus

    audio = _audio_decontaminate_expected(
        n, seed, relabel_every=relabel_every
    )
    pdf = make_audio_dup_corpus(n, seed=seed, relabel_every=relabel_every)
    texts = dict(zip(pdf["clip_id"], pdf["transcript"]))

    def grams(tx) -> set[str]:
        toks = _tokens(tx)
        return {
            " ".join(toks[i : i + ngram_n])
            for i in range(len(toks) - ngram_n + 1)
        }

    eval_grams: set[str] = set()
    for cid, tx in texts.items():
        if cid.endswith("_re"):
            eval_grams |= grams(tx)
    out = {
        "clip_id": [], "audio_hit": [], "text_hit": [], "leaked": [],
        "n_matches": [], "n_gram_hits": [], "min_ber_r": [],
    }
    for i, cid in enumerate(audio["clip_id"]):
        hits = len(grams(texts[cid]) & eval_grams)
        a = bool(audio["contaminated"][i])
        t = hits > 0
        out["clip_id"].append(cid)
        out["audio_hit"].append(a)
        out["text_hit"].append(t)
        out["leaked"].append(a or t)
        out["n_matches"].append(audio["n_matches"][i])
        out["n_gram_hits"].append(hits)
        out["min_ber_r"].append(audio["min_ber_r"][i])
    return out


def _audio_dedup_clusters_expected(n=400, seed=42) -> dict:
    """Twin of the ``audio_dedup_clusters`` query: union-find closure of
    the verified audio near-dup pair graph (component label = min clip_id,
    lexicographic — same as the star rounds' canonical order)."""
    pairs = [(a, b) for a, b, _ in _audio_verified_pairs(n, seed)]
    comp = _uf_min_components(pairs)
    sizes: dict[str, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    out = {"clip_id": [], "component": [], "cluster_size": []}
    for node in sorted(comp):
        out["clip_id"].append(node)
        out["component"].append(comp[node])
        out["cluster_size"].append(sizes[comp[node]])
    return out


def _duration_batches_expected(n=1200, seed=42, batch=16) -> dict:
    """Twin of the ``duration_batches`` query: the NAIVE global
    (dur, id) sort + consecutive-cut batching + padding-waste law over
    the gate corpus, in plain Python — proving the decomposed rank
    exact per batch (boundary ids pin the edges)."""
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    rows = []
    for _, r in pdf.iterrows():
        d = r["dur_ms"]
        ln = -1 if (d is None or (isinstance(d, float) and math.isnan(d))) \
            else int(d)
        rows.append((ln, r["clip_id"]))
    rows.sort()
    out = {"batch_id": [], "n_items": [], "max_len": [], "sum_len": [],
           "padded_len": [], "pad_waste": [], "waste_frac_r": [],
           "first_id": [], "last_id": []}
    for b in range(0, len(rows), batch):
        grp = rows[b:b + batch]
        lens = [max(ln, 0) for ln, _ in grp]
        mx, sm, n_it = max(lens), sum(lens), len(grp)
        padded = n_it * mx
        waste = padded - sm
        out["batch_id"].append(b // batch)
        out["n_items"].append(n_it)
        out["max_len"].append(mx)
        out["sum_len"].append(sm)
        out["padded_len"].append(padded)
        out["pad_waste"].append(waste)
        out["waste_frac_r"].append(
            spark_round(waste / padded, 6) if padded > 0 else 0.0)
        out["first_id"].append(grp[0][1])
        out["last_id"].append(grp[-1][1])
    return out


def _channel_hot_buckets_expected(
    n_sessions=2, clips_per_session=40, seed=42, max_bucket=32
) -> dict:
    """Twin of the ``channel_hot_buckets`` query: shared channel kernel
    per clip, the 2-key (tilt grids × peak-band family) emission, and
    the guard threshold replayed as explicit Python counts."""
    from .functions.audio import _decode_i16
    from .functions.channel import channel_key_parts, noise_profile
    from .synth import make_audio_channel_corpus

    pdf = make_audio_channel_corpus(n_sessions, clips_per_session, seed)
    buckets: dict[tuple[int, int, int], int] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        p, _nw = noise_profile(x, int(r["sr_hz"]))
        if p is None:
            continue
        pk, c0, c1, _tilt = channel_key_parts(p)
        for k in ((0, c0, pk), (1, c1, pk)):
            buckets[k] = buckets.get(k, 0) + 1
    out = {"grid": [], "cell": [], "family": [], "n_members": []}
    for (g, c, fam), cnt in sorted(buckets.items()):
        if cnt > max_bucket:
            out["grid"].append(g)
            out["cell"].append(c)
            out["family"].append(fam)
            out["n_members"].append(cnt)
    return out


def _audio_probe_expected(
    n=400, seed=42, window=3, stride=1, ber_max=0.30, max_bucket=64,
) -> dict:
    """Twin of q_audio_dedup_incremental: the dup corpus split by
    pmod(xxhash64(clip_id), 2) (index = 0, increment = 1); index-side
    bucket guard; NEW×INDEX collisions only; popcount BER verify; the
    exact fp-digest law replayed by grouping on the fingerprint tuple
    (pairs at ber 0.0 regardless of bucket heat)."""
    from .functions.audio import _decode_i16
    from .functions.spectral import STABLE_MASK, STABLE_SHIFT
    from .functions.spectral import fingerprint_i32
    from .synth import make_audio_dup_corpus

    pdf = make_audio_dup_corpus(n, seed=seed)
    fps: dict[str, list[int]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        fps[r["clip_id"]] = [int(v) for v in fingerprint_i32(x)]
    side = {c: xxh64_string(c, 42) % 2 for c in fps}
    idx_ids = [c for c in fps if side[c] == 0]
    new_ids = [c for c in fps if side[c] == 1]

    def keys(fp):
        if len(fp) < window:
            return
        sb = [(v >> STABLE_SHIFT) & STABLE_MASK for v in fp]
        for wi in range((len(sb) - window) // stride + 1):
            off = wi * stride
            h = 42
            for v in sb[off:off + window]:
                h = xxh64_long(v, h)
            yield (off, h)

    buckets: dict[tuple[int, int], list[str]] = {}
    for c in idx_ids:
        for k in keys(fps[c]):
            buckets.setdefault(k, []).append(c)
    cand: set[tuple[str, str]] = set()
    for c in new_ids:
        for k in keys(fps[c]):
            members = buckets.get(k, ())
            if len(members) <= max_bucket:
                for m in members:
                    if m != c:
                        cand.add((c, m))
    rows: dict[tuple[str, str], float] = {}
    for new, old in cand:
        fa, fb = fps[new], fps[old]
        m = min(len(fa), len(fb))
        if m == 0:
            continue
        diff = 0
        for va, vb in zip(fa[:m], fb[:m]):
            diff += bin((va ^ vb) & 0x7FFF).count("1")
        ber = diff / (15.0 * m)
        if ber <= ber_max:
            rows[(new, old)] = spark_round(ber, 6)
    by_fp: dict[tuple, list[str]] = {}
    for c, fp in fps.items():
        if fp:
            by_fp.setdefault(tuple(fp), []).append(c)
    for members in by_fp.values():
        for new in members:
            if side[new] != 1:
                continue
            for old in members:
                if side[old] == 0 and old != new:
                    rows[(new, old)] = 0.0
    out = {"new_id": [], "index_id": [], "ber_r": []}
    for (new, old) in sorted(rows):
        out["new_id"].append(new)
        out["index_id"].append(old)
        out["ber_r"].append(rows[(new, old)])
    return out


def _gate_consistency_expected(n=400, seed=42) -> dict:
    """Twin of the ``gate_consistency`` query: union-find closure of the
    verified audio near-dup pair graph composed with the pandas gate
    twin's per-clip decisions — per cluster, the keep/drop tally and
    the smallest member id on each side (boundary pins)."""
    from .synth import make_audio_dup_corpus, oracle_gate

    pairs = [(a, b) for a, b, _ in _audio_verified_pairs(n, seed)]
    comp = _uf_min_components(pairs)
    dec = oracle_gate(make_audio_dup_corpus(n, seed=seed)).set_index(
        "clip_id")["decision"]
    members: dict[str, list[str]] = {}
    for node, c in comp.items():
        members.setdefault(c, []).append(node)
    out = {
        "component": [], "cluster_size": [], "n_decided": [],
        "n_keep": [], "n_drop": [], "mixed": [], "first_keep": [],
        "first_drop": [],
    }
    for c in sorted(members):
        ms = sorted(members[c])
        keeps = [m for m in ms if dec[m] == "keep"]
        drops = [m for m in ms if dec[m] != "keep"]
        out["component"].append(c)
        out["cluster_size"].append(len(ms))
        out["n_decided"].append(len(ms))
        out["n_keep"].append(len(keeps))
        out["n_drop"].append(len(drops))
        out["mixed"].append(bool(keeps) and bool(drops))
        out["first_keep"].append(keeps[0] if keeps else None)
        out["first_drop"].append(drops[0] if drops else None)
    return out


def _audio_channel_expected(
    n_sessions=10, clips_per_session=6, seed=42, max_bucket=64
) -> dict:
    """Twin of ``audio_channel.channel_clusters`` over
    ``synth.make_audio_channel_corpus``: the noise-profile kernel is
    SHARED pure numpy (decode → VAD-inactive floor pool → log bands);
    the relational half — double-grid tilt bucketing, peak-band family
    split, per-bucket pair proposal with the skew guard, left-fold
    squared-L2 verify, union-find closure — is replayed as explicit
    Python loops.  A generation-time margin assert keeps every pair
    decision far from DIST2_MAX so engine float jitter cannot flip the
    accepted set."""
    from .functions.audio import _decode_i16
    from .functions.channel import (
        DIST2_MAX,
        channel_key_parts,
        noise_profile,
    )
    from .synth import make_audio_channel_corpus

    pdf = make_audio_channel_corpus(n_sessions, clips_per_session, seed)
    profs: dict[str, list[float]] = {}
    keys: dict[str, tuple[int, int, int]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        p, _nw = noise_profile(x, int(r["sr_hz"]))
        if p is None:
            continue
        pk, c0, c1, _tilt = channel_key_parts(p)
        profs[r["clip_id"]] = [float(v) for v in p]
        keys[r["clip_id"]] = (pk, c0, c1)
    emitted = {
        cid: [(0, c0, pk), (1, c1, pk)]
        for cid, (pk, c0, c1) in keys.items()
    }
    comp, sizes = _profile_cluster_replay(
        profs, emitted, DIST2_MAX, max_bucket
    )
    out = {"clip_id": [], "channel": [], "cluster_size": []}
    for node in sorted(comp):
        out["clip_id"].append(node)
        out["channel"].append(comp[node])
        out["cluster_size"].append(sizes[comp[node]])
    return out


def _profile_cluster_replay(
    profs: dict[str, list[float]],
    keys: dict[str, list[tuple[int, int, int]]],
    dist2_max: float,
    max_bucket: int,
) -> tuple[dict[str, str], dict[str, int]]:
    """Shared replay of the profile-cluster relational law (channel AND
    voice operators): bucketing on the emitted (grid, cell, family)
    keys, skew guard, left-fold squared-L2 verify with a
    generation-time margin assert, union-find closure.  Returns
    (component map, size map)."""
    pairs = _profile_pair_replay(profs, keys, dist2_max, max_bucket)
    comp = _uf_min_components(pairs)
    sizes: dict[str, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    return comp, sizes


def _profile_pair_replay(
    profs: dict[str, list[float]],
    keys: dict[str, list[tuple[int, int, int]]],
    dist2_max: float,
    max_bucket: int,
) -> list[tuple[str, str]]:
    """The ``bucket_verified_pairs`` law: emitted-key buckets, skew
    guard, explicit left-fold squared-L2 verify with a generation-time
    margin assert.  Sorted (a, b) pairs."""
    buckets: dict[tuple[int, int, int], list[str]] = {}
    for cid, emitted in keys.items():
        for k in emitted:
            buckets.setdefault(k, []).append(cid)
    cand: set[tuple[str, str]] = set()
    for members in buckets.values():
        if 1 < len(members) <= max_bucket:
            ms = sorted(set(members))
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand.add((ms[i], ms[j]))
    pairs: list[tuple[str, str]] = []
    for a, b in sorted(cand):
        d2 = 0.0
        for x1, y1 in zip(profs[a], profs[b]):
            d2 = d2 + (x1 - y1) * (x1 - y1)
        assert abs(d2 - dist2_max) > 1e-6, (a, b, d2)
        if d2 < dist2_max:
            pairs.append((a, b))
    return pairs


def _audio_augment_expected(n=150, seed=31) -> dict:
    """Twin of q_audio_augment: shared decode + augmentation kernels
    (byte determinism is the whole contract — producer and twin must
    agree BIT-FOR-BIT including the XXH64-seeded noise realization),
    payloads hashed with the from-spec XXH64 vs Spark's xxhash64."""
    from .functions.audio import _decode_i16
    from .functions.augment import DEFAULT_SPECS, augment_i16
    from .functions.xxh64 import xxh64_bytes
    from .synth import generate_clips

    def signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {c: [] for c in (
        "clip_id", "src_clip_id", "aug_name", "sr_hz", "dur_ms",
        "n_bytes", "payload_h")}
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            continue
        sr = r["sr_hz"]
        if not sr or sr <= 0:
            continue
        for name, params in DEFAULT_SPECS:
            y, dur_ms = augment_i16(
                np.asarray(q), int(sr), str(r["clip_id"]), name, params
            )
            payload = y.astype("<i2").tobytes()
            out["clip_id"].append(f"{r['clip_id']}~{name}")
            out["src_clip_id"].append(str(r["clip_id"]))
            out["aug_name"].append(name)
            out["sr_hz"].append(int(sr))
            out["dur_ms"].append(dur_ms)
            out["n_bytes"].append(len(payload))
            out["payload_h"].append(signed(xxh64_bytes(payload, 42)))
    return out


def _voice_pairs_replay(pdf, max_bucket=64) -> list[tuple[str, str]]:
    """Voice-axis pair law over any clips frame: shared decode + voice
    kernel, explicit 4-key (2×2 F0 × tilt grid) bucketing through
    ``_profile_pair_replay``.  Shared by the voice-cluster, identity,
    and voice-balance twins."""
    from .functions.audio import _decode_i16
    from .functions.voice import (
        DIST2_MAX as VOICE_DIST2_MAX,
        voice_key_parts,
        voice_profile,
    )

    profs: dict[str, list[float]] = {}
    keys: dict[str, list[tuple[int, int, int]]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        p, _nv, f0 = voice_profile(x, int(r["sr_hz"]))
        if p is None:
            continue
        fc0, fc1, tc0, tc1 = voice_key_parts(p, f0)
        profs[r["clip_id"]] = [float(v) for v in p]
        # grid = 2·gf + gt, cell = F0 cell, family = tilt cell — the
        # exact encoding voice_pairs uses
        fcs, tcs = (fc0, fc1), (tc0, tc1)
        keys[r["clip_id"]] = [
            (2 * gf + gt, fcs[gf], tcs[gt])
            for gf in (0, 1) for gt in (0, 1)
        ]
    return _profile_pair_replay(profs, keys, VOICE_DIST2_MAX, max_bucket)


def _voice_triplets_expected(
    n_speakers=8, clips_per_speaker=5, seed=42, pitch_twins=3,
    max_bucket=64,
) -> dict:
    """Twin of ``contrastive.voice_triplets`` over the pitch-twins
    corpus: shared decode + voice kernel; the F0-only bucket law,
    left-fold distances, per-anchor (dist2, id)-min selection for both
    pools, and the margin subtraction replayed explicitly.  A
    generation-time assert keeps every candidate far from the accept
    threshold so engine float jitter cannot flip a pool."""
    from .functions.audio import _decode_i16
    from .functions.voice import (
        DIST2_MAX as VOICE_DIST2_MAX,
        voice_key_parts,
        voice_profile,
    )
    from .synth import make_audio_voice_corpus

    pdf = make_audio_voice_corpus(
        n_speakers, clips_per_speaker, seed, pitch_twins=pitch_twins)
    profs: dict[str, list[float]] = {}
    keys: dict[str, list[tuple[int, int]]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        p, _nv, f0 = voice_profile(x, int(r["sr_hz"]))
        if p is None:
            continue
        fc0, fc1, _tc0, _tc1 = voice_key_parts(p, f0)
        profs[r["clip_id"]] = [float(v) for v in p]
        keys[r["clip_id"]] = [(0, fc0), (1, fc1)]
    buckets: dict[tuple[int, int], list[str]] = {}
    for cid, emitted in keys.items():
        for k in emitted:
            buckets.setdefault(k, []).append(cid)
    cand: set[tuple[str, str]] = set()
    for members in buckets.values():
        if 1 < len(members) <= max_bucket:
            ms = sorted(set(members))
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand.add((ms[i], ms[j]))
    pos: dict[str, tuple[float, str]] = {}
    neg: dict[str, tuple[float, str]] = {}
    for a, b in sorted(cand):
        d2 = 0.0
        for x1, y1 in zip(profs[a], profs[b]):
            d2 = d2 + (x1 - y1) * (x1 - y1)
        assert abs(d2 - VOICE_DIST2_MAX) > 1e-6, (a, b, d2)
        pool = pos if d2 < VOICE_DIST2_MAX else neg
        for anc, oth in ((a, b), (b, a)):
            cur = pool.get(anc)
            if cur is None or (d2, oth) < cur:
                pool[anc] = (d2, oth)
    out = {"anchor": [], "positive": [], "pos_dist2_r": [],
           "negative": [], "neg_dist2_r": [], "margin_r": []}
    for anc in sorted(set(pos) & set(neg)):
        pd2, pid = pos[anc]
        nd2, nid = neg[anc]
        out["anchor"].append(anc)
        out["positive"].append(pid)
        out["pos_dist2_r"].append(spark_round(pd2, 6))
        out["negative"].append(nid)
        out["neg_dist2_r"].append(spark_round(nd2, 6))
        out["margin_r"].append(spark_round(nd2 - pd2, 6))
    return out


def _voice_balance_expected(
    n_speakers=8, clips_per_speaker=5, seed=42, cap=2, bal_seed=9
) -> dict:
    """Twin of q_voice_balance: the voice-axis pair replay, union-find,
    singleton clusters for unpaired clips, per-cluster cap in
    (md5(id:seed), id) order — kept_ids pins exact membership."""
    import hashlib

    from .synth import make_audio_voice_corpus

    pdf = make_audio_voice_corpus(n_speakers, clips_per_speaker, seed)
    pairs = _voice_pairs_replay(pdf)
    comp = _uf_min_components(pairs)
    groups: dict[str, list[str]] = {}
    for cid in (str(c) for c in pdf["clip_id"]):
        groups.setdefault(comp.get(cid, cid), []).append(cid)
    out = {"cluster_rep": [], "n_members": [], "n_kept": [],
           "kept_ids": []}
    for rep in sorted(groups):
        members = groups[rep]
        order = sorted(
            members,
            key=lambda c: (
                hashlib.md5(f"{c}:{bal_seed}".encode()).hexdigest(), c
            ),
        )
        kept = sorted(order[:cap])
        out["cluster_rep"].append(rep)
        out["n_members"].append(len(members))
        out["n_kept"].append(len(kept))
        out["kept_ids"].append(",".join(kept))
    return out


def _audio_voice_expected(
    n_speakers=8, clips_per_speaker=5, seed=42, max_bucket=64
) -> dict:
    """Twin of ``audio_voice.voice_clusters`` over
    ``synth.make_audio_voice_corpus``: decode + harmonic-envelope kernel
    SHARED pure numpy; key law (2×2 composed log2-F0 × envelope-tilt
    double grids) and the whole relational half replayed through the
    shared explicit-Python pair replay the channel twin uses."""
    from .synth import make_audio_voice_corpus

    pdf = make_audio_voice_corpus(n_speakers, clips_per_speaker, seed)
    pairs = _voice_pairs_replay(pdf, max_bucket)
    comp = _uf_min_components(pairs)
    sizes = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    out = {"clip_id": [], "speaker": [], "cluster_size": []}
    for node in sorted(comp):
        out["clip_id"].append(node)
        out["speaker"].append(comp[node])
        out["cluster_size"].append(sizes[comp[node]])
    return out


def _identity_pairs_replay(
    pdf, max_bucket=64
) -> dict[str, list[tuple[str, str]]]:
    """The three identity pair laws over any clips frame (shared
    kernels, explicit-Python bucket/verify replays).  Returns pairs per
    axis; used by the identity-split, leakage, and drift twins."""
    from .functions.audio import _decode_i16
    from .functions.channel import (
        DIST2_MAX as CH_DIST2,
        channel_key_parts,
        noise_profile,
    )
    from .functions.spectral import fingerprint_i32
    from .functions.voice import (
        DIST2_MAX as VO_DIST2,
        voice_key_parts,
        voice_profile,
    )

    fps: dict[str, list[int]] = {}
    chp: dict[str, list[float]] = {}
    chk: dict[str, list[tuple[int, int, int]]] = {}
    vop: dict[str, list[float]] = {}
    vok: dict[str, list[tuple[int, int, int]]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        cid = r["clip_id"]
        fps[cid] = [int(v) for v in fingerprint_i32(x)]
        cp, _nw = noise_profile(x, int(r["sr_hz"]))
        if cp is not None:
            pk, c0, c1, _t = channel_key_parts(cp)
            chp[cid] = [float(v) for v in cp]
            chk[cid] = [(0, c0, pk), (1, c1, pk)]
        vp, _nv, f0 = voice_profile(x, int(r["sr_hz"]))
        if vp is not None:
            fc0, fc1, tc0, tc1 = voice_key_parts(vp, f0)
            vop[cid] = [float(v) for v in vp]
            fcs, tcs = (fc0, fc1), (tc0, tc1)
            vok[cid] = [
                (2 * gf + gt, fcs[gf], tcs[gt])
                for gf in (0, 1) for gt in (0, 1)
            ]
    # exact-digest pre-pass (engine: fingerprint_exact_pairs): families
    # with a bit-identical fingerprint sequence link rep→member — the
    # law that keeps exact re-uploads together even when LSH buckets go
    # hot.  The twin groups by the tuple itself; the engine's xxhash64
    # digest is only a grouping key, so the VALUE never matters.
    fams: dict[tuple, list[str]] = {}
    for cid, fp in fps.items():
        if fp:
            fams.setdefault(tuple(fp), []).append(cid)
    exact = [
        (min(members), m)
        for members in fams.values() if len(members) > 1
        for m in members if m != min(members)
    ]
    # payload-digest edges (engine: xxhash64 of the raw bytes carried
    # through identity_features): byte-identical copies link even with
    # zero kernel evidence.  The twin groups by the bytes themselves —
    # the digest is only a grouping key.
    pfams: dict[bytes, list[str]] = {}
    for _, r in pdf.iterrows():
        if r["bytes"] is not None:
            pfams.setdefault(bytes(r["bytes"]), []).append(r["clip_id"])
    exact += [
        (min(members), m)
        for members in pfams.values() if len(members) > 1
        for m in members if m != min(members)
    ]
    return {
        "content": exact + [(a, b) for a, b, _ in
                            _fp_pair_replay(fps, max_bucket=max_bucket)],
        "channel": _profile_pair_replay(chp, chk, CH_DIST2, max_bucket),
        "voice": _profile_pair_replay(vop, vok, VO_DIST2, max_bucket),
    }


def _audio_identity_split_expected(
    seed=42, val_frac=0.25, split_seed=11, max_bucket=64
) -> dict:
    """Twin of ``audio_identity.identity_split`` over
    ``synth.make_audio_identity_corpus``: the three kernels are SHARED
    pure numpy; the three pair laws replay through the explicit-Python
    ``_fp_pair_replay`` / ``_profile_pair_replay`` helpers, the union
    closes with the union-find, and the split replays the portable md5
    law (hashlib vs Spark's ``sample_order_col``) against the same
    128-bit threshold literal."""
    import hashlib

    from .operators.sampling import fraction_threshold_hex
    from .synth import make_audio_identity_corpus

    pdf = make_audio_identity_corpus(seed)
    axis_pairs = _identity_pairs_replay(pdf, max_bucket)
    pairs = (axis_pairs["content"] + axis_pairs["channel"]
             + axis_pairs["voice"])
    comp = _uf_min_components(pairs)
    sizes: dict[str, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    thresh = fraction_threshold_hex(val_frac)
    out = {"clip_id": [], "component": [], "cluster_size": [],
           "split": []}
    for cid in sorted(pdf["clip_id"]):
        rep = comp.get(cid, cid)
        h = hashlib.md5(f"{rep}:{split_seed}".encode()).hexdigest()
        out["clip_id"].append(cid)
        out["component"].append(rep)
        out["cluster_size"].append(sizes.get(rep, 1))
        out["split"].append("val" if h < thresh else "train")
    return out


def _audio_split_drift_expected(
    seed=42, val_frac=0.25, split_seed=11, max_bucket=64
) -> dict:
    """Twin of q_audio_split_drift: both assignments replayed through
    the shared identity-pair + md5 law (day-1 corpus vs day-1+day-2),
    then the per-clip status compare.  Generation-time asserts pin the
    DESIGNED drift: sg00 moves (its val singleton merges into D's train
    component via the bridge), day-2 clips are added, everything else
    is stable."""
    import hashlib

    from .operators.sampling import fraction_threshold_hex
    from .synth import make_audio_identity_corpus

    thresh = fraction_threshold_hex(val_frac)

    def assign(pdf):
        ap = _identity_pairs_replay(pdf, max_bucket)
        comp = _uf_min_components(
            ap["content"] + ap["channel"] + ap["voice"]
        )
        out = {}
        for cid in pdf["clip_id"]:
            rep = comp.get(cid, cid)
            h = hashlib.md5(f"{rep}:{split_seed}".encode()).hexdigest()
            out[cid] = (rep, "val" if h < thresh else "train")
        return out

    both = make_audio_identity_corpus(seed, with_day2=True)
    day1 = both[both.ingest_day != "2026-01-03"]
    old = assign(day1)
    new = assign(both)
    out = {"clip_id": [], "status": [], "old_split": [],
           "new_split": [], "old_component": [], "new_component": []}
    for cid in sorted(new):
        rep_n, sp_n = new[cid]
        if cid in old:
            rep_o, sp_o = old[cid]
            status = "stable" if sp_o == sp_n else "moved"
        else:
            rep_o, sp_o, status = None, None, "added"
        out["clip_id"].append(cid)
        out["status"].append(status)
        out["old_split"].append(sp_o)
        out["new_split"].append(sp_n)
        out["old_component"].append(rep_o)
        out["new_component"].append(rep_n)
    by_status = {}
    for cid, st in zip(out["clip_id"], out["status"]):
        by_status.setdefault(st, []).append(cid)
    assert by_status.get("moved") == ["sg00"], by_status.get("moved")
    assert sorted(by_status.get("added", [])) == ["nw00", "zz_bridge"]
    return out


def _training_manifest_expected(
    n=1200, seed=42, val_frac=0.25, split_seed=11, max_bucket=64
) -> dict:
    """Twin of q_training_manifest: gate decisions from the pandas gate
    oracle, split from the identity-axes replay + md5 law over the SAME
    generate_clips frame, joined per clip."""
    import hashlib

    from .operators.sampling import fraction_threshold_hex
    from .synth import generate_clips

    gate_pdf = _clips_oracle_frame(n, seed)
    decision = dict(zip(gate_pdf["clip_id"], gate_pdf["decision"]))
    clips = generate_clips(n, seed=seed)
    ap = _identity_pairs_replay(clips, max_bucket)
    comp = _uf_min_components(
        ap["content"] + ap["channel"] + ap["voice"]
    )
    thresh = fraction_threshold_hex(val_frac)
    out = {"clip_id": [], "decision": [], "split": [], "component": [],
           "dur_ms": [], "train_ready": []}
    for _, r in clips.sort_values("clip_id").iterrows():
        cid = r["clip_id"]
        rep = comp.get(cid, cid)
        h = hashlib.md5(f"{rep}:{split_seed}".encode()).hexdigest()
        split = "val" if h < thresh else "train"
        out["clip_id"].append(cid)
        out["decision"].append(decision[cid])
        out["split"].append(split)
        out["component"].append(rep)
        out["dur_ms"].append(int(r["dur_ms"]))
        out["train_ready"].append(
            decision[cid] == "keep" and split == "train"
        )
    return out


def _temperature_a07_expected(
    sf_dir: str, total_budget=60_000, alpha_p=7, alpha_q=10,
    scale_bits=20, seed=17,
) -> dict:
    """Twin of q_temperature_a07 (``temperature_audit`` at α = 7/10):
    INDEPENDENT integer replay — the q-th root by pure bisection (the
    engine uses Newton; same spec, different algorithm), budgets by
    exact rational arithmetic, selection by hashlib md5 prefix order.
    No float ``pow`` anywhere on either side: that is the claim."""
    import hashlib

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    rows = list(zip(t.column("doc_id").to_pylist(),
                    t.column("lang").to_pylist(),
                    t.column("n_chars").to_pylist()))

    def bisect_root(x: int, k: int) -> int:
        lo, hi = 0, 1
        while hi ** k <= x:
            hi <<= 1
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if mid ** k <= x:
                lo = mid
            else:
                hi = mid
        return lo

    half = scale_bits // 2
    weights: dict[str | None, int] = {}
    for _, lang, nc in rows:
        if nc is not None:
            weights[lang] = weights.get(lang, 0) + int(nc)
        else:
            weights.setdefault(lang, 0)
    qs = {
        lg: bisect_root((max(n, 0) ** alpha_p) << (alpha_q * half),
                        alpha_q)
        for lg, n in weights.items()
    }
    qsum = sum(qs.values())
    budgets = {lg: (total_budget * q // qsum if qsum else 0)
               for lg, q in qs.items()}
    per_lang: dict[str | None, list] = {}
    for did, lang, nc in rows:
        h = hashlib.md5(f"{did}:{seed}".encode()).hexdigest()
        per_lang.setdefault(lang, []).append((h, did, nc))
    got: dict[str | None, tuple[int, int]] = {}
    for lg, docs in per_lang.items():
        cum = 0
        n_sel = sel_w = 0
        for _h, _did, nc in sorted(docs):
            if nc is None:
                continue
            if cum < budgets[lg]:
                n_sel += 1
                sel_w += int(nc)
            cum += int(nc)
        got[lg] = (n_sel, sel_w)
    out = {"stratum": [], "avail_weight": [], "q": [], "budget": [],
           "n_sel": [], "sel_weight": [], "filled": []}
    for lg in sorted(weights, key=lambda x: (x is None, x)):
        n_sel, sel_w = got.get(lg, (0, 0))
        out["stratum"].append(lg)
        out["avail_weight"].append(weights[lg])
        out["q"].append(qs[lg])
        out["budget"].append(budgets[lg])
        out["n_sel"].append(n_sel)
        out["sel_weight"].append(sel_w)
        out["filled"].append(sel_w >= budgets[lg])
    return out


def _content_hot_corpus(seed=42):
    """60 base clips + one clip replicated 80× (exact copies, distinct
    ids) — every window bucket of the replicated content exceeds the
    64-entry guard."""
    import pandas as pd

    from .synth import generate_clips

    pdf = generate_clips(60, seed=seed)
    rep = pd.concat([pdf.iloc[[0]]] * 80, ignore_index=True)
    rep["clip_id"] = [f"hot{i:03d}" for i in range(80)]
    return pd.concat([pdf, rep], ignore_index=True)


def _content_hot_buckets_expected(seed=42, window=3, stride=1,
                                  max_bucket=64) -> dict:
    """Twin of q_content_hot_buckets: the fingerprint bucket-key law
    (stable-byte XXH64 window fold, seed 42 — the shared
    ``_fp_pair_replay`` construction) aggregated to over-guard buckets
    in pure Python."""
    from .functions.audio import _decode_i16
    from .functions.spectral import STABLE_MASK, STABLE_SHIFT
    from .functions.spectral import fingerprint_i32

    pdf = _content_hot_corpus(seed)
    buckets: dict[tuple[int, int], int] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        fp = [int(v) for v in fingerprint_i32(x)]
        if len(fp) < window:
            continue
        sb = [(v >> STABLE_SHIFT) & STABLE_MASK for v in fp]
        for wi in range((len(sb) - window) // stride + 1):
            off = wi * stride
            h = 42
            for v in sb[off:off + window]:
                h = xxh64_long(v, h)
            buckets[(off, h)] = buckets.get((off, h), 0) + 1
    out = {"off": [], "bh": [], "n_members": []}
    for (off, h), n in sorted(buckets.items()):
        if n > max_bucket:
            out["off"].append(off)
            out["bh"].append(h)  # xxh64_long already returns signed
            out["n_members"].append(n)
    return out


def _eval_coverage_expected(**kw) -> dict:
    """Twin of q_eval_coverage: the eval-manifest replay aggregated per
    language in plain Python (counts, candidate/selected ms, capped)."""
    em = _eval_manifest_expected(**kw)
    cap_ms = kw.get("cap_ms", 30_000)
    agg: dict[str, list] = {}
    for lg, dur, in_ev in zip(em["lang_pred"], em["dur_ms"],
                              em["in_eval"]):
        row = agg.setdefault(lg, [0, 0, 0, 0])
        row[0] += 1
        row[1] += 1 if in_ev else 0
        row[2] += dur
        row[3] += dur if in_ev else 0
    out = {"lang_pred": [], "n_candidates": [], "n_in_eval": [],
           "candidate_ms": [], "eval_ms": [], "cap_ms": [], "capped": []}
    for lg in sorted(agg):
        n_c, n_e, c_ms, e_ms = agg[lg]
        out["lang_pred"].append(lg)
        out["n_candidates"].append(n_c)
        out["n_in_eval"].append(n_e)
        out["candidate_ms"].append(c_ms)
        out["eval_ms"].append(e_ms)
        out["cap_ms"].append(cap_ms)
        out["capped"].append(n_e < n_c)
    return out


def _gate_f1_expected(n=1200, seed=42) -> dict:
    """Twin of q_gate_f1: the confusion matrix of the ENGINE's
    predicted decisions (the pandas gate replay — the same twin the
    per-row clips_gate hash rides on) against the reference labels
    (the pandas gate itself).  Twin-predicted engine == labels, so the
    expected matrix is diagonal and f1 exactly 1.0; the driver's hash
    then certifies the ENGINE still sits on that diagonal.  The float
    tail replays the engine's IEEE chain operation-for-operation."""
    pdf = _clips_oracle_frame(n, seed)
    n_rows = len(pdf)
    tp = int((pdf["decision"] == "keep").sum())
    tn = n_rows - tp
    fp = fn = 0
    keep_rate = float(tp + fp) / float(n_rows)
    f1 = (2.0 * float(tp)) / ((2.0 * tp + fp) + fn)
    return {
        "n": [n_rows], "tp": [tp], "fp": [fp], "fn": [fn], "tn": [tn],
        "keep_rate": [keep_rate], "f1": [f1],
    }


def _eval_manifest_expected(
    n=1200, seed=42, val_frac=0.25, split_seed=11, max_bucket=64,
    cap_ms=30_000, sel_seed=5,
) -> dict:
    """Twin of q_eval_manifest: the training-manifest replay (pandas
    gate + identity-axes union-find + md5 split law) narrowed to the
    keep∧val candidates, then the per-language balance cap replayed
    EXPLICITLY — hashlib md5 prefix order, running duration, boundary
    clip included (cum_before < cap)."""
    import hashlib

    from .operators.sampling import fraction_threshold_hex
    from .synth import generate_clips

    gate_pdf = _clips_oracle_frame(n, seed)
    decision = dict(zip(gate_pdf["clip_id"], gate_pdf["decision"]))
    lang = dict(zip(gate_pdf["clip_id"], gate_pdf["lang_pred"]))
    clips = generate_clips(n, seed=seed)
    ap = _identity_pairs_replay(clips, max_bucket)
    comp = _uf_min_components(ap["content"] + ap["channel"] + ap["voice"])
    thresh = fraction_threshold_hex(val_frac)
    cand = []
    for _, r in clips.iterrows():
        cid = r["clip_id"]
        rep = comp.get(cid, cid)
        h = hashlib.md5(f"{rep}:{split_seed}".encode()).hexdigest()
        if decision[cid] == "keep" and h < thresh:
            order = hashlib.md5(f"{cid}:{sel_seed}".encode()).hexdigest()
            cand.append((lang[cid], order, cid, rep, int(r["dur_ms"])))
    out = {"clip_id": [], "lang_pred": [], "component": [], "dur_ms": [],
           "cum_before_ms": [], "in_eval": []}
    rows = []
    by_lang: dict[str, int] = {}
    for lg, _order, cid, rep, dur in sorted(cand):
        before = by_lang.get(lg, 0)
        by_lang[lg] = before + dur
        rows.append((cid, lg, rep, dur, before, before < cap_ms))
    for cid, lg, rep, dur, before, in_eval in sorted(rows):
        out["clip_id"].append(cid)
        out["lang_pred"].append(lg)
        out["component"].append(rep)
        out["dur_ms"].append(dur)
        out["cum_before_ms"].append(before)
        out["in_eval"].append(in_eval)
    return out


def _audio_split_leakage_expected(
    seed=42, naive_frac=0.3, naive_seed=7, max_bucket=64
) -> dict:
    """Twin of ``audio_identity.split_leakage_audit`` over the identity
    corpus carrying a NAIVE per-clip i.i.d. split (the portable md5 law
    replayed with hashlib): per-axis pair counts, cross-split pair
    counts, and distinct leaked clips."""
    import hashlib

    from .operators.sampling import fraction_threshold_hex
    from .synth import make_audio_identity_corpus

    pdf = make_audio_identity_corpus(seed)
    thresh = fraction_threshold_hex(naive_frac)
    split = {
        cid: (
            "val"
            if hashlib.md5(f"{cid}:{naive_seed}".encode()).hexdigest()
            < thresh else "train"
        )
        for cid in pdf["clip_id"]
    }
    axis_pairs = _identity_pairs_replay(pdf, max_bucket)
    out = {"axis": [], "n_pairs": [], "n_cross_pairs": [],
           "n_cross_clips": []}
    for axis in sorted(axis_pairs):
        pairs = axis_pairs[axis]
        crossed = [(a, b) for a, b in pairs if split[a] != split[b]]
        clips = set()
        for a, b in crossed:
            clips.add(a)
            clips.add(b)
        out["axis"].append(axis)
        out["n_pairs"].append(len(pairs))
        out["n_cross_pairs"].append(len(crossed))
        out["n_cross_clips"].append(len(clips))
    return out


def _audio_multispeaker_expected(seed=42) -> dict:
    """Twin of ``audio_diarize.clip_voices`` + ``multispeaker_flags``
    over ``synth.make_audio_dialog_corpus``: decode + segment-voice
    kernel SHARED pure numpy (hash coverage is the Spark plumbing:
    mapInArrow batching, schema, flag layer, ordering); a
    generation-time assert pins every clip to its corpus-designed voice
    count so kernel drift cannot silently re-materialize."""
    from .functions.audio import _decode_i16
    from .functions.voice import segment_voices
    from .synth import make_audio_dialog_corpus

    pdf = make_audio_dialog_corpus(seed)
    out = {"clip_id": [], "ok": [], "n_segments": [],
           "n_voiced_segments": [], "n_voices": [],
           "max_link_d2_r": [], "min_cross_d2_r": [],
           "multi_speaker": []}
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            ok = True
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
            ok = False
        st = segment_voices(x, int(r["sr_hz"]))
        if r["defect"].startswith("voices_"):
            assert st["n_voices"] == int(r["defect"].split("_")[1]), (
                r["clip_id"], st,
            )
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_segments"].append(st["n_segments"])
        out["n_voiced_segments"].append(st["n_voiced_segments"])
        out["n_voices"].append(st["n_voices"])
        out["max_link_d2_r"].append(round(st["max_link_d2"], 6))
        out["min_cross_d2_r"].append(round(st["min_cross_d2"], 6))
        out["multi_speaker"].append(st["n_voices"] >= 2)
    return out


def _pq_topk_expected(vecs, m=16, ksub=256, iters=10, seed=11, sample=2048,
                      k=3) -> dict:
    """Twin of ``similarity.fit_pq_codebooks`` + ``pq_encode`` +
    ``pq_topk`` (queries = vec_id < 10): the fit replays the identical
    numpy ops in the same order (so the learned codebooks match the
    driver's), encoding replays argmin per subspace, and the ADC scores
    are rebuilt with explicit per-subspace Python sums; the (adc desc,
    n_id) tie law and top-k boundary separation are asserted at
    generation time so engine float jitter cannot flip ranks."""
    vmap = {vid: np.asarray(v, dtype=np.float64) for vid, v in vecs}
    train_ids = sorted(vmap)[:sample]
    x = np.array([vmap[i] for i in train_ids], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub: (j + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    ids = sorted(vmap)
    mm = np.array([vmap[i] for i in ids], dtype=np.float64)
    mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
    codes = {}
    for ri, vid in enumerate(ids):
        cs = []
        for j in range(m):
            xs = mm[ri, j * dsub: (j + 1) * dsub]
            d2 = ((books[j] - xs[None, :]) ** 2).sum(axis=1)
            cs.append(int(np.argmin(d2)))
        codes[vid] = cs
    out = {"q_id": [], "rank": [], "n_id": [], "adc_r": []}
    for qi, q_id in enumerate(ids):
        if q_id >= 10:
            continue
        qv = mm[qi].reshape(m, dsub)
        lut = np.einsum("jd,jkd->jk", qv, books)
        scored = []
        for n_id in ids:
            if n_id == q_id:
                continue
            s = 0.0
            for j in range(m):
                s += float(lut[j, codes[n_id][j]])
            scored.append((s, n_id))
        scored.sort(key=lambda t: (-t[0], t[1]))
        # rank stability across engines: the kth score must separate
        # from the (k+1)th by more than float jitter
        assert scored[k - 1][0] - scored[k][0] > 1e-9, (q_id, scored[:k + 1])
        for rank, (s, n_id) in enumerate(scored[:k], start=1):
            out["q_id"].append(q_id)
            out["rank"].append(rank)
            out["n_id"].append(n_id)
            out["adc_r"].append(spark_round(s, 6))
    _assert_off_rounding_boundary(
        [v for v in out["adc_r"] if v is not None], 6)
    return out


def _crossmodal_dedup_expected(n=300, seed=42, relabel_every=3,
                               text_threshold=0.5, ber_max=0.30) -> dict:
    """Twin of ``crossmodal_dedup.transcript_blocked_pairs``: transcript
    MinHash banding via the from-spec XXH64 twin (string clip ids),
    exact token-set Jaccard verify, then the fingerprint BER replayed
    with per-word popcount loops over the shared kernel's output —
    the cross-modal join itself (text blocks, audio decides) replayed
    end to end in pure Python."""
    from .functions.audio import _decode_i16
    from .functions.spectral import fingerprint_i32
    from .synth import make_audio_dup_corpus

    pdf = make_audio_dup_corpus(n, seed=seed, relabel_every=relabel_every)
    docs = [(r["clip_id"], r["transcript"]) for _, r in pdf.iterrows()]
    cands = _minhash_candidates(docs)
    toks = {cid: set(_tokens(t)) for cid, t in docs}
    fps: dict[str, list[int]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        fps[r["clip_id"]] = [int(v) for v in fingerprint_i32(x)]
    rows = []
    raw_j: list[float] = []
    raw_b: list[float] = []
    for a, b in sorted(cands):
        ta, tb = toks[a], toks[b]
        union = len(ta | tb)
        jac = (len(ta & tb) / union) if union else 0.0
        if jac < text_threshold:
            continue
        fa, fb = fps[a], fps[b]
        m = min(len(fa), len(fb))
        if m > 0:
            diff = 0
            for va, vb in zip(fa[:m], fb[:m]):
                diff += bin((va ^ vb) & 0x7FFF).count("1")
            ber = diff / (15.0 * m)
            match = ber <= ber_max
            raw_b.append(ber)
        else:
            ber, match = None, False
        raw_j.append(jac)
        rows.append((a, b, spark_round(jac, 6),
                     spark_round(ber, 6) if ber is not None else None,
                     match))
    _assert_off_rounding_boundary(raw_j, 6)
    _assert_off_rounding_boundary(raw_b, 6)
    return {
        "id_a": [r[0] for r in rows],
        "id_b": [r[1] for r in rows],
        "jaccard_r": [r[2] for r in rows],
        "ber_r": [r[3] for r in rows],
        "audio_match": [r[4] for r in rows],
    }


def _audio_noise_expected(
    n=200, seed=42, window=3, stride=1, ber_max=0.30,
    fp_max_bucket=64,
    lm_configs=((64, 45), (256, 45), (256, 20)),
) -> dict:
    """Twin of the ``audio_noise_robustness`` query: BOTH matchers
    replayed in pure Python over ``make_audio_noise_corpus`` — the
    fingerprint bucket join + popcount BER (as in the dedup twin) and
    the landmark vote with its hot-hash guard + adjacent-bin paired
    scoring (as in the constellation twin) AT EVERY swept (guard,
    threshold) config — then the per-config/per-SNR recall and
    coincidence accounting with exact integers."""
    from .functions.audio import _decode_i16
    from .functions.spectral import (
        STABLE_MASK,
        STABLE_SHIFT,
        constellation_landmarks,
        fingerprint_i32,
    )
    from .functions.xxh64 import xxh64_long
    from .synth import make_audio_noise_corpus

    pdf = make_audio_noise_corpus(n, seed=seed)
    fps: dict[str, list[int]] = {}
    lm_buckets: dict[int, list[tuple[str, int]]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        fps[r["clip_id"]] = [int(v) for v in fingerprint_i32(x)]
        # clip_landmarks feeds the RAW int16 stream to the landmark
        # kernel (peak picking is scale-invariant but match it exactly)
        hs, ts = constellation_landmarks(x)
        for h, t in zip(hs, ts):
            lm_buckets.setdefault(int(h), []).append((r["clip_id"], int(t)))
    # matcher 1: fingerprint window buckets + BER verify
    buckets: dict[tuple[int, int], list[str]] = {}
    for cid, fp in fps.items():
        if len(fp) < window:
            continue
        sb = [(v >> STABLE_SHIFT) & STABLE_MASK for v in fp]
        for wi in range((len(sb) - window) // stride + 1):
            off = wi * stride
            h = 42
            for v in sb[off:off + window]:
                h = xxh64_long(v, h)
            buckets.setdefault((off, h), []).append(cid)
    fp_pairs: set[tuple[str, str]] = set()
    cand: set[tuple[str, str]] = set()
    for members in buckets.values():
        if 1 < len(members) <= fp_max_bucket:
            ms = sorted(set(members))
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand.add((ms[i], ms[j]))
    for a, b in cand:
        fa, fb = fps[a], fps[b]
        m = min(len(fa), len(fb))
        if m == 0:
            continue
        diff = 0
        for va, vb in zip(fa[:m], fb[:m]):
            diff += bin((va ^ vb) & 0x7FFF).count("1")
        if diff / (15.0 * m) <= ber_max:
            fp_pairs.add((a, b))
    # seeded pair list
    seeded: dict[tuple[str, str], int] = {}
    for _, r in pdf.iterrows():
        d = str(r["defect"])
        if d.startswith("noise_"):
            base = r["clip_id"].rsplit("_n", 1)[0]
            seeded[(base, r["clip_id"])] = int(d.split("_")[1])
    out = {
        "max_bucket": [], "min_votes": [], "snr_db": [], "n_injected": [],
        "fp_recovered": [], "lm_recovered": [], "lm_extra_pairs": [],
        "fp_recall_r": [], "lm_recall_r": [],
    }
    for mb, mv in lm_configs:
        # matcher 2: landmark votes with hot-hash guard + paired scoring
        votes: dict[tuple[str, str, int], int] = {}
        for members in lm_buckets.values():
            if not (1 < len(members) <= mb):
                continue
            for a, ta in members:
                for b, tb in members:
                    if a < b:
                        key = (a, b, ta - tb)
                        votes[key] = votes.get(key, 0) + 1
        lm_best: dict[tuple[str, str], int] = {}
        for (a, b, off), v in votes.items():
            paired = v + max(
                votes.get((a, b, off - 1), 0), votes.get((a, b, off + 1), 0)
            )
            if paired > lm_best.get((a, b), 0):
                lm_best[(a, b)] = paired
        lm_pairs = {p for p, v in lm_best.items() if v >= mv}
        extra = sum(1 for p in lm_pairs if p not in seeded)
        per: dict[int, dict[str, int]] = {}
        for pair, snr in seeded.items():
            st = per.setdefault(snr, {"n": 0, "fp": 0, "lm": 0})
            st["n"] += 1
            st["fp"] += pair in fp_pairs
            st["lm"] += pair in lm_pairs
        for snr in sorted(per, reverse=True):
            st = per[snr]
            out["max_bucket"].append(mb)
            out["min_votes"].append(mv)
            out["snr_db"].append(snr)
            out["n_injected"].append(st["n"])
            out["fp_recovered"].append(st["fp"])
            out["lm_recovered"].append(st["lm"])
            out["lm_extra_pairs"].append(extra)
            out["fp_recall_r"].append(spark_round(st["fp"] / st["n"], 4))
            out["lm_recall_r"].append(spark_round(st["lm"] / st["n"], 4))
    return out


def _audio_dedup_resolve_expected(n=400, seed=42) -> dict:
    """Twin of the ``audio_dedup_resolve`` query: union-find over the
    pure-Python verified-pair twin + the survivor rank law (decodable,
    codec fidelity pcm16>wav>mulaw, sample count, smallest id) replayed
    with exact integers per clip."""
    from .functions.audio import _decode_i16
    from .synth import make_audio_dup_corpus

    pairs = [(a, b) for a, b, _ in _audio_verified_pairs(n, seed)]
    comp = _uf_min_components(pairs)
    sizes: dict[str, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    pdf = make_audio_dup_corpus(n, seed=seed)
    pref: dict[str, int] = {}
    for _, r in pdf.iterrows():
        cid = r["clip_id"]
        if cid not in comp:
            continue
        try:
            ns = int(len(_decode_i16(r["bytes"], r["codec"], r["sr_hz"])))
        except (ValueError, TypeError):
            ns = 0
        rank = {"pcm16": 2, "wav": 1}.get(r["codec"], 0)
        pref[cid] = rank * 10_000_000_000 + ns if ns > 0 else -1
    winners: dict[str, str] = {}
    for node, c in comp.items():
        cur = winners.get(c)
        if cur is None or (-pref[node], node) < (-pref[cur], cur):
            winners[c] = node
    out = {"clip_id": [], "component": [], "cluster_size": [], "keep": []}
    for node in sorted(comp, key=lambda x: (comp[x], x)):
        out["clip_id"].append(node)
        out["component"].append(comp[node])
        out["cluster_size"].append(sizes[comp[node]])
        out["keep"].append(node == winners[comp[node]])
    return out


def _audio_excerpt_expected(
    n=400, seed=42, window=3, stride=1, ber_max=0.30, max_bucket=64,
    min_votes=2, min_overlap=8,
) -> dict:
    """Twin of ``audio_dedup.fingerprint_shift_match`` over
    ``synth.make_audio_excerpt_corpus``: buckets keyed on the window hash
    alone, per-pair shift voting with the (votes, -|shift|, shift)
    lexicographic tiebreak, aligned-overlap BER by popcount loop."""
    from .functions.audio import _decode_i16
    from .functions.spectral import (
        STABLE_MASK,
        STABLE_SHIFT,
        fingerprint_i32,
    )
    from .synth import make_audio_excerpt_corpus

    pdf = make_audio_excerpt_corpus(n, seed=seed)
    fps: dict[str, list[int]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        fps[r["clip_id"]] = [int(v) for v in fingerprint_i32(x)]
    buckets: dict[int, list[tuple[str, int]]] = {}
    for cid, fp in fps.items():
        if len(fp) < window:
            continue
        sb = [(v >> STABLE_SHIFT) & STABLE_MASK for v in fp]
        for wi in range((len(sb) - window) // stride + 1):
            off = wi * stride
            h = 42
            for v in sb[off:off + window]:
                h = xxh64_long(v, h)
            buckets.setdefault(h, []).append((cid, off))
    votes: dict[tuple[str, str, int], int] = {}
    for members in buckets.values():
        if not (1 < len(members) <= max_bucket):
            continue
        for a, oa in members:
            for b, ob in members:
                if a < b:
                    key = (a, b, oa - ob)
                    votes[key] = votes.get(key, 0) + 1
    best: dict[tuple[str, str], tuple] = {}
    for (a, b, shift), v in votes.items():
        rank = (v, -abs(shift), shift)
        cur = best.get((a, b))
        if cur is None or rank > cur[0]:
            best[(a, b)] = (rank, shift, v)
    rows = []
    for (a, b), (_, shift, v) in best.items():
        if v < min_votes:
            continue
        fa, fb = fps[a], fps[b]
        a0, b0 = max(shift, 0), max(-shift, 0)
        m = min(len(fa) - a0, len(fb) - b0)
        if m < min_overlap:
            continue
        diff = 0
        for va, vb in zip(fa[a0:a0 + m], fb[b0:b0 + m]):
            diff += bin((va ^ vb) & 0x7FFF).count("1")
        ber = diff / (15.0 * m)
        if ber <= ber_max:
            rows.append((a, b, shift, v, m, spark_round(ber, 6)))
    rows.sort()
    return {
        "id_a": [r[0] for r in rows],
        "id_b": [r[1] for r in rows],
        "shift": [r[2] for r in rows],
        "votes": [r[3] for r in rows],
        "overlap": [r[4] for r in rows],
        "ber_r": [r[5] for r in rows],
    }


def _audio_constellation_expected(
    n=400, seed=42, min_votes=45, max_bucket=64
) -> dict:
    """Twin of ``audio_dedup.clip_landmarks`` + ``landmark_match`` over the
    ARBITRARY-offset excerpt corpus: hash buckets as plain dicts, vote
    counting, adjacent-bin paired scoring, and the (votes, -|offset|,
    offset) tiebreak in pure Python."""
    from .functions.audio import _decode_i16
    from .functions.spectral import constellation_landmarks
    from .synth import make_audio_excerpt_corpus

    pdf = make_audio_excerpt_corpus(n, seed=seed, align_hop=False)
    buckets: dict[int, list[tuple[str, int]]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        hs, ts = constellation_landmarks(x)
        for h, t in zip(hs, ts):
            buckets.setdefault(int(h), []).append((r["clip_id"], int(t)))
    votes: dict[tuple[str, str, int], int] = {}
    for members in buckets.values():
        if not (1 < len(members) <= max_bucket):
            continue
        for a, ta in members:
            for b, tb in members:
                if a < b:
                    key = (a, b, ta - tb)
                    votes[key] = votes.get(key, 0) + 1
    best: dict[tuple[str, str], tuple] = {}
    for (a, b, off), v in votes.items():
        paired = v + max(
            votes.get((a, b, off - 1), 0), votes.get((a, b, off + 1), 0)
        )
        rank = (paired, -abs(off), off)
        cur = best.get((a, b))
        if cur is None or rank > cur[0]:
            best[(a, b)] = (rank, off, paired)
    rows = sorted(
        (a, b, off, v)
        for (a, b), (_, off, v) in best.items()
        if v >= min_votes
    )
    return {
        "id_a": [r[0] for r in rows],
        "id_b": [r[1] for r in rows],
        "offset_frames": [r[2] for r in rows],
        "votes": [r[3] for r in rows],
    }


def _audio_spectral_expected(n=300, seed=42) -> dict:
    """Twin of ``audio_features.clip_spectral`` + the per-clip rounding the
    query applies (shared deterministic kernels, same float64 order — the
    differential surface is the decode dispatch, NULL handling, rounding,
    and ordering)."""
    from .functions.audio import _decode_i16
    from .functions.spectral import spectral_features
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    out = {
        "clip_id": [], "ok": [], "centroid_r": [], "rolloff_r": [],
        "flatness_r": [], "low_r": [], "mid_r": [], "high_r": [],
    }
    raw_centroids = []
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        f = spectral_features(x, r["sr_hz"])
        ok = f["centroid_hz"] is not None
        if ok:
            raw_centroids.append(f["centroid_hz"])
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["centroid_r"].append(spark_round(f["centroid_hz"], 2) if ok else None)
        out["rolloff_r"].append(spark_round(f["rolloff85_hz"], 2) if ok else None)
        out["flatness_r"].append(spark_round(f["flatness"], 6) if ok else None)
        out["low_r"].append(spark_round(f["band_low"], 6) if ok else None)
        out["mid_r"].append(spark_round(f["band_mid"], 6) if ok else None)
        out["high_r"].append(spark_round(f["band_high"], 6) if ok else None)
    _assert_off_rounding_boundary(raw_centroids, 2)
    return out


def _vad_state_machine(frame_db, thr: float, hang: int, min_speech: int) -> list[bool]:
    """Independently-structured replay of ``functions.vad.smooth_active``:
    an explicit per-frame streaming pass (gap-fill on re-entry, then a
    run-counter debounce) instead of the kernel's vectorized RLE surgery.
    Frame energies are shared (``frame_mean_squares``) so the threshold
    compare cannot flake; THIS logic is the differential surface."""
    n = len(frame_db)
    raw = [bool(frame_db[i] >= thr) for i in range(n)]
    out = list(raw)
    # hangover: when activity resumes after a short interior gap, back-fill
    last_active = -1
    for i in range(n):
        if raw[i]:
            gap = i - last_active - 1
            if last_active >= 0 and 0 < gap <= hang:
                for j in range(last_active + 1, i):
                    out[j] = True
            last_active = i
    # debounce: erase active runs shorter than min_speech
    run_start = None
    for i in range(n + 1):
        a = out[i] if i < n else False
        if a and run_start is None:
            run_start = i
        elif not a and run_start is not None:
            if i - run_start < min_speech:
                for j in range(run_start, i):
                    out[j] = False
            run_start = None
    return out


def _vad_decode(r):
    from .functions.audio import _decode_i16

    try:
        q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        ok = True
    except (ValueError, TypeError):
        q = np.zeros(0, dtype=np.int16)
        ok = False
    return q.astype(np.float32) / np.float32(32767.0), ok


def _dropout_naive(q, sr_hz, dropout_ms=30):
    """Independently-structured replay of ``dropout.dropout_stats_i16``:
    one explicit per-sample streaming pass tracking the current zero run
    and constant run, instead of the kernel's vectorized diff-boundary
    arithmetic.  THIS loop is the differential surface."""
    n = len(q)
    st = {"n_samples": n, "max_zero_run": 0, "n_dropouts": 0,
          "dropout_samples": 0, "max_const_run": 0, "dc_sum": 0}
    if n == 0:
        return st
    min_len = (int(sr_hz) * int(dropout_ms)) // 1000 if sr_hz and sr_hz > 0 else 1
    min_len = max(min_len, 1)
    zero_start = None
    const_start, const_val = 0, int(q[0])
    for i in range(n + 1):
        v = int(q[i]) if i < n else None
        st["dc_sum"] += v if v is not None else 0
        if v == 0:
            if zero_start is None:
                zero_start = i
        else:
            if zero_start is not None:
                run = i - zero_start
                st["max_zero_run"] = max(st["max_zero_run"], run)
                if zero_start > 0 and i < n and run >= min_len:
                    st["n_dropouts"] += 1
                    st["dropout_samples"] += run
                zero_start = None
        if v != const_val:
            if const_val != 0:
                st["max_const_run"] = max(
                    st["max_const_run"], (i if i < n else n) - const_start
                )
            const_start, const_val = i, v
    return st


def _audio_dropout_expected(n=300, seed=42) -> dict:
    """Twin of ``audio_dropout.clip_dropout`` + ``dropout_flags``: shared
    decode dispatch, independent per-sample run accounting, and the same
    exact-integer flag laws."""
    from .functions.audio import _decode_i16
    from .operators.audio_dropout import DC_DEN, DC_NUM, STUCK_MIN_DEFAULT
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    names = ["n_samples", "max_zero_run", "n_dropouts", "dropout_samples",
             "max_const_run", "dc_sum"]
    out: dict[str, list] = {"clip_id": [], "ok": []}
    out.update({k: [] for k in names})
    out.update({"has_dropout": [], "has_stuck": [], "has_dc_offset": []})
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q, ok = _decode_i16(r["bytes"], r["codec"], r["sr_hz"]), True
        except (ValueError, TypeError):
            q, ok = np.zeros(0, dtype=np.int16), False
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        if not ok:
            for k in names:
                out[k].append(None)
            out["has_dropout"].append(None)
            out["has_stuck"].append(None)
            out["has_dc_offset"].append(None)
            continue
        st = _dropout_naive(q, r["sr_hz"])
        for k in names:
            out[k].append(st[k])
        out["has_dropout"].append(st["n_dropouts"] > 0)
        out["has_stuck"].append(st["max_const_run"] >= STUCK_MIN_DEFAULT)
        out["has_dc_offset"].append(
            abs(st["dc_sum"]) * DC_DEN > DC_NUM * st["n_samples"] * 32768
        )
    return out


def _audio_vad_expected(n=300, seed=42) -> dict:
    """Twin of ``audio_vad.clip_vad``: shared frame energies + decode
    dispatch, independent smoothing state machine, independent stats
    accounting (explicit loops over the smoothed mask — the kernel derives
    everything from RLE start/end arrays)."""
    from .functions.audio import SILENCE_DB
    from .functions.vad import HANG_FRAMES, MIN_SPEECH_FRAMES, frame_mean_squares
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    cols = ("n_frames", "speech_ratio_r", "speech_ms", "n_segments",
            "longest_speech_ms",
            "longest_silence_ms", "leading_silence_ms", "trailing_silence_ms")
    out: dict[str, list] = {"clip_id": [], "ok": []}
    out.update({c: [] for c in cols})
    for _, r in pdf.sort_values("clip_id").iterrows():
        x, ok = _vad_decode(r)
        sr = r["sr_hz"] or 0
        ms2, frame = (frame_mean_squares(x, sr) if sr > 0
                      else (np.zeros(0), 1))
        nf = int(ms2.size)
        to_ms = (lambda k: int(round(k * frame * 1000 / sr))) if sr > 0 else (lambda k: 0)
        if nf == 0:
            act = []
        else:
            frame_db = 10.0 * np.log10(np.maximum(ms2, 1e-24))
            act = _vad_state_machine(frame_db, SILENCE_DB, HANG_FRAMES,
                                     MIN_SPEECH_FRAMES)
        # stats by explicit scan
        speech = sum(act)
        segs = 0
        longest_sp = longest_sil = cur = 0
        lead = trail = 0
        prev = False
        for i, a in enumerate(act):
            if a and not prev:
                segs += 1
                cur = 0
            if a:
                cur += 1
                longest_sp = max(longest_sp, cur)
            prev = a
        # silence runs (leading/trailing included)
        cur = 0
        seen_speech = False
        for a in act:
            if not a:
                cur += 1
                longest_sil = max(longest_sil, cur)
                if not seen_speech:
                    lead += 1
            else:
                seen_speech = True
                cur = 0
        for a in reversed(act):
            if a:
                break
            trail += 1
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_frames"].append(nf)
        out["speech_ratio_r"].append(
            spark_round(speech / nf if nf else 0.0, 6))
        out["speech_ms"].append(to_ms(speech))
        out["n_segments"].append(segs)
        out["longest_speech_ms"].append(to_ms(longest_sp))
        out["longest_silence_ms"].append(to_ms(longest_sil))
        out["leading_silence_ms"].append(to_ms(lead))
        out["trailing_silence_ms"].append(to_ms(trail))
    return out


def _speaking_rate_expected(n=300, seed=42) -> dict:
    """Twin of ``audio_vad.speaking_rate``: decode + independent VAD state
    machine → speech_ms by explicit frame count; chars by Python
    ``re.sub('[ \\t\\n\\r]+','')`` (the kernel uses Arrow RE2 compute);
    the flag ladder replayed as literal if/elif with the operator's
    default thresholds.  cps is bit-identical float64 arithmetic on two
    exact integers — both engines compute chars/(speech_ms/1000.0) on the
    same bits, so half-step rounding landings (e.g. 28.90625, common for
    integer ratios) are deterministic and SAFE; the
    ``_assert_off_rounding_boundary`` guard exists for noisy float
    kernels and is deliberately not applied here."""
    import re

    from .functions.audio import SILENCE_DB
    from .functions.vad import HANG_FRAMES, MIN_SPEECH_FRAMES, frame_mean_squares
    from .synth import generate_clips

    min_cps, max_cps, min_speech_ms = 4.0, 30.0, 200
    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "ok": [], "speech_ms": [], "chars": [],
        "cps_r": [], "flag": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        x, ok = _vad_decode(r)
        sr = r["sr_hz"] or 0
        ms2, frame = (frame_mean_squares(x, sr) if sr > 0
                      else (np.zeros(0), 1))
        nf = int(ms2.size)
        if nf == 0:
            act = []
        else:
            frame_db = 10.0 * np.log10(np.maximum(ms2, 1e-24))
            act = _vad_state_machine(frame_db, SILENCE_DB, HANG_FRAMES,
                                     MIN_SPEECH_FRAMES)
        speech_ms = (int(round(sum(act) * frame * 1000 / sr))
                     if sr > 0 else 0)
        t = r["transcript"]
        chars = len(re.sub("[ \t\n\r]+", "", t)) if t is not None else 0
        cps = (float(chars) / (float(speech_ms) / 1000.0)
               if speech_ms > 0 else None)
        if not ok:
            flag = "undecodable"
        elif speech_ms == 0 and chars > 0:
            flag = "silent_with_text"
        elif speech_ms > 0 and chars == 0:
            flag = "speech_without_text"
        elif speech_ms == 0 and chars == 0:
            flag = "empty"
        elif speech_ms < min_speech_ms:
            flag = "insufficient_speech"
        elif cps > max_cps:
            flag = "too_fast"
        elif cps < min_cps:
            flag = "too_slow"
        else:
            flag = "ok"
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["speech_ms"].append(speech_ms)
        out["chars"].append(chars)
        out["cps_r"].append(spark_round(cps, 4))
        out["flag"].append(flag)
    return out


def _audio_bandwidth_expected(n=300, seed=42) -> dict:
    """Twin of the ``normalize_sr → clip_bandwidth → bandwidth_flags``
    composition: shared codec + polyphase-resample kernels (the resampler
    has its own definition-differential oracle in ``audio_resample``),
    INDEPENDENT bandwidth accounting — per-frame rfft in an explicit
    Python loop, per-bin ``math.fsum`` across frames (the kernel does one
    vectorized rfft + pairwise sums), explicit running-total rolloff scan
    (the kernel uses cumsum + searchsorted), and an explicit flag
    replay.  Rolloff crossings and 2dp roundings are guarded off
    boundaries at generation time."""
    from .functions.audio import _decode_i16, encode_pcm16
    from .functions.resample import resample_poly
    from .functions.spectral import (
        FRAME,
        HF_BAND_FRAC,
        HF_FLOOR_DB,
        _hann,
    )
    from .operators.audio_bandwidth import (
        MAX_UPSAMPLED_HF_DB,
        MIN_MEASURABLE_RMS,
    )
    from .synth import generate_clips

    target = 16000
    win = _hann(FRAME)  # explicit shared formula, both engines
    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "ok": [], "sr_hz": [], "n_frames": [], "rms_r": [],
        "rolloff99_r": [], "hf_db_r": [], "upsampled": [],
    }
    raw2: list[float] = []
    raw6: list[float] = []
    for _, r in pdf.sort_values("clip_id").iterrows():
        sr = r["sr_hz"]
        # replay normalize_sr: decode → float64 → resample → pcm16
        try:
            if sr is None or sr <= 0:
                raise ValueError("bad sr")
            q0 = _decode_i16(r["bytes"], r["codec"], sr)
            x64 = (q0.astype(np.float32) / np.float32(32767.0)).astype(
                np.float64)
            payload = encode_pcm16(resample_poly(x64, int(sr), target))
            codec, sr2 = "pcm16", target
        except (ValueError, TypeError):
            payload, codec, sr2 = r["bytes"], r["codec"], sr
        # replay clip_bandwidth's decode
        try:
            q = _decode_i16(payload, codec, sr2)
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        x = q.astype(np.float32) / np.float32(32767.0)
        srv = sr2 or 0
        nfr = (len(x) // FRAME) if srv > 0 else 0
        rms = rolloff = hfrac = hf = None
        if nfr > 0:
            x64f = np.asarray(x[:nfr * FRAME], dtype=np.float64)
            rms = math.sqrt(
                math.fsum(float(v) * float(v) for v in x64f)
                / (nfr * FRAME))
            pframes = []
            for j in range(nfr):
                spec = np.fft.rfft(x64f[j * FRAME:(j + 1) * FRAME] * win)
                pframes.append(spec.real * spec.real + spec.imag * spec.imag)
            nbins = FRAME // 2 + 1
            psum = [math.fsum(p[k] for p in pframes) for k in range(nbins)]
            psum[0] = 0.0
            total = math.fsum(psum)
            if total > 0.0:
                t99 = 0.99 * total
                running = 0.0
                idx = nbins - 1
                for k in range(nbins):
                    prev = running
                    running += psum[k]
                    if running >= t99:
                        # generation-time guard: the crossing must be
                        # decisive, or cumsum-vs-fsum could flip the bin
                        assert abs(running - t99) > 1e-9 * total
                        assert abs(prev - t99) > 1e-9 * total
                        idx = k
                        break
                rolloff = idx * (float(srv) / FRAME)
                hsum = math.fsum(
                    psum[k] for k in range(nbins)
                    if k * (float(srv) / FRAME) >= HF_BAND_FRAC * srv)
                hfrac = hsum / total
                hf = max(10.0 * np.log10(max(hfrac, 1e-15)), HF_FLOOR_DB)
                raw2.append(hf)
            raw6.append(rms)
        # the flag compares UNROUNDED values in both engines: guard that
        # no clip sits so close to a threshold that last-ulp kernel/oracle
        # differences could flip the boolean
        if rms is not None:
            assert abs(rms - MIN_MEASURABLE_RMS) > 1e-9
        if hf is not None:
            assert abs(hf - MAX_UPSAMPLED_HF_DB) > 1e-9
        ups = bool(rms is not None and hf is not None
                   and rms >= MIN_MEASURABLE_RMS
                   and hf < MAX_UPSAMPLED_HF_DB)
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["sr_hz"].append(int(sr2) if sr2 is not None else None)
        out["n_frames"].append(nfr)
        out["rms_r"].append(spark_round(rms, 6))
        out["rolloff99_r"].append(spark_round(rolloff, 2))
        out["hf_db_r"].append(spark_round(hf, 2))
        out["upsampled"].append(ups)
    _assert_off_rounding_boundary(raw2, 2)
    _assert_off_rounding_boundary(raw6, 6)
    return out


def _audio_audit_issues_expected(n=300, seed=42) -> dict:
    """Twin of ``audio_audit.audit_issues(audio_audit(clips))``: the
    kernels are SHARED (each is hash-verified by its own per-clip
    differential query — audio_snr, audio_loudness, audio_dropout,
    audio_vad, clips_gate's stats), so every float here is bit-identical
    to the operator's; the differential surface is the flag ladder
    (explicit Python booleans vs JVM when-chains, including None/NULL
    semantics) and the fused aggregation (explicit counters vs one
    partial/final count(CASE) aggregate)."""
    from .functions.audio import _decode_i16, clip_stats_i16
    from .functions.dropout import dropout_stats_i16
    from .functions.loudness import clip_loudness
    from .functions.quantization import (
        MIN_NONZERO_DEFAULT,
        UPCONVERT_TZ_BITS,
        quantization_stats_i16,
    )
    from .functions.reverb import (
        MIN_DECAYS as REVERB_MIN_DECAYS,
        RT60_FLAG_MAX,
        RT60_FLAG_MIN,
        decay_stats,
    )
    from .functions.snr import speech_snr
    from .functions.spectral import HUM_MIN_CONTRAST, HUM_MIN_FRAC, hum_stats
    from .functions.vad import vad_stats
    from .operators.audio_audit import (
        AUDIT_RULES,
        LUFS_MAX,
        LUFS_MIN,
        SNR_MIN_DB,
    )
    from .operators.audio_dropout import DC_DEN, DC_NUM, STUCK_MIN_DEFAULT
    from .synth import GateThresholds as TH
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    counts = {name: 0 for name in AUDIT_RULES}
    total = 0
    for _, r in pdf.iterrows():
        total += 1
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        sr = r["sr_hz"] or 0
        x = q.astype(np.float32) / np.float32(32767.0)
        st = clip_stats_i16(q, sr)
        dp = dropout_stats_i16(q, sr)
        vd = vad_stats(x, sr)
        sn = speech_snr(x, sr)
        lf = clip_loudness(x, sr)
        qt = quantization_stats_i16(q)
        hm = hum_stats(q, sr)
        rv = decay_stats(q.astype(np.float32) / np.float32(32767.0), sr)
        del vd  # speech stats are carried by the wide relation, no flag
        flags = {
            "undecodable": not ok,
            "mostly_silence": ok and st["silence_frac"] > TH.SILENCE_MAX,
            "clipping": ok and st["clip_frac"] > TH.CLIP_MAX,
            "too_quiet": ok and st["rms_db"] < TH.RMS_MIN_DB,
            "low_snr": sn["snr_db"] is not None and sn["snr_db"] < SNR_MIN_DB,
            "loudness_range": lf["lufs_i"] is not None
            and (lf["lufs_i"] < LUFS_MIN or lf["lufs_i"] > LUFS_MAX),
            "dropout": dp["n_dropouts"] > 0,
            "stuck_samples": dp["max_const_run"] >= STUCK_MIN_DEFAULT,
            "dc_offset": abs(dp["dc_sum"]) * DC_DEN
            > DC_NUM * int(q.size) * 32768,
            "upconverted": ok
            and r["codec"] in ("pcm16", "wav")
            and qt["n_nonzero"] >= MIN_NONZERO_DEFAULT
            and (qt["tz_bits"] >= UPCONVERT_TZ_BITS
                 or qt["mulaw_hits"] == qt["n_nonzero"]),
            "mains_hum": hm["hum_frac"] is not None
            and hm["hum_frac"] >= HUM_MIN_FRAC
            and hm["hum_contrast"] >= HUM_MIN_CONTRAST,
            "reverberant": rv["n_decays"] >= REVERB_MIN_DECAYS
            and rv["rt60_est"] is not None
            and RT60_FLAG_MIN <= rv["rt60_est"] <= RT60_FLAG_MAX,
        }
        for name, hit in flags.items():
            if hit:
                counts[name] += 1
    out: dict[str, list] = {k: [] for k in
                            ("table", "column", "issue_type", "count",
                             "total", "percent", "severity", "description")}
    for name, (_, sev, column, desc) in AUDIT_RULES.items():
        out["table"].append("clips")
        out["column"].append(column)
        out["issue_type"].append(name)
        out["count"].append(counts[name])
        out["total"].append(total)
        out["percent"].append(counts[name] * 100.0 / total if total else 0.0)
        out["severity"].append(sev if counts[name] > 0 else "info")
        out["description"].append(desc)
    return out


def _audio_snr_expected(n=300, seed=42) -> dict:
    """Twin of ``audio_snr.clip_snr``: shared frame energies + decode
    dispatch, independent smoothing state machine, independent mean
    accounting (explicit ``math.fsum`` over the labelled frames — the
    kernel uses numpy masked pairwise means), 2dp rounding guarded off
    half-step boundaries at generation time."""
    from .functions.audio import SILENCE_DB
    from .functions.snr import SNR_CAP_DB, SNR_FLOOR_DB
    from .functions.vad import HANG_FRAMES, MIN_SPEECH_FRAMES, frame_mean_squares
    from .synth import generate_clips

    eps2 = 1e-24
    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "ok": [], "n_frames": [], "speech_frames": [],
        "snr_r": [], "speech_r": [], "noise_r": [],
    }
    raw: list[float] = []
    for _, r in pdf.sort_values("clip_id").iterrows():
        x, ok = _vad_decode(r)
        sr = r["sr_hz"] or 0
        ms2, _frame = (frame_mean_squares(x, sr) if sr > 0
                       else (np.zeros(0), 1))
        nf = int(ms2.size)
        if nf == 0:
            act = []
        else:
            frame_db = 10.0 * np.log10(np.maximum(ms2, eps2))
            act = _vad_state_machine(frame_db, SILENCE_DB, HANG_FRAMES,
                                     MIN_SPEECH_FRAMES)
        sp = [float(ms2[i]) for i in range(nf) if act[i]]
        nz = [float(ms2[i]) for i in range(nf) if not act[i]]
        speech_ms = math.fsum(sp) / len(sp) if sp else None
        noise_ms = math.fsum(nz) / len(nz) if nz else None
        to_db = lambda m: max(10.0 * math.log10(max(m, eps2)), SNR_FLOOR_DB)
        snr = (min(10.0 * math.log10(max(speech_ms, eps2) / max(noise_ms, eps2)),
                   SNR_CAP_DB)
               if (speech_ms is not None and noise_ms is not None) else None)
        for v in (snr, to_db(speech_ms) if speech_ms is not None else None,
                  to_db(noise_ms) if noise_ms is not None else None):
            if v is not None:
                raw.append(v)
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_frames"].append(nf)
        out["speech_frames"].append(len(sp))
        out["snr_r"].append(spark_round(snr, 2))
        out["speech_r"].append(
            spark_round(to_db(speech_ms), 2) if speech_ms is not None else None)
        out["noise_r"].append(
            spark_round(to_db(noise_ms), 2) if noise_ms is not None else None)
    _assert_off_rounding_boundary(raw, 2)
    return out


def _audio_loudness_expected(n=300, seed=42) -> dict:
    """Twin of ``audio_loudness.clip_lufs``: shared decode dispatch and
    biquad coefficient formulas (spec constants), but the per-block
    K-weighted mean square goes the OTHER way round Parseval — amplitude-
    weight the spectrum, ``irfft`` back to the time domain, ``math.fsum``
    of squares — and blocks come from explicit Python slicing instead of
    the kernel's strided view.  The two-stage gate is replayed as an
    explicit per-block loop with fsum power means.  2dp rounding guarded
    off half-step boundaries at generation time."""
    from .functions.loudness import (
        ABS_GATE_LUFS,
        BLOCK_S,
        HOP_S,
        REL_GATE_LU,
        _biquad_highpass,
        _biquad_shelf,
    )
    from .synth import generate_clips

    off = -0.691
    eps2 = 1e-24
    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "ok": [], "n_blocks": [], "n_gated": [],
        "lufs_i_r": [], "lufs_max_r": [],
    }
    raw: list[float] = []
    amp_cache: dict[tuple[int, int], np.ndarray] = {}

    def k_amp(sr: int, nblk: int) -> np.ndarray:
        got = amp_cache.get((sr, nblk))
        if got is None:
            w = 2.0 * math.pi * np.arange(nblk // 2 + 1) / nblk
            h = np.ones(w.size, dtype=np.complex128)
            for b, a in (_biquad_shelf(float(sr)), _biquad_highpass(float(sr))):
                z1, z2 = np.exp(-1j * w), np.exp(-2j * w)
                h *= (b[0] + b[1] * z1 + b[2] * z2) / (
                    a[0] + a[1] * z1 + a[2] * z2)
            got = np.abs(h)
            amp_cache[(sr, nblk)] = got
        return got

    for _, r in pdf.sort_values("clip_id").iterrows():
        x, ok = _vad_decode(r)
        sr = int(r["sr_hz"] or 0)
        nblk = int(round(sr * BLOCK_S)) if sr > 0 else 0
        hop = int(round(sr * HOP_S)) if sr > 0 else 0
        lj: list[float] = []
        if nblk > 0 and hop > 0 and x.size >= nblk:
            amp = k_amp(sr, nblk)
            x64 = x.astype(np.float64)
            j = 0
            while j + nblk <= x.size:
                spec = np.fft.rfft(x64[j:j + nblk])
                y = np.fft.irfft(spec * amp, n=nblk)
                ms = math.fsum(float(v) * float(v) for v in y) / nblk
                lj.append(off + 10.0 * math.log10(max(ms, eps2)))
                j += hop
        abs_pass = [l for l in lj if l > ABS_GATE_LUFS]
        lufs_i = None
        n_gated = 0
        if abs_pass:
            pw = lambda l: 10.0 ** ((l - off) / 10.0)
            rel_thr = (off + 10.0 * math.log10(
                math.fsum(pw(l) for l in abs_pass) / len(abs_pass))
                + REL_GATE_LU)
            keep = [l for l in lj if l > ABS_GATE_LUFS and l > rel_thr]
            n_gated = len(keep)
            if keep:
                lufs_i = off + 10.0 * math.log10(
                    math.fsum(pw(l) for l in keep) / len(keep))
        lufs_max = max(lj) if lj else None
        if lufs_max is not None and lufs_max <= ABS_GATE_LUFS:
            lufs_max = None
        for v in (lufs_i, lufs_max):
            if v is not None:
                raw.append(v)
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["n_blocks"].append(len(lj))
        out["n_gated"].append(n_gated)
        out["lufs_i_r"].append(spark_round(lufs_i, 2))
        out["lufs_max_r"].append(spark_round(lufs_max, 2))
    _assert_off_rounding_boundary(raw, 2)
    return out


def _audio_segments_expected(n=300, seed=42) -> dict:
    """Twin of ``audio_vad.clip_segments``: same state machine as above,
    segment boundaries read off the smoothed mask with an explicit scan;
    per-segment RMS from the shared frame mean-squares."""
    from .functions.audio import SILENCE_DB
    from .functions.vad import HANG_FRAMES, MIN_SPEECH_FRAMES, frame_mean_squares
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {k: [] for k in
                            ("clip_id", "seg_idx", "start_ms", "end_ms",
                             "dur_ms", "rms_db_r")}
    raw_rms: list[float] = []
    for _, r in pdf.sort_values("clip_id").iterrows():
        x, ok = _vad_decode(r)
        sr = r["sr_hz"] or 0
        if not ok or sr <= 0 or x.size == 0:
            continue
        ms2, frame = frame_mean_squares(x, sr)
        if ms2.size == 0:
            continue
        frame_db = 10.0 * np.log10(np.maximum(ms2, 1e-24))
        act = _vad_state_machine(frame_db, SILENCE_DB, HANG_FRAMES,
                                 MIN_SPEECH_FRAMES)
        seg_idx = 0
        i = 0
        nf = len(act)
        while i < nf:
            if act[i]:
                j = i
                while j < nf and act[j]:
                    j += 1
                seg_ms2 = float(np.mean(ms2[i:j], dtype=np.float64))
                rms_db = max(10.0 * math.log10(max(seg_ms2, 1e-24)), -120.0)
                raw_rms.append(rms_db)
                out["clip_id"].append(r["clip_id"])
                out["seg_idx"].append(seg_idx)
                out["start_ms"].append(int(round(i * frame * 1000 / sr)))
                out["end_ms"].append(int(round(j * frame * 1000 / sr)))
                out["dur_ms"].append(int(round((j - i) * frame * 1000 / sr)))
                out["rms_db_r"].append(spark_round(rms_db, 4))
                seg_idx += 1
                i = j
            else:
                i += 1
    _assert_off_rounding_boundary(raw_rms, 4)
    return out


def _audio_chunks_expected(n=300, seed=42, min_dur_ms=200) -> dict:
    """Twin of ``audio_vad.extract_segments`` hashed by the driver query:
    shared decode, INDEPENDENT state machine + explicit segment scan
    (same differential surface as ``_audio_segments_expected``), payload
    sliced on the scan's own frame bounds and hashed with the from-spec
    pure-Python XXH64 (bit-matching Spark's ``xxhash64`` at seed 42)."""
    from .functions.audio import SILENCE_DB, _decode_i16
    from .functions.vad import HANG_FRAMES, MIN_SPEECH_FRAMES, frame_mean_squares
    from .functions.xxh64 import xxh64_bytes
    from .synth import generate_clips

    def signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {k: [] for k in
                            ("clip_id", "seg_idx", "sr_hz", "start_ms",
                             "dur_ms", "payload_h", "rms_db_r")}
    raw_rms: list[float] = []
    for _, r in pdf.sort_values("clip_id").iterrows():
        sr = r["sr_hz"] or 0
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            continue
        x = q.astype(np.float32) / np.float32(32767.0)
        if sr <= 0 or x.size == 0:
            continue
        ms2, frame = frame_mean_squares(x, sr)
        if ms2.size == 0:
            continue
        frame_db = 10.0 * np.log10(np.maximum(ms2, 1e-24))
        act = _vad_state_machine(frame_db, SILENCE_DB, HANG_FRAMES,
                                 MIN_SPEECH_FRAMES)
        seg_idx = 0
        i = 0
        nf = len(act)
        while i < nf:
            if not act[i]:
                i += 1
                continue
            j = i
            while j < nf and act[j]:
                j += 1
            dur_ms = int(round((j - i) * frame * 1000 / sr))
            if dur_ms >= min_dur_ms:
                seg_ms2 = float(np.mean(ms2[i:j], dtype=np.float64))
                rms_db = max(10.0 * math.log10(max(seg_ms2, 1e-24)), -120.0)
                payload = np.ascontiguousarray(
                    q[i * frame:j * frame], dtype="<i2").tobytes()
                raw_rms.append(rms_db)
                out["clip_id"].append(r["clip_id"])
                out["seg_idx"].append(seg_idx)
                out["sr_hz"].append(int(sr))
                out["start_ms"].append(int(round(i * frame * 1000 / sr)))
                out["dur_ms"].append(dur_ms)
                out["payload_h"].append(signed(xxh64_bytes(payload, 42)))
                out["rms_db_r"].append(spark_round(rms_db, 4))
            seg_idx += 1
            i = j
    _assert_off_rounding_boundary(raw_rms, 4)
    return out


def _utterance_audit_expected(n=300, seed=42, min_dur_ms=200) -> dict:
    """Twin of the per-utterance quality audit — the composition the
    segment-runner test proves in-process, now driver-hash-checked:
    ``extract_segments`` (VAD chunker, payload sliced on frame bounds)
    feeding ``audit_issues(audio_audit(segments-as-clips))``.  Segment
    extraction is replayed with the INDEPENDENT state machine
    (`_vad_state_machine`, explicit scan — same differential surface as
    the audio_chunks twin); each segment's pcm16 slice then runs the
    SHARED kernels with an explicit Python flag ladder vs the operator's
    fused count(CASE) aggregate."""
    from .functions.audio import SILENCE_DB, _decode_i16, clip_stats_i16
    from .functions.dropout import dropout_stats_i16
    from .functions.loudness import clip_loudness
    from .functions.quantization import (
        MIN_NONZERO_DEFAULT,
        UPCONVERT_TZ_BITS,
        quantization_stats_i16,
    )
    from .functions.reverb import (
        MIN_DECAYS as REVERB_MIN_DECAYS,
        RT60_FLAG_MAX,
        RT60_FLAG_MIN,
        decay_stats,
    )
    from .functions.snr import speech_snr
    from .functions.spectral import HUM_MIN_CONTRAST, HUM_MIN_FRAC, hum_stats
    from .functions.vad import HANG_FRAMES, MIN_SPEECH_FRAMES, frame_mean_squares
    from .operators.audio_audit import (
        AUDIT_RULES,
        LUFS_MAX,
        LUFS_MIN,
        SNR_MIN_DB,
    )
    from .operators.audio_dropout import DC_DEN, DC_NUM, STUCK_MIN_DEFAULT
    from .synth import GateThresholds as TH
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    counts = {name: 0 for name in AUDIT_RULES}
    total = 0
    for _, r in pdf.iterrows():
        sr = r["sr_hz"] or 0
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            continue
        x = q.astype(np.float32) / np.float32(32767.0)
        if sr <= 0 or x.size == 0:
            continue
        ms2, frame = frame_mean_squares(x, sr)
        if ms2.size == 0:
            continue
        frame_db = 10.0 * np.log10(np.maximum(ms2, 1e-24))
        act = _vad_state_machine(frame_db, SILENCE_DB, HANG_FRAMES,
                                 MIN_SPEECH_FRAMES)
        i = 0
        nf = len(act)
        while i < nf:
            if not act[i]:
                i += 1
                continue
            j = i
            while j < nf and act[j]:
                j += 1
            dur_ms = int(round((j - i) * frame * 1000 / sr))
            if dur_ms >= min_dur_ms:
                qs = np.ascontiguousarray(q[i * frame:j * frame],
                                          dtype="<i2")
                total += 1
                xs = qs.astype(np.float32) / np.float32(32767.0)
                st = clip_stats_i16(qs, sr)
                dp = dropout_stats_i16(qs, sr)
                sn = speech_snr(xs, sr)
                lf = clip_loudness(xs, sr)
                flags = {
                    "undecodable": False,  # pcm16 slices always decode
                    "mostly_silence": st["silence_frac"] > TH.SILENCE_MAX,
                    "clipping": st["clip_frac"] > TH.CLIP_MAX,
                    "too_quiet": st["rms_db"] < TH.RMS_MIN_DB,
                    "low_snr": sn["snr_db"] is not None
                    and sn["snr_db"] < SNR_MIN_DB,
                    "loudness_range": lf["lufs_i"] is not None
                    and (lf["lufs_i"] < LUFS_MIN or lf["lufs_i"] > LUFS_MAX),
                    "dropout": dp["n_dropouts"] > 0,
                    "stuck_samples": dp["max_const_run"]
                    >= STUCK_MIN_DEFAULT,
                    "dc_offset": abs(dp["dc_sum"]) * DC_DEN
                    > DC_NUM * int(qs.size) * 32768,
                    # segments are always pcm16 slices: a coarse lattice
                    # here means coarse content entering the product,
                    # whatever the source container declared
                    "upconverted": (lambda qt: (
                        qt["n_nonzero"] >= MIN_NONZERO_DEFAULT
                        and (qt["tz_bits"] >= UPCONVERT_TZ_BITS
                             or qt["mulaw_hits"] == qt["n_nonzero"])
                    ))(quantization_stats_i16(qs)),
                    "mains_hum": (lambda hm: (
                        hm["hum_frac"] is not None
                        and hm["hum_frac"] >= HUM_MIN_FRAC
                        and hm["hum_contrast"] >= HUM_MIN_CONTRAST
                    ))(hum_stats(qs, sr)),
                    "reverberant": (lambda rv: (
                        rv["n_decays"] >= REVERB_MIN_DECAYS
                        and rv["rt60_est"] is not None
                        and RT60_FLAG_MIN <= rv["rt60_est"] <= RT60_FLAG_MAX
                    ))(decay_stats(
                        qs.astype(np.float32) / np.float32(32767.0), sr)),
                }
                for name, hit in flags.items():
                    if hit:
                        counts[name] += 1
            i = j
    out: dict[str, list] = {k: [] for k in
                            ("table", "column", "issue_type", "count",
                             "total", "percent", "severity", "description")}
    for name, (_, sev, column, desc) in AUDIT_RULES.items():
        out["table"].append("segments")
        out["column"].append(column)
        out["issue_type"].append(name)
        out["count"].append(counts[name])
        out["total"].append(total)
        out["percent"].append(counts[name] * 100.0 / total if total else 0.0)
        out["severity"].append(sev if counts[name] > 0 else "info")
        out["description"].append(desc)
    return out


def _utterance_gate_expected(n=300, seed=42, min_dur_ms=200) -> dict:
    """Twin of ``pipeline.utterance_gate`` — per-utterance keep/drop.

    Segment extraction is replayed with the INDEPENDENT VAD state
    machine (`_vad_state_machine`, same differential surface as the
    audio_chunks / utterance_audit twins); each segment's pcm16 slice
    then runs the SHARED kernels (each hash-verified by its own
    differential query — audio_snr, audio_loudness, audio_dropout,
    audio_bandwidth) under an explicit Python flag ladder in
    UTTERANCE_DROP_RULES order.  The differential surface is the
    segmentation replay, the ladder composition, and the
    coalesce(·, False) NULL semantics vs the Spark when-chain."""
    from .functions.audio import SILENCE_DB, _decode_i16, clip_stats_i16
    from .functions.dropout import dropout_stats_i16
    from .functions.loudness import clip_loudness
    from .functions.snr import speech_snr
    from .functions.spectral import bandwidth_stats
    from .functions.vad import (
        HANG_FRAMES,
        MIN_SPEECH_FRAMES,
        frame_mean_squares,
    )
    from .operators.audio_audit import LUFS_MAX, LUFS_MIN, SNR_MIN_DB
    from .operators.audio_bandwidth import (
        MAX_UPSAMPLED_HF_DB,
        MIN_MEASURABLE_RMS,
    )
    from .operators.audio_dropout import DC_DEN, DC_NUM, STUCK_MIN_DEFAULT
    from .pipeline import UTTERANCE_DROP_RULES
    from .synth import ALLOWED_SR
    from .synth import GateThresholds as TH
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "start_ms": [], "dur_ms": [],
        "decision": [], "decision_reason": [],
    }
    for _, r in pdf.iterrows():
        sr = r["sr_hz"] or 0
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            continue
        x = q.astype(np.float32) / np.float32(32767.0)
        if sr <= 0 or x.size == 0:
            continue
        ms2, frame = frame_mean_squares(x, sr)
        if ms2.size == 0:
            continue
        frame_db = 10.0 * np.log10(np.maximum(ms2, 1e-24))
        act = _vad_state_machine(frame_db, SILENCE_DB, HANG_FRAMES,
                                 MIN_SPEECH_FRAMES)
        i = 0
        nf = len(act)
        seg_idx = -1  # numbered over ALL active runs, before the length cut
        while i < nf:
            if not act[i]:
                i += 1
                continue
            j = i
            while j < nf and act[j]:
                j += 1
            seg_idx += 1
            dur_ms = int(round((j - i) * frame * 1000 / sr))
            if dur_ms >= min_dur_ms:
                qs = np.ascontiguousarray(q[i * frame:j * frame],
                                          dtype="<i2")
                xs = qs.astype(np.float32) / np.float32(32767.0)
                st = clip_stats_i16(qs, sr)
                dp = dropout_stats_i16(qs, sr)
                sn = speech_snr(xs, sr)
                lf = clip_loudness(xs, sr)
                bw = bandwidth_stats(xs, sr)
                n_samples = int(qs.size)
                actual_ms = n_samples * 1000.0 / float(sr)
                mismatch = (
                    abs(actual_ms - float(dur_ms)) / max(float(dur_ms), 1.0)
                    if dur_ms > 0 else 1.0
                )
                flags = {
                    "decode_failed": False,  # pcm16 slices always decode
                    "bad_sample_rate": int(sr) not in ALLOWED_SR,
                    "bad_duration": dur_ms <= 0,
                    "duration_mismatch": mismatch > TH.DUR_MISMATCH_FRAC,
                    "mostly_silence": st["silence_frac"] > TH.SILENCE_MAX,
                    "clipping": st["clip_frac"] > TH.CLIP_MAX,
                    "too_quiet": st["rms_db"] < TH.RMS_MIN_DB,
                    "dropout": dp["n_dropouts"] > 0,
                    "stuck_samples": dp["max_const_run"]
                    >= STUCK_MIN_DEFAULT,
                    "low_snr": sn["snr_db"] is not None
                    and sn["snr_db"] < SNR_MIN_DB,
                    "loudness_range": lf["lufs_i"] is not None
                    and (lf["lufs_i"] < LUFS_MIN or lf["lufs_i"] > LUFS_MAX),
                    "dc_offset": abs(dp["dc_sum"]) * DC_DEN
                    > DC_NUM * n_samples * 32768,
                    "upsampled": bw["rms"] is not None
                    and bw["rms"] >= MIN_MEASURABLE_RMS
                    and bw["hf_db"] is not None
                    and bw["hf_db"] < MAX_UPSAMPLED_HF_DB,
                }
                assert set(flags) == set(UTTERANCE_DROP_RULES)
                reason = next(
                    (k for k in UTTERANCE_DROP_RULES if flags[k]), None
                )
                out["clip_id"].append(f"{r['clip_id']}#{seg_idx}")
                out["start_ms"].append(int(round(i * frame * 1000 / sr)))
                out["dur_ms"].append(dur_ms)
                out["decision"].append(
                    "drop" if reason is not None else "keep"
                )
                out["decision_reason"].append(reason)
            i = j
    return out


def _audio_boilerplate_expected(
    n=300, seed=42, jingle_every=4, min_clips=20
) -> dict:
    """Twin of ``audio_boilerplate`` over the jingle corpus: the landmark
    kernel is SHARED (hash-verified by audio_constellation_match); the
    lexicon (hash → distinct-clip sets as explicit dict-of-set
    bookkeeping vs Spark's count_distinct aggregate), the per-clip
    occurrence counting, and the cross-multiplied flag are replayed in
    pure Python — all-int outputs, exact."""
    from .functions.audio import _decode_i16
    from .functions.spectral import constellation_landmarks
    from .operators.audio_boilerplate import BOILER_DEN, BOILER_NUM
    from .synth import make_audio_jingle_corpus

    pdf = make_audio_jingle_corpus(n, seed=seed, jingle_every=jingle_every)
    lms: dict[str, list[int]] = {}
    for _, r in pdf.iterrows():
        try:
            x = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            x = np.zeros(0, dtype=np.int16)
        hs, _ts = constellation_landmarks(x)
        lms[r["clip_id"]] = [int(h) for h in hs]
    clipset: dict[int, set[str]] = {}
    for cid, hs in lms.items():
        for h in set(hs):
            clipset.setdefault(h, set()).add(cid)
    lex = {h for h, s in clipset.items() if len(s) >= min_clips}
    out = {"clip_id": [], "n_landmarks": [], "n_boiler": [],
           "boilerplate_heavy": []}
    for cid in sorted(lms):
        hs = lms[cid]
        nb = sum(1 for h in hs if h in lex)
        out["clip_id"].append(cid)
        out["n_landmarks"].append(len(hs))
        out["n_boiler"].append(nb)
        out["boilerplate_heavy"].append(
            len(hs) > 0 and nb * BOILER_DEN > BOILER_NUM * len(hs)
        )
    return out


def _audio_quantization_expected(
    n=300, seed=42, bit_every=5, mulaw_every=7
) -> dict:
    """Twin of ``audio_quantization.clip_quantization`` +
    ``quantization_flags`` over the quantized corpus: shared decode
    dispatch, then per-sample Python-int accounting — distinct values
    via a set, common trailing zeros by an explicit halving loop on the
    two's-complement OR, µ-law codebook membership against a set built
    from the G.711 formula with Python ints (independent of the kernel's
    numpy table), and the same exact flag laws incl. the
    not-evaluable-below-MIN_NONZERO NULL verdicts."""
    from .functions.audio import _decode_i16
    from .functions.quantization import (
        MIN_NONZERO_DEFAULT,
        UPCONVERT_TZ_BITS,
    )
    from .synth import make_audio_quantized_corpus

    codebook: set[int] = set()
    for b in range(256):
        u = b ^ 0xFF
        sign, exp, mant = u & 0x80, (u >> 4) & 0x07, u & 0x0F
        mag = (((mant << 3) + 132) << exp) - 132
        codebook.add(-mag if sign else mag)

    pdf = make_audio_quantized_corpus(
        n, seed=seed, bit_every=bit_every, mulaw_every=mulaw_every
    )
    names = ["n_samples", "n_nonzero", "n_distinct", "tz_bits",
             "mulaw_hits", "effective_bits"]
    out: dict[str, list] = {"clip_id": [], "codec": [], "ok": []}
    out.update({k: [] for k in names})
    out.update({"bit_upconverted": [], "mulaw_upconverted": [],
                "upconverted": []})
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q, ok = _decode_i16(r["bytes"], r["codec"], r["sr_hz"]), True
        except (ValueError, TypeError):
            q, ok = np.zeros(0, dtype=np.int16), False
        out["clip_id"].append(r["clip_id"])
        out["codec"].append(r["codec"])
        out["ok"].append(ok)
        if not ok:
            for k in names:
                out[k].append(None)
            for k in ("bit_upconverted", "mulaw_upconverted", "upconverted"):
                out[k].append(None)
            continue
        vals = [int(v) for v in q]
        nz = [v for v in vals if v != 0]
        orred = 0
        for v in vals:
            orred |= v & 0xFFFF
        tz = 16
        if orred != 0:
            tz = 0
            while orred % 2 == 0:
                orred //= 2
                tz += 1
        hits = sum(1 for v in nz if v in codebook)
        st = {"n_samples": len(vals), "n_nonzero": len(nz),
              "n_distinct": len(set(vals)), "tz_bits": tz,
              "mulaw_hits": hits, "effective_bits": 16 - tz}
        for k in names:
            out[k].append(st[k])
        if len(nz) < MIN_NONZERO_DEFAULT:
            for k in ("bit_upconverted", "mulaw_upconverted", "upconverted"):
                out[k].append(None)
            continue
        full_res = r["codec"] in ("pcm16", "wav")
        bit_up = full_res and tz >= UPCONVERT_TZ_BITS
        mulaw_up = full_res and hits == len(nz)
        out["bit_upconverted"].append(bit_up)
        out["mulaw_upconverted"].append(mulaw_up)
        out["upconverted"].append(bit_up or mulaw_up)
    return out


def _audio_trim_expected(n=300, seed=42) -> dict:
    """Twin of ``audio_vad.trim_silence``: the independent VAD state
    machine derives the FIRST active run's start frame and the LAST
    active run's end frame; the span slice is re-taken on those exact
    frame-grid bounds and hashed with the from-spec XXH64 (bit-matching
    Spark ``xxhash64`` at seed 42).  All other outputs are ints/bools —
    exact."""
    from .functions.audio import SILENCE_DB, _decode_i16
    from .functions.vad import HANG_FRAMES, MIN_SPEECH_FRAMES, frame_mean_squares
    from .functions.xxh64 import xxh64_bytes
    from .synth import generate_clips

    def signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {k: [] for k in
                            ("clip_id", "ok", "trimmed", "sr_hz", "n_in",
                             "n_out", "lead_ms", "tail_ms", "payload_h")}
    for _, r in pdf.sort_values("clip_id").iterrows():
        sr = r["sr_hz"] or 0
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            ok = True
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
            ok = False
        x = q.astype(np.float32) / np.float32(32767.0)
        act: list[bool] = []
        frame = 1
        if ok and sr > 0 and x.size:
            ms2, frame = frame_mean_squares(x, sr)
            if ms2.size:
                frame_db = 10.0 * np.log10(np.maximum(ms2, 1e-24))
                act = _vad_state_machine(frame_db, SILENCE_DB,
                                         HANG_FRAMES, MIN_SPEECH_FRAMES)
        first = next((i for i, a in enumerate(act) if a), None)
        n_in = int(q.size)
        if first is None:
            trimmed, s0, s1 = False, 0, 0
            payload = b""
        else:
            last = max(i for i, a in enumerate(act) if a) + 1
            s0, s1 = first * frame, last * frame
            trimmed = True
            payload = np.ascontiguousarray(
                q[s0:s1], dtype="<i2").tobytes()
        out["clip_id"].append(r["clip_id"])
        out["ok"].append(ok)
        out["trimmed"].append(trimmed)
        out["sr_hz"].append(int(sr))
        out["n_in"].append(n_in)
        out["n_out"].append(len(payload) // 2)
        out["lead_ms"].append(int(round(s0 * 1000 / sr))
                              if trimmed and sr else 0)
        out["tail_ms"].append(int(round((n_in - s1) * 1000 / sr))
                              if trimmed and sr else 0)
        out["payload_h"].append(signed(xxh64_bytes(payload, 42)))
    return out


def _resample_definition(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Literal zero-stuff → convolve → decimate resampler (the definition
    the polyphase kernel optimizes).  Shares only the tap design with
    ``functions.resample.resample_poly``; execution is entirely different
    (materialized L× upsample + full convolution), so agreement is evidence
    about the polyphase index math, not a tautology.  Float64 outputs agree
    with polyphase to ~1e-15 relative (reduction order differs); rounded
    stats are guarded off rounding boundaries at generation time."""
    from .functions.resample import design_lowpass, output_length

    x = np.asarray(x, dtype=np.float64)
    if sr_in == sr_out or x.size == 0:
        return x.copy()
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    h = design_lowpass(L, M)
    half = (h.size - 1) // 2
    xu = np.zeros(x.size * L, dtype=np.float64)
    xu[::L] = x
    y_full = np.convolve(xu, h)
    n_out = output_length(x.size, L, M)
    return y_full[half: half + n_out * M: M][:n_out]


def _audio_gain_expected(n=300, seed=42,
                         target_rms_db=-20.0, peak_ceiling_db=-1.0) -> dict:
    """Twin of ``audio_gain.gain_stats``: shared int16 decode, independent
    gain derivation (sqrt-RMS / 20*log10 formulation vs the kernel's
    mean-square / 10*log10) and independent quantize/clip accounting."""
    from .functions.audio import _decode_i16
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {k: [] for k in
                            ("clip_id", "ok", "gained", "gain_r",
                             "rms_in_db_r", "rms_out_db_r", "n_clipped")}
    raw: list[float] = []
    for _, r in pdf.sort_values("clip_id").iterrows():
        out["clip_id"].append(r["clip_id"])
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            out["ok"].append(False)
            out["gained"].append(False)
            out["gain_r"].append(None)
            out["rms_in_db_r"].append(None)
            out["rms_out_db_r"].append(None)
            out["n_clipped"].append(0)
            continue
        out["ok"].append(True)
        x = q.astype(np.float64) / 32767.0
        rms = float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0
        if rms == 0.0:
            out["gained"].append(False)
            out["gain_r"].append(None)
            out["rms_in_db_r"].append(None)
            out["rms_out_db_r"].append(None)
            out["n_clipped"].append(0)
            continue
        rms_in_db = 20.0 * math.log10(rms)
        g = 10.0 ** ((target_rms_db - rms_in_db) / 20.0)
        peak = float(np.max(np.abs(x)))
        ceiling = 10.0 ** (peak_ceiling_db / 20.0)
        if peak * g > ceiling:
            g = ceiling / peak
        y_raw = np.rint(q.astype(np.float64) * g)
        n_clip = int(((y_raw < -32768) | (y_raw > 32767)).sum())
        y = np.clip(y_raw, -32768, 32767)
        rms_out = float(np.sqrt(np.mean(np.square(y / 32767.0))))
        rms_out_db = 20.0 * math.log10(rms_out) if rms_out > 0 else None
        for v in (g, rms_in_db, rms_out_db):
            if v is not None:
                raw.append(v)
        out["gained"].append(True)
        # 5dp, not 6: at 6dp three corpus values sit within 1e-9 of a
        # half-step boundary (e.g. -12.0794654990725) and the guard below
        # rejects the table; 5dp has full 1e-9 margin on every value.
        out["gain_r"].append(spark_round(g, 5))
        out["rms_in_db_r"].append(spark_round(rms_in_db, 5))
        out["rms_out_db_r"].append(
            None if rms_out_db is None else spark_round(rms_out_db, 5))
        out["n_clipped"].append(n_clip)
    _assert_off_rounding_boundary(raw, 5)
    return out


def _audio_declip_expected(n=120, seed=42, guard=0, max_run_ms=1.0) -> dict:
    """Twin of ``audio_declip.declip_audio``: shared int16 decode,
    INDEPENDENT per-sample run state machine (vs the kernel's diff/
    flatnonzero vectorization) and scalar-by-scalar replay of the cubic
    Hermite / floor / headroom / half-even-quantize law with the identical
    float64 expression tree, so the repaired payload is hash-checked
    bit-for-bit (from-spec XXH64 vs Spark ``xxhash64`` at seed 42)."""
    import struct

    from .functions.audio import _decode_i16
    from .functions.declip import (
        DEFAULT_MAX_RUN_LEN,
        MIN_ANCHOR,
        OVERSHOOT_PER_SAMPLE,
    )
    from .functions.xxh64 import xxh64_bytes
    from .synth import make_audio_declip_corpus

    def signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    pdf = make_audio_declip_corpus(n, seed=seed)
    cols = ("clip_id", "ok", "declipped", "n_railed", "n_runs",
            "n_repaired", "max_run", "atten_r", "n_bytes", "payload_h")
    out: dict[str, list] = {k: [] for k in cols}
    raw_atten: list[float] = []
    for _, r in pdf.sort_values("clip_id").iterrows():
        out["clip_id"].append(r["clip_id"])
        data = r["bytes"]
        try:
            q = _decode_i16(data, r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            out["ok"].append(False)
            out["declipped"].append(False)
            for k in ("n_railed", "n_runs", "n_repaired", "max_run"):
                out[k].append(0)
            out["atten_r"].append(None)
            out["n_bytes"].append(None if data is None else len(data))
            out["payload_h"].append(
                None if data is None else signed(xxh64_bytes(bytes(data), 42)))
            continue
        sr = r["sr_hz"]
        cap = (int(sr * max_run_ms / 1000.0)
               if sr is not None and sr > 0 else DEFAULT_MAX_RUN_LEN)
        # per-sample state machine over railed signs
        runs = []
        cur_sign, cur_start = 0, -1
        for j in range(q.size + 1):
            if j < q.size:
                v = int(q[j])
                s = 1 if v >= 32767 - guard else (-1 if v <= -32768 + guard
                                                  else 0)
            else:
                s = 0
            if s != cur_sign:
                if cur_sign != 0:
                    runs.append((cur_start, j, cur_sign))
                cur_sign, cur_start = s, j
        n_railed = sum(b - a for a, b, _ in runs)
        max_run = max((b - a for a, b, _ in runs), default=0)
        y = [float(v) for v in q]
        repaired = 0
        for a, b, sign in runs:
            if a - MIN_ANCHOR < 0 or b + MIN_ANCHOR > q.size:
                continue
            if b - a > cap:
                continue
            p0 = float(q[a - 1])
            p1 = float(q[b])
            lm0 = float(b - (a - 1)) * (float(q[a - 1]) - float(q[a - 2]))
            lm1 = float(b - (a - 1)) * (float(q[b + 1]) - float(q[b]))
            grow = 1.0 + OVERSHOOT_PER_SAMPLE * float(b - a)
            for j in range(a, b):
                t = (float(j) - float(a - 1)) / float(b - (a - 1))
                omt = 1.0 - t
                v = ((1.0 + 2.0 * t) * omt * omt * p0
                     + t * omt * omt * lm0
                     + t * t * (3.0 - 2.0 * t) * p1
                     + t * t * (t - 1.0) * lm1)
                v = (min(v, 32767.0 * grow) if sign > 0
                     else max(v, -32768.0 * grow))
                y[j] = max(v, y[j]) if sign > 0 else min(v, y[j])
            repaired += 1
        out["ok"].append(True)
        out["n_railed"].append(n_railed)
        out["n_runs"].append(len(runs))
        out["n_repaired"].append(repaired)
        out["max_run"].append(max_run)
        if repaired == 0:
            out["declipped"].append(False)
            out["atten_r"].append(spark_round(1.0, 6))
            out["n_bytes"].append(len(data))
            out["payload_h"].append(signed(xxh64_bytes(bytes(data), 42)))
            continue
        need = max(max(y) / 32767.0, min(y) / -32768.0, 1.0)
        atten = 1.0
        if need > 1.0:
            atten = 1.0 / need
            y = [v * atten for v in y]
        raw_atten.append(atten)
        ints = [min(32767, max(-32768, round(v))) for v in y]
        payload = struct.pack(f"<{len(ints)}h", *ints)
        out["declipped"].append(True)
        out["atten_r"].append(spark_round(atten, 6))
        out["n_bytes"].append(len(payload))
        out["payload_h"].append(signed(xxh64_bytes(payload, 42)))
    _assert_off_rounding_boundary(raw_atten, 6)
    return out


def _audio_resample_expected(n=300, seed=42, target_hz=16000) -> dict:
    """Twin of ``audio_resample.resample_stats``: shared decode + tap
    design, independent resample execution (definition vs polyphase) and
    independent plumbing."""
    from .synth import generate_clips

    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {k: [] for k in
                            ("clip_id", "ok", "sr_in", "n_in", "n_out",
                             "rms_in_r", "rms_out_r")}
    raw_rms: list[float] = []
    for _, r in pdf.sort_values("clip_id").iterrows():
        x, ok = _vad_decode(r)
        sr = r["sr_hz"]
        out["clip_id"].append(r["clip_id"])
        if not ok or sr is None or sr <= 0:
            out["ok"].append(False)
            out["sr_in"].append(None if sr is None else int(sr))
            out["n_in"].append(0)
            out["n_out"].append(0)
            out["rms_in_r"].append(None)
            out["rms_out_r"].append(None)
            continue
        x64 = x.astype(np.float64)
        y = _resample_definition(x64, int(sr), target_hz)
        rms_in = float(np.sqrt(np.mean(np.square(x64)))) if x64.size else None
        rms_out = float(np.sqrt(np.mean(np.square(y)))) if y.size else None
        for v in (rms_in, rms_out):
            if v is not None:
                raw_rms.append(v)
        out["ok"].append(True)
        out["sr_in"].append(int(sr))
        out["n_in"].append(int(x64.size))
        out["n_out"].append(int(y.size))
        out["rms_in_r"].append(spark_round(rms_in, 6))
        out["rms_out_r"].append(spark_round(rms_out, 6))
    _assert_off_rounding_boundary(raw_rms, 6)
    return out


# ------------------------------------------------------------------ registry

import pyarrow as pa  # noqa: E402

_SCHEMAS: dict[str, pa.Schema] = {
    "minhash_lsh": pa.schema(
        [("n_pairs", pa.int64()), ("min_jaccard", pa.float64()),
         ("max_jaccard", pa.float64())]
    ),
    "simhash_near_dup": pa.schema(
        [("hamming", pa.int32()), ("n_pairs", pa.int64())]
    ),
    "dedup_clusters": pa.schema(
        [("doc_id", pa.int64()), ("component", pa.int64()),
         ("cluster_size", pa.int64())]
    ),
    "dedup_resolve": pa.schema(
        [("doc_id", pa.int64()), ("component", pa.int64()),
         ("cluster_size", pa.int64()), ("keep", pa.bool_())]
    ),
    "winnow_fingerprints": pa.schema(
        [("n_docs", pa.int64()), ("total_fps", pa.int64()),
         ("distinct_fps", pa.int64())]
    ),
    "ann_lsh_topk": pa.schema(
        [("q_id", pa.int64()), ("rank", pa.int32()), ("n_id", pa.int64()),
         ("cosine", pa.float64())]
    ),
    "embedding_near_dup_blocked": pa.schema(
        [("n_pairs", pa.int64()), ("min_cosine", pa.float64()),
         ("max_cosine", pa.float64())]
    ),
    "ann_ivf_topk": pa.schema(
        [("q_id", pa.int64()), ("rank", pa.int32()), ("n_id", pa.int64()),
         ("cosine", pa.float64())]
    ),
    "ann_pq_topk": pa.schema(
        [("q_id", pa.int64()), ("rank", pa.int32()), ("n_id", pa.int64()),
         ("adc_r", pa.float64())]
    ),
    "ann_pq_recall": pa.schema(
        [("method", pa.string()), ("hits", pa.int64()),
         ("total", pa.int64()), ("recall_r", pa.float64())]
    ),
    "ann_recall": pa.schema(
        [("method", pa.string()), ("hits", pa.int64()),
         ("total", pa.int64()), ("recall_r", pa.float64())]
    ),
    "media_features": pa.schema(
        [("kind", pa.string()), ("ok", pa.bool_()), ("n_media", pa.int64()),
         ("total_bytes", pa.int64())]
    ),
    "cluster_split": pa.schema(
        [("lang", pa.string()), ("split", pa.string()),
         ("n_docs", pa.int64()), ("total_chars", pa.int64())]
    ),
    "audio_dedup_clusters": pa.schema(
        [("clip_id", pa.string()), ("component", pa.string()),
         ("cluster_size", pa.int64())]
    ),
    "mel_cmvn": pa.schema(
        [("band", pa.int32()), ("n_clips", pa.int64()),
         ("n_frames", pa.int64()), ("mean_r", pa.float64()),
         ("std_r", pa.float64())]
    ),
    "lsh_incremental": pa.schema(
        [("new_id", pa.int64()), ("index_id", pa.int64()),
         ("n_agree", pa.int32()), ("est_jaccard_r", pa.float64())]
    ),
    "voice_triplets": pa.schema(
        [("anchor", pa.string()), ("positive", pa.string()),
         ("pos_dist2_r", pa.float64()), ("negative", pa.string()),
         ("neg_dist2_r", pa.float64()), ("margin_r", pa.float64())]
    ),
    "crop_schedule": pa.schema(
        [("clip_id", pa.string()), ("epoch", pa.int32()),
         ("crop_idx", pa.int32()), ("start_ms", pa.int64()),
         ("win_ms", pa.int64())]
    ),
    "mel_cmvn_apply": pa.schema(
        [("clip_id", pa.string()), ("n_frames", pa.int32()),
         ("n_bytes", pa.int32()), ("feat_h", pa.int64())]
    ),
    "duration_batches": pa.schema(
        [("batch_id", pa.int64()), ("n_items", pa.int64()),
         ("max_len", pa.int64()), ("sum_len", pa.int64()),
         ("padded_len", pa.int64()), ("pad_waste", pa.int64()),
         ("waste_frac_r", pa.float64()), ("first_id", pa.string()),
         ("last_id", pa.string())]
    ),
    "channel_hot_buckets": pa.schema(
        [("grid", pa.int32()), ("cell", pa.int64()),
         ("family", pa.int32()), ("n_members", pa.int64())]
    ),
    "gate_consistency": pa.schema(
        [("component", pa.string()), ("cluster_size", pa.int64()),
         ("n_decided", pa.int64()), ("n_keep", pa.int64()),
         ("n_drop", pa.int64()), ("mixed", pa.bool_()),
         ("first_keep", pa.string()), ("first_drop", pa.string())]
    ),
    "audio_channel": pa.schema(
        [("clip_id", pa.string()), ("channel", pa.string()),
         ("cluster_size", pa.int64())]
    ),
    "audio_voice": pa.schema(
        [("clip_id", pa.string()), ("speaker", pa.string()),
         ("cluster_size", pa.int64())]
    ),
    "audio_identity_split": pa.schema(
        [("clip_id", pa.string()), ("component", pa.string()),
         ("cluster_size", pa.int64()), ("split", pa.string())]
    ),
    "audio_split_leakage": pa.schema(
        [("axis", pa.string()), ("n_pairs", pa.int64()),
         ("n_cross_pairs", pa.int64()), ("n_cross_clips", pa.int64())]
    ),
    "training_manifest": pa.schema(
        [("clip_id", pa.string()), ("decision", pa.string()),
         ("split", pa.string()), ("component", pa.string()),
         ("dur_ms", pa.int64()), ("train_ready", pa.bool_())]
    ),
    "temperature_a07": pa.schema(
        [("stratum", pa.string()), ("avail_weight", pa.int64()),
         ("q", pa.int64()), ("budget", pa.int64()),
         ("n_sel", pa.int64()), ("sel_weight", pa.int64()),
         ("filled", pa.bool_())]
    ),
    "image_dedup_incremental": pa.schema(
        [("new_id", pa.string()), ("index_id", pa.string()),
         ("hamming", pa.int32())]
    ),
    "audio_dedup_incremental": pa.schema(
        [("new_id", pa.string()), ("index_id", pa.string()),
         ("ber_r", pa.float64())]
    ),
    "content_hot_buckets": pa.schema(
        [("off", pa.int32()), ("bh", pa.int64()),
         ("n_members", pa.int64())]
    ),
    "eval_coverage": pa.schema(
        [("lang_pred", pa.string()), ("n_candidates", pa.int64()),
         ("n_in_eval", pa.int64()), ("candidate_ms", pa.int64()),
         ("eval_ms", pa.int64()), ("cap_ms", pa.int64()),
         ("capped", pa.bool_())]
    ),
    "gate_f1": pa.schema(
        [("n", pa.int64()), ("tp", pa.int64()), ("fp", pa.int64()),
         ("fn", pa.int64()), ("tn", pa.int64()),
         ("keep_rate", pa.float64()), ("f1", pa.float64())]
    ),
    "eval_manifest": pa.schema(
        [("clip_id", pa.string()), ("lang_pred", pa.string()),
         ("component", pa.string()), ("dur_ms", pa.int64()),
         ("cum_before_ms", pa.int64()), ("in_eval", pa.bool_())]
    ),
    "audio_specaugment": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_frames", pa.int32()), ("n_mels", pa.int32()),
         ("n_freq_masked", pa.int32()), ("n_time_masked", pa.int32()),
         ("n_bytes", pa.int64()), ("feat_h", pa.int64())]
    ),
    "audio_split_drift": pa.schema(
        [("clip_id", pa.string()), ("status", pa.string()),
         ("old_split", pa.string()), ("new_split", pa.string()),
         ("old_component", pa.string()), ("new_component", pa.string())]
    ),
    "audio_multispeaker": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_segments", pa.int32()), ("n_voiced_segments", pa.int32()),
         ("n_voices", pa.int32()), ("max_link_d2_r", pa.float64()),
         ("min_cross_d2_r", pa.float64()), ("multi_speaker", pa.bool_())]
    ),
    "audio_fingerprint_dedup": pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("ber_r", pa.float64())]
    ),
    "label_noise_audit": pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("ber_r", pa.float64()), ("jaccard_r", pa.float64()),
         ("edit_dist", pa.int32()), ("label_mismatch", pa.bool_())]
    ),
    "audio_loop_arbitrary": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_samples", pa.int32()), ("n_distinct", pa.int32()),
         ("n_dominant", pa.int32()), ("best_lag", pa.int32()),
         ("match_num", pa.int64()), ("match_den", pa.int64()),
         ("looped", pa.bool_())]
    ),
    "audio_boilerplate": pa.schema(
        [("clip_id", pa.string()), ("n_landmarks", pa.int32()),
         ("n_boiler", pa.int64()), ("boilerplate_heavy", pa.bool_())]
    ),
    "audio_quantization": pa.schema(
        [("clip_id", pa.string()), ("codec", pa.string()),
         ("ok", pa.bool_()),
         ("n_samples", pa.int64()), ("n_nonzero", pa.int64()),
         ("n_distinct", pa.int64()), ("tz_bits", pa.int64()),
         ("mulaw_hits", pa.int64()), ("effective_bits", pa.int64()),
         ("bit_upconverted", pa.bool_()), ("mulaw_upconverted", pa.bool_()),
         ("upconverted", pa.bool_())]
    ),
    "audio_trim": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("trimmed", pa.bool_()), ("sr_hz", pa.int32()),
         ("n_in", pa.int32()), ("n_out", pa.int32()),
         ("lead_ms", pa.int32()), ("tail_ms", pa.int32()),
         ("payload_h", pa.int64())]
    ),
    "audio_loop_scan": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_frames", pa.int32()), ("n_distinct", pa.int32()),
         ("n_dominant", pa.int32()), ("best_lag", pa.int32()),
         ("match_num", pa.int64()), ("match_den", pa.int64()),
         ("looped", pa.bool_())]
    ),
    "audio_excerpt_match": pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("shift", pa.int32()), ("votes", pa.int64()),
         ("overlap", pa.int32()), ("ber_r", pa.float64())]
    ),
    "audio_constellation_match": pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("offset_frames", pa.int32()), ("votes", pa.int64())]
    ),
    "audio_spectral": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("centroid_r", pa.float64()), ("rolloff_r", pa.float64()),
         ("flatness_r", pa.float64()), ("low_r", pa.float64()),
         ("mid_r", pa.float64()), ("high_r", pa.float64())]
    ),
    "audio_dropout": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_samples", pa.int64()), ("max_zero_run", pa.int64()),
         ("n_dropouts", pa.int64()), ("dropout_samples", pa.int64()),
         ("max_const_run", pa.int64()), ("dc_sum", pa.int64()),
         ("has_dropout", pa.bool_()), ("has_stuck", pa.bool_()),
         ("has_dc_offset", pa.bool_())]
    ),
    "audio_snr": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_frames", pa.int32()), ("speech_frames", pa.int32()),
         ("snr_r", pa.float64()), ("speech_r", pa.float64()),
         ("noise_r", pa.float64())]
    ),
    "audio_loudness": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_blocks", pa.int32()), ("n_gated", pa.int32()),
         ("lufs_i_r", pa.float64()), ("lufs_max_r", pa.float64())]
    ),
    "audio_vad": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_frames", pa.int32()), ("speech_ratio_r", pa.float64()),
         ("speech_ms", pa.int32()),
         ("n_segments", pa.int32()), ("longest_speech_ms", pa.int32()),
         ("longest_silence_ms", pa.int32()),
         ("leading_silence_ms", pa.int32()),
         ("trailing_silence_ms", pa.int32())]
    ),
    "speaking_rate": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("speech_ms", pa.int32()), ("chars", pa.int32()),
         ("cps_r", pa.float64()), ("flag", pa.string())]
    ),
    "audio_bandwidth": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("sr_hz", pa.int32()), ("n_frames", pa.int32()),
         ("rms_r", pa.float64()),
         ("rolloff99_r", pa.float64()), ("hf_db_r", pa.float64()),
         ("upsampled", pa.bool_())]
    ),
    "audio_decontaminate": pa.schema(
        [("clip_id", pa.string()), ("contaminated", pa.bool_()),
         ("n_matches", pa.int64()), ("min_ber_r", pa.float64())]
    ),
    "audio_chunks": pa.schema(
        [("clip_id", pa.string()), ("seg_idx", pa.int32()),
         ("sr_hz", pa.int32()), ("start_ms", pa.int32()),
         ("dur_ms", pa.int32()), ("payload_h", pa.int64()),
         ("rms_db_r", pa.float64())]
    ),
    "audio_audit_issues": pa.schema(
        [("table", pa.string()), ("column", pa.string()),
         ("issue_type", pa.string()), ("count", pa.int64()),
         ("total", pa.int64()), ("percent", pa.float64()),
         ("severity", pa.string()), ("description", pa.string())]
    ),
    "audio_segments": pa.schema(
        [("clip_id", pa.string()), ("seg_idx", pa.int32()),
         ("start_ms", pa.int32()), ("end_ms", pa.int32()),
         ("dur_ms", pa.int32()), ("rms_db_r", pa.float64())]
    ),
    "audio_resample": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("sr_in", pa.int32()), ("n_in", pa.int32()),
         ("n_out", pa.int32()), ("rms_in_r", pa.float64()),
         ("rms_out_r", pa.float64())]
    ),
    "audio_gain": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("gained", pa.bool_()), ("gain_r", pa.float64()),
         ("rms_in_db_r", pa.float64()), ("rms_out_db_r", pa.float64()),
         ("n_clipped", pa.int32())]
    ),
    "audio_declip": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("declipped", pa.bool_()), ("n_railed", pa.int32()),
         ("n_runs", pa.int32()), ("n_repaired", pa.int32()),
         ("max_run", pa.int32()), ("atten_r", pa.float64()),
         ("n_bytes", pa.int32()), ("payload_h", pa.int64())]
    ),
    "clips_gate": pa.schema(
        [("clip_id", pa.string()), ("decision", pa.string()),
         ("lang_pred", pa.string()), ("lang_conf_r", pa.float64()),
         ("rms_db_r", pa.float64()), ("token_count", pa.int32()),
         ("scrubbed", pa.string())]
    ),
    "clips_gate_decide3": pa.schema(
        [("decision", pa.string()), ("n_clips", pa.int64())]
    ),
    "clips_gate_v2": pa.schema(
        [("clip_id", pa.string()), ("decision", pa.string()),
         ("decision_reason", pa.string())]
    ),
    "audio_quality_score": pa.schema(
        [("clip_id", pa.string()), ("q_score", pa.int32()),
         ("grade", pa.string())]
    ),
    "dsir_weights": pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int32()),
         ("log_w", pa.float64())]
    ),
    "quality_classifier": pa.schema(
        [("metric", pa.string()), ("value", pa.float64())]
    ),
    "gate_distill": pa.schema(
        [("metric", pa.string()), ("value", pa.float64())]
    ),
    "audio_embed_dedup": pa.schema(
        [("level", pa.string()), ("n_pairs", pa.int64()),
         ("n_caught", pa.int64())]
    ),
    "codec_sniff": pa.schema(
        [("codec", pa.string()), ("payload_class", pa.string()),
         ("payload_severity", pa.string()), ("n", pa.int64()),
         ("example_clip", pa.string())]
    ),
    "bpe_merges": pa.schema(
        [("rank", pa.int32()), ("left", pa.string()),
         ("right", pa.string()), ("merged", pa.string()),
         ("pair_count", pa.int64())]
    ),
    "bpe_encode": pa.schema(
        [("lang", pa.string()), ("n_docs", pa.int64()),
         ("total_words", pa.int64()), ("total_tokens", pa.int64()),
         ("total_chars", pa.int64())]
    ),
    "bloom_decontaminate": pa.schema(
        [("source", pa.string()), ("n_docs", pa.int64()),
         ("bloom_docs", pa.int64()), ("confirmed_docs", pa.int64()),
         ("bloom_grams", pa.int64()), ("confirmed_grams", pa.int64())]
    ),
    "speaker_balance": pa.schema(
        [("cluster_rep", pa.string()), ("n_members", pa.int64()),
         ("n_kept", pa.int64()), ("kept_ids", pa.string())]
    ),
    "voice_balance": pa.schema(
        [("cluster_rep", pa.string()), ("n_members", pa.int64()),
         ("n_kept", pa.int64()), ("kept_ids", pa.string())]
    ),
    "audio_augment": pa.schema(
        [("clip_id", pa.string()), ("src_clip_id", pa.string()),
         ("aug_name", pa.string()), ("sr_hz", pa.int32()),
         ("dur_ms", pa.int32()), ("n_bytes", pa.int64()),
         ("payload_h", pa.int64())]
    ),
    "quality_calibration": pa.schema(
        [("bucket", pa.int32()), ("n_docs", pa.int64()),
         ("n_pass", pa.int64()), ("pass_rate", pa.float64()),
         ("min_score", pa.float64()), ("max_score", pa.float64())]
    ),
    "semantic_prune": pa.schema(
        [("vec_id", pa.int64()), ("component", pa.int64()),
         ("cluster_size", pa.int64()), ("keep", pa.bool_())]
    ),
    "clips_decontaminate": pa.schema(
        [("clip_id", pa.string()), ("audio_hit", pa.bool_()),
         ("text_hit", pa.bool_()), ("leaked", pa.bool_()),
         ("n_matches", pa.int64()), ("n_gram_hits", pa.int64()),
         ("min_ber_r", pa.float64())]
    ),
    "audio_hum": pa.schema(
        [("clip_id", pa.string()), ("n_frames", pa.int32()),
         ("frac_r", pa.float64()), ("contrast_r", pa.float64()),
         ("hum_hz", pa.float64()), ("is_hum", pa.bool_())]
    ),
    "audio_stereo": pa.schema(
        [("clip_id", pa.string()), ("n_ch", pa.int32()),
         ("n_samples", pa.int64()), ("n_diff", pa.int64()),
         ("n_anti", pa.int64()), ("nz_l", pa.int64()),
         ("nz_r", pa.int64()), ("rms_l_r", pa.float64()),
         ("rms_r_r", pa.float64()), ("bal_r", pa.float64()),
         ("corr_r", pa.float64()), ("dual_mono", pa.bool_()),
         ("phase_inverted", pa.bool_()), ("dead_channel", pa.bool_()),
         ("dead_side", pa.string()), ("imbalanced", pa.bool_())]
    ),
    "audio_flutter": pa.schema(
        [("clip_id", pa.string()), ("n_frames", pa.int32()),
         ("n_track", pa.int32()), ("carrier_r", pa.float64()),
         ("dev_r", pa.float64()), ("mod_hz_r", pa.float64()),
         ("frac_r", pa.float64()), ("is_flutter", pa.bool_())]
    ),
    "audio_clicks": pa.schema(
        [("clip_id", pa.string()), ("n_samples", pa.int64()),
         ("n_frames", pa.int32()), ("n_cand", pa.int32()),
         ("n_clicks", pa.int32()), ("max_d2", pa.int64()),
         ("is_clicky", pa.bool_())]
    ),
    "compression_ratio": pa.schema(
        [("doc_id", pa.int64()), ("n_bytes", pa.int64()),
         ("z_bytes", pa.int64()), ("ratio_q", pa.int64()),
         ("is_repetitive", pa.bool_()), ("is_random", pa.bool_())]
    ),
    "audio_redact": pa.schema(
        [("clip_id", pa.string()), ("codec", pa.string()),
         ("n_spans", pa.int32()), ("n_muted", pa.int64()),
         ("redacted_md5", pa.string()), ("redacted_transcript", pa.string())]
    ),
    "audio_watermark": pa.schema(
        [("clip_id", pa.string()), ("n_samples", pa.int64()),
         ("wm_corr", pa.int64()), ("energy", pa.int64()),
         ("sigma_q2", pa.int64()), ("is_watermarked", pa.bool_())]
    ),
    "audio_turns": pa.schema(
        [("clip_id", pa.string()), ("n_frames", pa.int32()),
         ("n_eval", pa.int32()), ("n_turns", pa.int32()),
         ("turns_csv", pa.string()), ("is_multi_voice", pa.bool_())]
    ),
    "audio_mark_roundtrip": pa.schema(
        [("clip_id", pa.string()), ("marked", pa.bool_()),
         ("n_samples", pa.int64()), ("wm_corr", pa.int64()),
         ("energy", pa.int64()), ("sigma_q2", pa.int64()),
         ("is_watermarked", pa.bool_())]
    ),
    "audio_wm_robustness": pa.schema(
        [("config", pa.string()), ("armed", pa.bool_()),
         ("n_clips", pa.int64()), ("n_detected", pa.int64()),
         ("detect_rate_r", pa.float64()), ("min_sigma_q2", pa.int64())]
    ),
    "audio_lra": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_st_blocks", pa.int32()), ("n_lra_gated", pa.int32()),
         ("lra_r", pa.float64()), ("is_overcompressed", pa.bool_())]
    ),
    "crossmodal_dedup": pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("jaccard_r", pa.float64()), ("ber_r", pa.float64()),
         ("audio_match", pa.bool_())]
    ),
    "audio_noise_robustness": pa.schema(
        [("max_bucket", pa.int32()), ("min_votes", pa.int32()),
         ("snr_db", pa.int32()), ("n_injected", pa.int64()),
         ("fp_recovered", pa.int64()), ("lm_recovered", pa.int64()),
         ("lm_extra_pairs", pa.int64()),
         ("fp_recall_r", pa.float64()), ("lm_recall_r", pa.float64())]
    ),
    "audio_dedup_resolve": pa.schema(
        [("clip_id", pa.string()), ("component", pa.string()),
         ("cluster_size", pa.int64()), ("keep", pa.bool_())]
    ),
    "audio_mel": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_frames", pa.int32()), ("n_mels", pa.int32()),
         ("n_bytes", pa.int32()), ("feat_h", pa.int64())]
    ),
    "text_normalize": pa.schema(
        [("doc_id", pa.int64()), ("n_in", pa.int32()),
         ("n_out", pa.int32()), ("n_cr", pa.int32()),
         ("n_ctl", pa.int32()), ("nfc_changed", pa.bool_()),
         ("changed", pa.bool_()), ("norm_md5", pa.string())]
    ),
    "corpus_overlap": pa.schema(
        [("ca", pa.string()), ("cb", pa.string()), ("k", pa.int32()),
         ("union_k", pa.int64()), ("inter_k", pa.int64()),
         ("jaccard_est_r", pa.float64()),
         ("contain_b_in_a_r", pa.float64()),
         ("contain_a_in_b_r", pa.float64()),
         ("jaccard_exact_r", pa.float64()),
         ("abs_err_r", pa.float64())]
    ),
    "audio_pitch_dup": pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("edit_class", pa.string()), ("shift", pa.int32()),
         ("dur_cells_r", pa.float64()), ("corr_r", pa.float64()),
         ("scale_est_r", pa.float64()), ("votes", pa.int32()),
         ("distinct", pa.int32()), ("stationary", pa.bool_()),
         ("confirmed", pa.bool_())]
    ),
    "audio_halluc": pa.schema(
        [("clip_id", pa.string()), ("ok", pa.bool_()),
         ("n_tokens", pa.int32()), ("dur_dec_ms", pa.int32()),
         ("speech_ms", pa.int32()), ("speech_ratio_r", pa.float64()),
         ("tail_period", pa.int32()), ("tail_repeats", pa.int32()),
         ("text_over_silence", pa.bool_()), ("speech_no_text", pa.bool_()),
         ("end_loop", pa.bool_()), ("stock_caption", pa.bool_()),
         ("is_halluc", pa.bool_())]
    ),
    "audio_musicspeech": pa.schema(
        [("clip_id", pa.string()), ("n_env", pa.int32()),
         ("n_tone", pa.int32()), ("n_active", pa.int32()),
         ("syl_r", pa.float64()), ("stable_r", pa.float64()),
         ("av_label", pa.string())]
    ),
    "audio_truepeak": pa.schema(
        [("clip_id", pa.string()), ("n_samples", pa.int64()),
         ("sample_peak", pa.int32()), ("tp_q15", pa.int64()),
         ("is_tp_over", pa.bool_()), ("is_hidden_over", pa.bool_()),
         ("is_hot", pa.bool_())]
    ),
    "audio_downmix": pa.schema(
        [("clip_id", pa.string()), ("n_ch", pa.int32()),
         ("downmix_mode", pa.string()), ("sr_hz", pa.int32()),
         ("dur_ms", pa.int32()), ("n_bytes", pa.int32()),
         ("payload_h", pa.int64())]
    ),
    "code_switch": pa.schema(
        [("doc_id", pa.int64()), ("n_windows", pa.int32()),
         ("n_confident", pa.int32()), ("dominant_lang", pa.string()),
         ("n_langs", pa.int32()), ("minority_cnt", pa.int32()),
         ("n_switches", pa.int32()), ("code_switched", pa.bool_())]
    ),
    "audio_speed_dup": pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("shift_r", pa.float64()), ("corr_r", pa.float64()),
         ("speed_est", pa.float64()), ("votes", pa.int32()),
         ("confirmed", pa.bool_())]
    ),
    "audio_reverb": pa.schema(
        [("clip_id", pa.string()), ("n_frames", pa.int32()),
         ("n_offsets", pa.int32()), ("n_decays", pa.int32()),
         ("decay_r", pa.float64()), ("rt60_r", pa.float64()),
         ("is_reverberant", pa.bool_())]
    ),
    "lsh_tuning": pa.schema(
        [("bands", pa.int32()), ("n_candidates", pa.int64()),
         ("n_injected", pa.int64()), ("rec_m3", pa.int64()),
         ("rec_m6", pa.int64()), ("rec_m12", pa.int64()),
         ("rec_m24", pa.int64())]
    ),
    "image_features": pa.schema(
        [("media_id", pa.string()), ("kind", pa.string()),
         ("ok", pa.bool_()), ("n_bytes", pa.int64())]
        + [(f"f{i}", pa.float64()) for i in range(8)]
    ),
    "image_near_dup": pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("hamming", pa.int32())]
    ),
    "image_dedup_clusters": pa.schema(
        [("media_id", pa.string()), ("component", pa.string()),
         ("cluster_size", pa.int64())]
    ),
    "image_phash_near_dup": pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("hamming", pa.int32())]
    ),
    "image_cluster_split": pa.schema(
        [("media_id", pa.string()), ("split", pa.string())]
    ),
    "image_hash_recall": pa.schema(
        [("method", pa.string()), ("n_hashed", pa.int64()),
         ("n_pairs", pa.int64()), ("n_shared_all", pa.int64()),
         ("n_unique", pa.int64())]
    ),
    "utterance_audit": pa.schema(
        [("table", pa.string()), ("column", pa.string()),
         ("issue_type", pa.string()), ("count", pa.int64()),
         ("total", pa.int64()), ("percent", pa.float64()),
         ("severity", pa.string()), ("description", pa.string())]
    ),
    "utterance_gate": pa.schema(
        [("clip_id", pa.string()), ("start_ms", pa.int32()),
         ("dur_ms", pa.int32()), ("decision", pa.string()),
         ("decision_reason", pa.string())]
    ),
    "clips_gate_rollup": pa.schema(
        [("lang_pred", pa.string()), ("codec", pa.string()),
         ("n_clips", pa.int64()), ("n_keep", pa.int64()),
         ("keep_rate_r", pa.float64()), ("audio_seconds_r", pa.float64())]
    ),
    "gate_bias": pa.schema(
        [("codec", pa.string()), ("n", pa.int64()), ("n_keep", pa.int64()),
         ("keep_rate_r", pa.float64()), ("wilson_low_r", pa.float64()),
         ("wilson_up_r", pa.float64()), ("rest_rate_r", pa.float64()),
         ("impact_ratio_r", pa.float64()), ("biased_low", pa.bool_())]
    ),
    "clips_funnel": pa.schema(
        [("codec", pa.string()), ("n_raw", pa.int64()),
         ("n_decode_ok", pa.int64()), ("n_signal_ok", pa.int64()),
         ("n_transcript_ok", pa.int64()), ("n_keep", pa.int64())]
    ),
    "clips_gate_issues": pa.schema(
        [("table", pa.string()), ("column", pa.string()),
         ("issue_type", pa.string()), ("count", pa.int64()),
         ("total", pa.int64()), ("percent", pa.float64()),
         ("severity", pa.string()), ("description", pa.string())]
    ),
}


def expected_path(name: str) -> str:
    return os.path.join(EXPECTED_DIR, f"{name}.parquet")


def compression_inject(doc_id: int, text: str | None) -> str | None:
    """The deterministic defect injection the ``compression_ratio`` query
    applies on BOTH sides (Spark expressions / this Python twin): every
    doc_id ≡ 3 (mod 17) becomes template spam, every ≡ 9 (mod 17) becomes
    base64-of-md5-chain garbage (the binary-pasted-as-text class)."""
    import base64
    import hashlib

    if doc_id % 17 == 3:
        return " ".join(["buy cheap now"] * 80)
    if doc_id % 17 == 9:
        return "".join(
            base64.b64encode(
                bytes.fromhex(hashlib.md5(f"{doc_id}#{i}".encode()).hexdigest())
            ).decode()
            for i in range(10)
        )
    return text


def _compression_expected(docs) -> dict:
    """Twin of ``operators.compress.compression_flags`` over the injected
    corpus: the SAME zlib from the same interpreter recomputes n/z bytes
    (compressed length is a pure function of input bytes for a fixed zlib
    build + level), and the fixed-point ratio + both decision laws are
    replayed in pure Python integers."""
    import zlib

    from .operators.compress import RANDOM_MIN_BYTES, RANDOM_Q, REPETITIVE_Q, Z_LEVEL

    out: dict[str, list] = {
        "doc_id": [], "n_bytes": [], "z_bytes": [], "ratio_q": [],
        "is_repetitive": [], "is_random": [],
    }
    for doc_id, text in sorted(docs):
        t = compression_inject(int(doc_id), text)
        b = (t or "").encode("utf-8")
        z = len(zlib.compress(b, Z_LEVEL))
        rq = (len(b) << 20) // z
        out["doc_id"].append(int(doc_id))
        out["n_bytes"].append(len(b))
        out["z_bytes"].append(z)
        out["ratio_q"].append(rq)
        out["is_repetitive"].append(rq >= REPETITIVE_Q)
        out["is_random"].append(len(b) >= RANDOM_MIN_BYTES and rq <= RANDOM_Q)
    return out


def _audio_redact_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_redact.redact_stats``: shared decode and
    shared semantic constants (PII_PATTERNS / toxicity list — the scrub
    chain's spec), but the span-finding, merge sweep, integer char→sample
    mapping, mute and md5 are replayed here INDEPENDENTLY in pure
    Python/numpy, so an operator bug in any of those laws diverges."""
    import hashlib
    import re as _re

    import numpy as np

    from .functions.audio import _decode_i16, encode_pcm16
    from .functions.text import _TOX_PATTERN, PII_PATTERNS, scrub_text
    from .synth import generate_clips

    pats = [(nm, _re.compile(p)) for nm, p, _ in PII_PATTERNS] + [
        ("toxicity", _re.compile(_TOX_PATTERN))
    ]
    pdf = generate_clips(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "codec": [], "n_spans": [], "n_muted": [],
        "redacted_md5": [], "redacted_transcript": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        text = r["transcript"]
        raw: list[list[int]] = []
        for nm, pat in pats:
            for m in pat.finditer(text or ""):
                if nm == "url_credential":
                    raw.append([m.start(2), m.end(2)])
                else:
                    raw.append([m.start(), m.end()])
        raw.sort()
        spans: list[list[int]] = []
        for s in raw:
            if spans and s[0] <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], s[1])
            else:
                spans.append(list(s))
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = None
        if q is None:
            codec, n_muted, digest = r["codec"], 0, None
        else:
            nq, m_chars = len(q), len(text or "")
            w = np.array(q, dtype=np.int16).copy()
            n_muted = 0
            if nq and m_chars:
                for c0, c1 in spans:
                    s0 = (c0 * nq) // m_chars
                    s1 = min((c1 * nq + m_chars - 1) // m_chars, nq)
                    if s1 > s0:
                        seg = w[s0:s1]
                        n_muted += int((seg != 0).sum())
                        w[s0:s1] = 0
            red = encode_pcm16(w.astype(np.float64) / 32767.0)
            codec, digest = "pcm16", hashlib.md5(red).hexdigest()
        out["clip_id"].append(r["clip_id"])
        out["codec"].append(codec)
        out["n_spans"].append(len(spans))
        out["n_muted"].append(n_muted)
        out["redacted_md5"].append(digest)
        out["redacted_transcript"].append(scrub_text(text))
    return out


def _audio_watermark_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_watermark.watermark_flags``: the decode
    dispatch is shared; the carrier derivation (splitmix64 word stream →
    MSB-first ±1 chips) is replayed in PURE PYTHON integers — the part a
    kernel bug would most plausibly corrupt (bit order, word boundary,
    prefix stability under cache growth) — and the decision law
    (``corr*corr >= TAU^2 * energy`` with Python ints, where the square
    exceeds int64) is replayed independently of the operator's
    decimal(38,0) Catalyst expression.  corr/energy themselves are exact
    integer dots (int16 × ±1), so twin and kernel are bit-identical by
    construction."""
    import numpy as np

    from .functions.audio import _decode_i16
    from .functions.watermark import WM_KEY_DEFAULT, WM_MIN_SAMPLES, WM_TAU
    from .synth import make_audio_watermark_corpus

    mask = (1 << 64) - 1

    def chips(nc: int) -> list[int]:
        x = WM_KEY_DEFAULT & mask
        out: list[int] = []
        while len(out) < nc:
            x = (x + 0x9E3779B97F4A7C15) & mask
            z = x
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
            z ^= z >> 31
            for b in range(63, -1, -1):
                out.append(1 if (z >> b) & 1 else -1)
        return out[:nc]

    pdf = make_audio_watermark_corpus(n, seed=seed)
    decoded: list[tuple[str, object]] = []
    max_len = 0
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = None
        decoded.append((r["clip_id"], q))
        if q is not None:
            max_len = max(max_len, len(q))
    p_all = np.array(chips(max_len), dtype=np.int64)
    out: dict[str, list] = {
        "clip_id": [], "n_samples": [], "wm_corr": [], "energy": [],
        "sigma_q2": [], "is_watermarked": [],
    }
    for clip_id, q in decoded:
        nq = 0 if q is None else len(q)
        if nq == 0:
            corr, energy, sigma_q2 = 0, 0, None
        else:
            q64 = q.astype(np.int64)
            corr = int(np.dot(q64, p_all[:nq]))
            energy = int(np.dot(q64, q64))
            sigma_q2 = ((corr * corr) << 20) // energy if energy > 0 else None
        flag = (
            nq >= WM_MIN_SAMPLES and energy > 0 and corr > 0
            and corr * corr >= WM_TAU * WM_TAU * energy
        )
        out["clip_id"].append(clip_id)
        out["n_samples"].append(nq)
        out["wm_corr"].append(corr)
        out["energy"].append(energy)
        out["sigma_q2"].append(sigma_q2)
        out["is_watermarked"].append(flag)
    return out


def _audio_turns_expected(n=300, seed=42) -> dict:
    """Twin of ``operators.audio_turns.turn_flags``: decode, log-mel and
    the shape/activity statistics are shared kernels (the reverb-oracle
    pattern); the novelty CURVE is recomputed INDEPENDENTLY (naive
    window slicing + math.fsum means vs the kernel's cumsum
    vectorization — validating the vectorization itself), and the
    guard / threshold / non-max-suppression walk is replayed in plain
    Python.  Emitted values are integers and strings; the measured
    ~130x threshold margin makes the float recomputation safe."""
    import math

    import numpy as np

    from .functions.audio import _decode_i16
    from .functions.mel import log_mel
    from .functions.turns import (
        TURN_ACT_FLOOR,
        TURN_ACT_FRAC,
        TURN_STEP,
        TURN_THETA,
        TURN_WIN,
        shape_vectors,
    )
    from .synth import make_audio_turns_corpus

    pdf = make_audio_turns_corpus(n, seed=seed)
    out: dict[str, list] = {
        "clip_id": [], "n_frames": [], "n_eval": [], "n_turns": [],
        "turns_csv": [], "is_multi_voice": [],
    }
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = np.zeros(0, dtype=np.int16)
        lm = log_mel(q.astype(np.float64) / 32768.0, int(r["sr_hz"] or 0))
        shape, band_mean = shape_vectors(lm)
        active = band_mean > TURN_ACT_FLOOR
        nfr = int(lm.shape[0])
        w, step = TURN_WIN, TURN_STEP
        need = int(math.ceil(TURN_ACT_FRAC * w))
        pos = list(range(w, nfr - w + 1, step))
        d: list[float] = []
        ev: list[bool] = []
        for t in pos:
            la = int(active[t - w: t].sum())
            ra = int(active[t: t + w].sum())
            ev.append(la >= need and ra >= need)
            acc = 0.0
            for b in range(shape.shape[1]):
                lmean = math.fsum(shape[t - w: t, b]) / w
                rmean = math.fsum(shape[t: t + w, b]) / w
                acc += (lmean - rmean) ** 2
            d.append(acc / shape.shape[1])
        turns: list[int] = []
        for i, t in enumerate(pos):
            if not ev[i] or not d[i] > TURN_THETA:
                continue
            best = True
            for j, tj in enumerate(pos):
                if j == i or not ev[j] or abs(tj - t) > w:
                    continue
                if d[j] > d[i] or (d[j] == d[i] and tj < t):
                    best = False
                    break
            if best:
                turns.append(t)
        out["clip_id"].append(r["clip_id"])
        out["n_frames"].append(nfr)
        out["n_eval"].append(sum(ev))
        out["n_turns"].append(len(turns))
        out["turns_csv"].append(",".join(str(t) for t in turns))
        out["is_multi_voice"].append(len(turns) >= 1)
    return out


def _audio_wm_robust_expected(n=120, seed=42) -> dict:
    """Twin of the ``audio_wm_robustness`` query: decode is the shared
    dispatch; the splitmix64 ±1 carrier is replayed in PURE PYTHON
    integers and the detection decision in unbounded Python ints (as in
    the audio_watermark twin), then the per-(config, armed) curve is
    aggregated with exact counts — detection rate, plus the minimum
    detected ``sigma_q2`` margin replayed via the same ``<<20`` integer
    law the kernel emits."""
    import numpy as np

    from .functions.audio import _decode_i16
    from .functions.watermark import WM_KEY_DEFAULT, WM_MIN_SAMPLES, WM_TAU
    from .synth import make_audio_wm_robust_corpus

    mask = (1 << 64) - 1

    def chips(nc: int) -> list[int]:
        x = WM_KEY_DEFAULT & mask
        out: list[int] = []
        while len(out) < nc:
            x = (x + 0x9E3779B97F4A7C15) & mask
            z = x
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
            z ^= z >> 31
            for b in range(63, -1, -1):
                out.append(1 if (z >> b) & 1 else -1)
        return out[:nc]

    pdf = make_audio_wm_robust_corpus(n, seed=seed)
    decoded: list[tuple[str, object]] = []
    max_len = 0
    for _, r in pdf.iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = None
        decoded.append((r["clip_id"], q))
        if q is not None:
            max_len = max(max_len, len(q))
    p_all = np.array(chips(max_len), dtype=np.int64)
    agg: dict[tuple[str, bool], dict] = {}
    for clip_id, q in decoded:
        nq = 0 if q is None else len(q)
        if nq == 0:
            corr, energy = 0, 0
        else:
            q64 = q.astype(np.int64)
            corr = int(np.dot(q64, p_all[:nq]))
            energy = int(np.dot(q64, q64))
        flag = (
            nq >= WM_MIN_SAMPLES and energy > 0 and corr > 0
            and corr * corr >= WM_TAU * WM_TAU * energy
        )
        base, armed_s, cfg = clip_id.rsplit("_", 2)
        st = agg.setdefault(
            (cfg, armed_s == "m"), {"n": 0, "d": 0, "min_sig": None}
        )
        st["n"] += 1
        if flag:
            st["d"] += 1
            sig = ((corr * corr) << 20) // energy
            if st["min_sig"] is None or sig < st["min_sig"]:
                st["min_sig"] = sig
    out: dict[str, list] = {
        "config": [], "armed": [], "n_clips": [], "n_detected": [],
        "detect_rate_r": [], "min_sigma_q2": [],
    }
    for (cfg, armed) in sorted(agg):
        st = agg[(cfg, armed)]
        out["config"].append(cfg)
        out["armed"].append(armed)
        out["n_clips"].append(st["n"])
        out["n_detected"].append(st["d"])
        out["detect_rate_r"].append(spark_round(st["d"] / st["n"], 4))
        out["min_sigma_q2"].append(st["min_sig"])
    return out


def _audio_mark_roundtrip_expected(n=300, seed=42) -> dict:
    """Twin of ``mark_clips`` → ``watermark_flags`` over the PLAIN clips
    corpus: replays the EMBED law (amp = max(8, isqrt(E//n) //
    WM_EMBED_DIV); q + amp·chips clipped to the int16 rails) and the
    detection law with pure-Python-integer chips — independent of the
    numpy kernels except the shared decode dispatch.  Statistics are
    exact integer dots, so twin and pipeline are bit-identical by
    construction; the roundtrip invariant (every embedded mark detected,
    nothing else flagged) is checked as data."""
    import math

    import numpy as np

    from .functions.audio import _decode_i16
    from .functions.watermark import (
        WM_EMBED_DIV,
        WM_KEY_DEFAULT,
        WM_MIN_SAMPLES,
        WM_TAU,
    )
    from .synth import generate_clips

    mask = (1 << 64) - 1

    def chips(nc: int) -> list[int]:
        x = WM_KEY_DEFAULT & mask
        out: list[int] = []
        while len(out) < nc:
            x = (x + 0x9E3779B97F4A7C15) & mask
            z = x
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
            z ^= z >> 31
            for b in range(63, -1, -1):
                out.append(1 if (z >> b) & 1 else -1)
        return out[:nc]

    pdf = generate_clips(n, seed=seed)
    decoded: list[tuple[str, object]] = []
    max_len = 0
    for _, r in pdf.sort_values("clip_id").iterrows():
        try:
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            q = None
        decoded.append((r["clip_id"], q))
        if q is not None:
            max_len = max(max_len, len(q))
    p_all = np.array(chips(max_len), dtype=np.int64)
    out: dict[str, list] = {
        "clip_id": [], "marked": [], "n_samples": [], "wm_corr": [],
        "energy": [], "sigma_q2": [], "is_watermarked": [],
    }
    for clip_id, q in decoded:
        nq = 0 if q is None else len(q)
        marked = nq >= WM_MIN_SAMPLES
        if nq == 0:
            corr, energy, sigma_q2 = 0, 0, None
        else:
            q64 = q.astype(np.int64)
            p = p_all[:nq]
            if marked:
                energy0 = int(np.dot(q64, q64))
                amp = max(8, math.isqrt(energy0 // nq) // WM_EMBED_DIV)
                q64 = np.clip(q64 + amp * p, -32768, 32767)
            corr = int(np.dot(q64, p))
            energy = int(np.dot(q64, q64))
            sigma_q2 = ((corr * corr) << 20) // energy if energy > 0 else None
        flag = (
            nq >= WM_MIN_SAMPLES and energy > 0 and corr > 0
            and corr * corr >= WM_TAU * WM_TAU * energy
        )
        out["clip_id"].append(clip_id)
        out["marked"].append(marked)
        out["n_samples"].append(nq)
        out["wm_corr"].append(corr)
        out["energy"].append(energy)
        out["sigma_q2"].append(sigma_q2)
        out["is_watermarked"].append(flag)
    return out


def _src_key(name: str, sf_dir: str | None) -> dict | None:
    """Cache key + size guard; None means 'skip generation' (too large)."""
    if name in (
        "minhash_lsh", "simhash_near_dup", "ann_lsh_topk",
        "winnow_fingerprints", "embedding_near_dup_blocked", "ann_ivf_topk",
        "ann_recall", "dedup_clusters", "dedup_resolve", "dsir_weights",
        "temperature_a07",
        "lsh_tuning", "semantic_prune", "corpus_overlap", "text_normalize",
        "ann_pq_topk", "ann_pq_recall", "quality_classifier",
        "quality_calibration", "compression_ratio", "bpe_merges",
        "bpe_encode", "bloom_decontaminate", "lsh_incremental",
    ):
        table = (
            "embeddings"
            if name in (
                "ann_lsh_topk", "embedding_near_dup_blocked", "ann_ivf_topk",
                "ann_recall", "semantic_prune", "ann_pq_topk",
                "ann_pq_recall",
            )
            else "documents"
        )
        path = os.path.join(sf_dir, f"{table}.parquet")
        import pyarrow.parquet as pq

        n = pq.ParquetFile(path).metadata.num_rows
        if n > _MAX_ORACLE_ROWS:
            return None
        return {"v": _VERSION, "src": os.path.abspath(path), "rows": n}
    return {"v": _VERSION, "src": f"synthetic-clips-seed42:{name}"}


def ensure_expected(name: str, sf_dir: str | None = None) -> bool:
    """Materialize ``expected/<name>.parquet`` if missing or stale.

    Returns True when the file is present and current for this input."""
    key = _src_key(name, sf_dir)
    if key is None:
        return False
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    meta_path = os.path.join(EXPECTED_DIR, f"{name}.meta.json")
    out_path = expected_path(name)
    if os.path.exists(meta_path) and os.path.exists(out_path):
        try:
            with open(meta_path) as fh:
                if json.load(fh) == key:
                    return True
        except (json.JSONDecodeError, OSError):
            pass
    if name == "minhash_lsh":
        data = _minhash_lsh_agg(_read_documents(sf_dir))
    elif name == "lsh_incremental":
        data = _lsh_incremental_expected(_read_documents(sf_dir))
    elif name == "compression_ratio":
        data = _compression_expected(_read_documents(sf_dir))
    elif name == "dedup_clusters":
        data = _dedup_clusters_expected(_read_documents(sf_dir))
    elif name == "cluster_split":
        data = _cluster_split_expected(sf_dir)
    elif name == "dedup_resolve":
        data = _dedup_resolve_expected(_read_documents(sf_dir))
    elif name == "winnow_fingerprints":
        data = _winnow_stats(_read_documents(sf_dir))
    elif name == "simhash_near_dup":
        data = _simhash_agg(_read_documents(sf_dir))
    elif name == "ann_lsh_topk":
        data = _ann_lsh_topk(_read_embeddings(sf_dir))
    elif name == "embedding_near_dup_blocked":
        data = _near_dup_blocked_agg(_read_embeddings(sf_dir))
    elif name == "ann_ivf_topk":
        data = _ivf_topk_expected(_read_embeddings(sf_dir))
    elif name == "ann_pq_topk":
        data = _pq_topk_expected(_read_embeddings(sf_dir))
    elif name == "ann_pq_recall":
        data = _ann_pq_recall_expected(_read_embeddings(sf_dir))
    elif name == "ann_recall":
        data = _ann_recall_expected(_read_embeddings(sf_dir))
    elif name == "media_features":
        data = _media_features_expected()
    elif name == "audio_fingerprint_dedup":
        data = _audio_fingerprint_expected()
    elif name == "label_noise_audit":
        data = _label_noise_expected()
    elif name == "audio_loop_scan":
        data = _audio_loop_expected()
    elif name == "audio_trim":
        data = _audio_trim_expected()
    elif name == "audio_loop_arbitrary":
        data = _audio_loop_arbitrary_expected()
    elif name == "audio_boilerplate":
        data = _audio_boilerplate_expected()
    elif name == "audio_quantization":
        data = _audio_quantization_expected()
    elif name == "audio_dedup_clusters":
        data = _audio_dedup_clusters_expected()
    elif name == "gate_consistency":
        data = _gate_consistency_expected()
    elif name == "channel_hot_buckets":
        data = _channel_hot_buckets_expected()
    elif name == "duration_batches":
        data = _duration_batches_expected()
    elif name == "mel_cmvn":
        data = _mel_cmvn_expected()
    elif name == "mel_cmvn_apply":
        data = _mel_cmvn_apply_expected()
    elif name == "crop_schedule":
        data = _crop_schedule_expected()
    elif name == "voice_triplets":
        data = _voice_triplets_expected()
    elif name == "audio_channel":
        data = _audio_channel_expected()
    elif name == "audio_voice":
        data = _audio_voice_expected()
    elif name == "audio_identity_split":
        data = _audio_identity_split_expected()
    elif name == "audio_split_leakage":
        data = _audio_split_leakage_expected()
    elif name == "audio_split_drift":
        data = _audio_split_drift_expected()
    elif name == "audio_specaugment":
        data = _audio_specaugment_expected()
    elif name == "training_manifest":
        data = _training_manifest_expected()
    elif name == "eval_manifest":
        data = _eval_manifest_expected()
    elif name == "gate_f1":
        data = _gate_f1_expected()
    elif name == "content_hot_buckets":
        data = _content_hot_buckets_expected()
    elif name == "audio_dedup_incremental":
        data = _audio_probe_expected()
    elif name == "image_dedup_incremental":
        data = _image_probe_expected()
    elif name == "eval_coverage":
        data = _eval_coverage_expected()
    elif name == "audio_multispeaker":
        data = _audio_multispeaker_expected()
    elif name == "voice_balance":
        data = _voice_balance_expected()
    elif name == "audio_augment":
        data = _audio_augment_expected()
    elif name == "audio_excerpt_match":
        data = _audio_excerpt_expected()
    elif name == "audio_constellation_match":
        data = _audio_constellation_expected()
    elif name == "audio_spectral":
        data = _audio_spectral_expected()
    elif name == "audio_dropout":
        data = _audio_dropout_expected()
    elif name == "audio_vad":
        data = _audio_vad_expected()
    elif name == "audio_snr":
        data = _audio_snr_expected()
    elif name == "audio_loudness":
        data = _audio_loudness_expected()
    elif name == "speaking_rate":
        data = _speaking_rate_expected()
    elif name == "audio_bandwidth":
        data = _audio_bandwidth_expected()
    elif name == "audio_audit_issues":
        data = _audio_audit_issues_expected()
    elif name == "audio_chunks":
        data = _audio_chunks_expected()
    elif name == "audio_decontaminate":
        data = _audio_decontaminate_expected()
    elif name == "audio_segments":
        data = _audio_segments_expected()
    elif name == "audio_resample":
        data = _audio_resample_expected()
    elif name == "audio_gain":
        data = _audio_gain_expected()
    elif name == "audio_declip":
        data = _audio_declip_expected()
    elif name == "clips_gate":
        data = _clips_gate_expected()
    elif name == "clips_gate_rollup":
        data = _clips_gate_rollup_expected()
    elif name == "gate_bias":
        data = _gate_bias_expected()
    elif name == "clips_funnel":
        data = _clips_funnel_expected()
    elif name == "clips_gate_issues":
        data = _clips_gate_issues_expected()
    elif name == "clips_gate_decide3":
        data = _clips_gate_decide3_expected()
    elif name == "clips_gate_v2":
        data = _clips_gate_v2_expected()
    elif name == "audio_quality_score":
        data = _audio_quality_score_expected()
    elif name == "dsir_weights":
        data = _dsir_weights_expected(sf_dir)
    elif name == "temperature_a07":
        data = _temperature_a07_expected(sf_dir)
    elif name == "quality_classifier":
        data = _quality_classifier_expected(sf_dir)
    elif name == "quality_calibration":
        data = _quality_calibration_expected(sf_dir)
    elif name == "gate_distill":
        data = _gate_distill_expected()
    elif name == "audio_embed_dedup":
        data = _audio_embed_dedup_expected()
    elif name == "speaker_balance":
        data = _speaker_balance_expected()
    elif name == "codec_sniff":
        data = _codec_sniff_expected()
    elif name == "bpe_merges":
        data = _bpe_merges_expected(sf_dir)
    elif name == "bpe_encode":
        data = _bpe_encode_expected(sf_dir)
    elif name == "bloom_decontaminate":
        data = _bloom_decon_expected(sf_dir)
    elif name == "lsh_tuning":
        data = _lsh_tuning_expected(sf_dir)
    elif name == "audio_hum":
        data = _audio_hum_expected()
    elif name == "audio_reverb":
        data = _audio_reverb_expected()
    elif name == "audio_speed_dup":
        data = _audio_speed_dup_expected()
    elif name == "audio_stereo":
        data = _audio_stereo_expected()
    elif name == "audio_downmix":
        data = _audio_downmix_expected()
    elif name == "audio_flutter":
        data = _audio_flutter_expected()
    elif name == "audio_clicks":
        data = _audio_clicks_expected()
    elif name == "audio_redact":
        data = _audio_redact_expected()
    elif name == "audio_watermark":
        data = _audio_watermark_expected()
    elif name == "audio_mark_roundtrip":
        data = _audio_mark_roundtrip_expected()
    elif name == "audio_wm_robustness":
        data = _audio_wm_robust_expected()
    elif name == "audio_turns":
        data = _audio_turns_expected()
    elif name == "audio_truepeak":
        data = _audio_truepeak_expected()
    elif name == "audio_musicspeech":
        data = _audio_musicspeech_expected()
    elif name == "audio_lra":
        data = _audio_lra_expected()
    elif name == "audio_halluc":
        data = _audio_halluc_expected()
    elif name == "audio_pitch_dup":
        data = _audio_pitch_dup_expected()
    elif name == "corpus_overlap":
        data = _corpus_overlap_expected(sf_dir)
    elif name == "text_normalize":
        data = _text_normalize_expected(sf_dir)
    elif name == "audio_mel":
        data = _audio_mel_expected()
    elif name == "audio_dedup_resolve":
        data = _audio_dedup_resolve_expected()
    elif name == "audio_noise_robustness":
        data = _audio_noise_expected()
    elif name == "crossmodal_dedup":
        data = _crossmodal_dedup_expected()
    elif name == "code_switch":
        data = _code_switch_expected(sf_dir)
    elif name == "clips_decontaminate":
        data = _clip_decontaminate_expected()
    elif name == "semantic_prune":
        data = _semantic_prune_expected(sf_dir)
    elif name == "image_features":
        data = _image_features_expected()
    elif name == "image_near_dup":
        data = _image_near_dup_expected()
    elif name == "image_dedup_clusters":
        data = _image_dedup_clusters_expected()
    elif name == "image_phash_near_dup":
        data = _image_phash_near_dup_expected()
    elif name == "image_hash_recall":
        data = _image_hash_recall_expected()
    elif name == "image_cluster_split":
        data = _image_cluster_split_expected()
    elif name == "utterance_audit":
        data = _utterance_audit_expected()
    elif name == "utterance_gate":
        data = _utterance_gate_expected()
    else:
        raise ValueError(f"unknown expected table {name!r}")
    import pyarrow.parquet as pq

    table = pa.Table.from_pydict(data, schema=_SCHEMAS[name])
    pq.write_table(table, out_path)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(key, fh)
    os.replace(tmp, meta_path)
    return True
