"""Independent verification of the embedding_neardup synthetic-scale
section's closed-form oracle (operators/similarity.py).

The Spark side generates 65,536 vectors as 16,384 Reed-Muller RM(2,5)
sign directions x 4 exact copies and claims, by coding theory, that the
banded-LSH + connected-components reduction is exactly G clusters of
size C with zero cross-group pairs. These tests re-derive that claim
with numpy — the construction's injectivity and minimum distance over
ALL 16,383 pairwise difference classes (linearity makes the pair check
a single-codeword weight check), plus a direct Spark-vs-numpy slice
comparison of the generated corpus itself."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from twilio_event_streams_reporting_example_spark.operators.similarity import (
    DIM,
    SCALE_DIM,
    _SCALE_RM_M,
    SCALE_DUP_COPIES,
    SCALE_DUP_GROUPS,
    SCALE_DUP_N,
    SCALE_ND_THRESHOLD,
    SEMDEDUP_TARGET_CELL,
    _rm2_quad_mask,
    _SCALE_KEEPER_SUM,
    _SCALE_PAIRS,
    scale_corpus,
    semantic_dedup,
    semdedup_n_cells,
    with_norm,
)


def _codeword_bits(g: np.ndarray) -> np.ndarray:
    """(len(g), SCALE_DIM) uint8 matrix of RM(2,5) codeword bits for
    message indices g — the SAME formula as scale_corpus's per-slot
    expression."""
    glin = (g & (SCALE_DIM - 1)).astype(np.uint64)
    gquad = (g >> _SCALE_RM_M).astype(np.uint64)
    masks = np.array([_rm2_quad_mask(x) for x in range(SCALE_DIM)], dtype=np.uint64)
    xs = np.arange(SCALE_DIM, dtype=np.uint64)

    def popcount(a):
        return np.unpackbits(a.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1).sum(
            axis=1
        )

    out = np.empty((len(g), SCALE_DIM), dtype=np.uint8)
    for x in range(SCALE_DIM):
        out[:, x] = (popcount(glin & xs[x]) + popcount(gquad & masks[x])) % 2
    return out


def test_rm_code_min_distance_guarantees_closed_form():
    """Linearity: the XOR of codewords g and h is the codeword of g^h,
    so 'every distinct pair differs in >= 8 coordinates' reduces to
    'every nonzero difference class d in [1, G) has weight >= 8'.
    Weight w -> cosine 1 - 2w/32, so min weight 8 caps cross-group
    cosine at 0.5 — strictly under the 0.8 scale threshold, which is
    what makes the section's oracle closed-form rather than sampled."""
    d = np.arange(1, SCALE_DUP_GROUPS, dtype=np.uint64)
    weights = _codeword_bits(d).sum(axis=1)
    assert weights.min() >= 8  # [32, 16, 8] code: min distance 8
    max_cross_cos = 1 - 2 * weights.min() / SCALE_DIM
    assert max_cross_cos <= 0.5 < SCALE_ND_THRESHOLD
    # injectivity of the group -> direction map (weight 0 only at d=0)
    assert (weights > 0).all()


def test_closed_form_constants():
    g, c = SCALE_DUP_GROUPS, SCALE_DUP_COPIES
    assert SCALE_DUP_N == g * c
    assert _SCALE_PAIRS == g * (c * (c - 1) // 2)
    # keeper of group k is its min id k*c
    assert _SCALE_KEEPER_SUM == sum(k * c for k in range(g))


def test_scale_corpus_matches_numpy_slice(spark):
    """The Spark per-slot bit-math expression and the numpy re-derivation
    agree on actual vector values (first 64 groups x all copies)."""
    n = 64 * SCALE_DUP_COPIES
    rows = (
        scale_corpus(spark)
        .filter(F.col("id") < n)
        .orderBy("id")
        .collect()
    )
    got = np.array([r.v for r in rows])
    g = np.arange(n) // SCALE_DUP_COPIES
    want = 1.0 - 2.0 * _codeword_bits(g.astype(np.uint64)).astype(np.float64)
    assert got.shape == (n, SCALE_DIM)
    assert (got == want).all()
    # copies within a group are identical; adjacent groups are not
    assert (got[0] == got[SCALE_DUP_COPIES - 1]).all()
    assert not (got[0] == got[SCALE_DUP_COPIES]).all()


# --------------------------------------------- SemDeDup cell-size scaling


def _pseudo_random_emb(spark, n: int):
    """(id, v, nrm): deterministic hash-derived vectors — spread-out test
    data for the cell-balance property (no RNG, reproducible)."""
    v = F.expr(
        f"transform(sequence(1, {DIM}), j -> (pmod(hash(id, j), 2001) - 1000) / 1000.0)"
    )
    return with_norm(spark.range(n).select("id", v.alias("v")))


def test_semdedup_cells_bound_quadratic_work(spark):
    """The API form of the 100 TB claim: when K is derived from N via
    semdedup_n_cells (K ~ N / target), per-cell sizes — and therefore
    the per-cell exact-quadratic pair blocks — stay bounded as N grows,
    instead of the whole corpus landing in a fixed 16 cells."""
    target = SEMDEDUP_TARGET_CELL
    max_sizes = {}
    for n in (1024, 4096):
        k = semdedup_n_cells(n, target)
        assert k == -(-n // target)
        emb = _pseudo_random_emb(spark, n).cache()
        out = semantic_dedup(spark, "unused", emb=emb, n_cells=k)
        sizes = (
            out.select("cell_id", "cell_size").distinct().toPandas()["cell_size"]
        )
        emb.unpersist()
        assert int(sizes.sum()) == n  # every vector assigned exactly once
        # balance: no cell grows past a small multiple of the target, so
        # per-cell pair count is O(target^2) independent of N
        assert int(sizes.max()) <= 4 * target, (n, k, int(sizes.max()))
        max_sizes[n] = int(sizes.max())
    # 4x the corpus with scaled K must NOT mean 4x the max cell
    assert max_sizes[4096] <= 2 * max_sizes[1024]


def test_semdedup_n_cells_rule():
    assert semdedup_n_cells(0) == 1
    assert semdedup_n_cells(1) == 1
    assert semdedup_n_cells(64, 64) == 1
    assert semdedup_n_cells(65, 64) == 2
    assert semdedup_n_cells(10**12, 64) == -(-(10**12) // 64)


# ----------------------------------- representative-mode SemDeDup


def test_semdedup_representative_chain_semantics(spark):
    """The defining difference from the transitive rule: a chain
    v0 ~ v1 ~ v2 where cos(v0,v2) < tau. Transitive drops BOTH v1 and
    v2 (each has SOME lower-id mate >= tau); representative keeps v2,
    because its only >=tau mate (v1) was itself dropped."""
    from twilio_event_streams_reporting_example_spark.operators.similarity import (
        semantic_dedup_representative,
    )

    # 2-d unit-ish vectors: angles 0, 50, 100 degrees; tau=0.7 ->
    # cos(0,50)=0.643... wait, need cos(adjacent) >= tau > cos(ends).
    # angles 0, 40, 80: cos40=0.766, cos80=0.174; tau=0.7.
    import math

    vecs = [
        [math.cos(math.radians(a)), math.sin(math.radians(a))]
        for a in (0.0, 40.0, 80.0)
    ]
    emb = with_norm(
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
        )
    ).cache()
    tau = 0.7
    rep = (
        semantic_dedup_representative(spark, "unused", emb=emb, n_cells=1, tau=tau)
        .orderBy("vec_id")
        .collect()
    )
    tra = (
        semantic_dedup(spark, "unused", emb=emb, n_cells=1, tau=tau)
        .orderBy("vec_id")
        .collect()
    )
    emb.unpersist()
    assert [r.kept for r in tra] == [1, 0, 0]  # transitive over-drops v2
    assert [r.kept for r in rep] == [1, 0, 1]  # representative keeps v2
    assert [r.cell_size for r in rep] == [3, 3, 3]


def test_semdedup_representative_matches_python_golden(spark):
    """Cross-check the distributed per-cell kernel against a direct
    single-process greedy reference on pseudo-random vectors."""
    import numpy as np

    from twilio_event_streams_reporting_example_spark.operators.similarity import (
        semantic_dedup_representative,
    )

    n, k, tau = 512, 8, 0.2  # low tau so drops actually occur
    emb = _pseudo_random_emb(spark, n).cache()
    out = (
        semantic_dedup_representative(spark, "unused", emb=emb, n_cells=k, tau=tau)
        .orderBy("vec_id")
        .toPandas()
    )
    rows = emb.orderBy("id").collect()
    emb.unpersist()
    V = np.array([[float(x) for x in r.v] for r in rows])
    nrm = np.array([float(r.nrm) for r in rows])
    # reference assignment: nearest of the first k vectors by cosine,
    # ties to the lower centroid id (same rule as _nearest_cell)
    cos_cent = (V @ V[:k].T) / np.outer(nrm, nrm[:k])
    cell = np.round(cos_cent, 9).argmax(axis=1)  # argmax takes first max
    golden_kept = {}
    for c in range(k):
        ids = [i for i in range(n) if cell[i] == c]
        kept_ids = []
        for i in ids:
            cos = [
                round(float(V[j] @ V[i] / (nrm[j] * nrm[i])), 9) for j in kept_ids
            ]
            if cos and max(cos) >= tau:
                golden_kept[i] = 0
            else:
                golden_kept[i] = 1
                kept_ids.append(i)
    assert len(out) == n
    assert int(out["kept"].sum()) < n  # drops occurred; test has teeth
    mismatches = [
        (i, int(out.loc[out.vec_id == i, "kept"].iloc[0]), golden_kept[i])
        for i in range(n)
        if int(out.loc[out.vec_id == i, "kept"].iloc[0]) != golden_kept[i]
    ]
    assert not mismatches, mismatches[:10]
