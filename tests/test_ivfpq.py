"""IVF-PQ / ADC (operators/similarity.py::ivfpq_topk) — pinned micro
codebooks, a numpy exact twin over the real sf0.001 embeddings, and a
recall sanity floor against exact search."""

import numpy as np
import pytest

from docling_translate_spark.operators.similarity import (
    IVF_GRID,
    ivf_centroid_ints,
    ivf_train_rows,
    ivfpq_topk,
    pq_codebook_ints,
)

SF_DIR = "/root/testdata/sf0.001"


def test_dim_not_divisible_raises():
    rows = [(0, [0.1] * 10)]
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebook_ints(rows, m=3, ks=2)


def test_micro_adc_pinned(spark):
    """dim 4, m=2 subspaces, 2 codes each (axis units): ADC of two
    axis-aligned vectors is hand-computable."""
    # vectors: 0 = +x (subspaces (1,0),(0,0)); 1 = +x jittered; 2 = +y
    # (second dim of subspace 0)
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [[IVF_GRID, 0, 0, 0], [0, IVF_GRID, 0, 0]]
    # subspace codebooks: code 0 = (grid, 0), code 1 = (0, grid)
    cbs = [
        [[IVF_GRID, 0], [0, IVF_GRID]],
        [[IVF_GRID, 0], [0, IVF_GRID]],
    ]
    out = ivfpq_topk(
        df, k=2, nprobe=2, centroid_ints=cents, codebook_ints=cbs
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]): (r["adc"], r["rank"]) for r in out}
    g = IVF_GRID
    q1 = int(0.9 * g + 0.5)  # vec1's quantized first component, 943718
    # codes: every sub-zero vector ties (cost = |c|^2 both) -> code 0;
    # vec0/vec1 -> [0, 0]; vec2 (sub0 = (0, g)) -> [1, 0].
    # ADC(q, s) = sum_j dot(q_sub_j, cb[j][code_j(s)]):
    assert got[(0, 1)][0] == g * g  # dot((g,0), cb00=(g,0))
    assert got[(1, 0)][0] == q1 * g  # dot((q1,0), (g,0)) — q side is RAW
    # vec0 coded [0,0]: dot(vec2_sub0=(0,g), (g,0)) = 0
    assert got[(2, 0)][0] == 0
    # full rank pin under (adc DESC, neighbor_id): per query, the
    # positive-adc neighbor ranks 1; q=2's all-zero scores tie and
    # break on neighbor id (0 before 1)
    assert {p: r for p, (_, r) in got.items()} == {
        (0, 1): 1, (0, 2): 2,
        (1, 0): 1, (1, 2): 2,
        (2, 0): 1, (2, 1): 2,
    }


def _twin(ids, vecs, cents, cbs, k, nprobe):
    g = IVF_GRID
    q = np.floor(vecs * g + 0.5).astype(np.int64)
    cmat = np.asarray(cents, dtype=np.int64)
    dots = q @ cmat.T
    # per-row lexicographic probe order over (-dot, cell)
    probes = []
    for i in range(len(ids)):
        cells_sorted = sorted(range(len(cents)), key=lambda c: (-dots[i, c], c))
        probes.append(cells_sorted[:nprobe])
    cell = [p[0] for p in probes]

    m = len(cbs)
    dsub = len(cbs[0][0])
    codes = np.zeros((len(ids), m), dtype=np.int64)
    for j in range(m):
        cb = np.asarray(cbs[j], dtype=np.int64)  # (ks, dsub)
        sub = q[:, j * dsub : (j + 1) * dsub]
        cost = (cb * cb).sum(axis=1)[None, :] - 2 * (sub @ cb.T)
        # argmin with ties to lower k: np.argmin takes first minimum
        codes[:, j] = cost.argmin(axis=1)

    rows = []
    inv = {}
    for i in range(len(ids)):
        inv.setdefault(cell[i], []).append(i)
    for qi in range(len(ids)):
        cand = set()
        for c in probes[qi]:
            for si in inv.get(c, []):
                if si != qi:
                    cand.add(si)
        scored = []
        for si in cand:
            adc = 0
            for j in range(m):
                cb = np.asarray(cbs[j][codes[si, j]], dtype=np.int64)
                adc += int(q[qi, j * dsub : (j + 1) * dsub] @ cb)
            scored.append((-adc, int(ids[si]), adc))
        scored.sort()
        for rank, (_, sid, adc) in enumerate(scored[:k], start=1):
            rows.append((int(ids[qi]), sid, adc, rank))
    return sorted(rows)


def test_numpy_twin_on_sf0001(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = ivf_train_rows(emb, max_train=65536)
    cents = ivf_centroid_ints(rows, 16)
    cbs = pq_codebook_ints(rows, m=8, ks=16)
    out = ivfpq_topk(
        emb, k=5, nprobe=4, centroid_ints=cents, codebook_ints=cbs
    ).collect()
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["adc"], r["rank"]) for r in out
    )

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    expect = _twin(ids, vecs, cents, cbs, k=5, nprobe=4)
    assert got == expect
    assert len(got) > 0


def test_adc_recall_floor(spark):
    """ADC over nprobe=8 cells must agree with exact cosine top-1 for a
    reasonable fraction of queries — a sanity floor, not a guarantee
    (random 64-dim embeddings are a hard case for any quantizer)."""
    from docling_translate_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = ivf_train_rows(emb, max_train=65536)
    cents = ivf_centroid_ints(rows, 16)
    cbs = pq_codebook_ints(rows, m=8, ks=16)
    approx = {
        r["query_id"]: r["neighbor_id"]
        for r in ivfpq_topk(
            emb, k=1, nprobe=8, centroid_ints=cents, codebook_ints=cbs
        ).collect()
    }
    exact_rows = brute_force_topk(emb, emb, k=5).collect()
    exact5 = {}
    for r in exact_rows:
        exact5.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(
        1 for qid, nid in approx.items() if nid in exact5.get(qid, set())
    )
    assert hits / max(len(approx), 1) >= 0.3
