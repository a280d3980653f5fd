"""Int8 quantization + exact-integer IP top-k (operators/similarity.py)."""

import math

from docling_translate_spark.operators.similarity import (
    QUANT_LEVELS,
    quantize_embeddings,
    quantized_ip_topk,
)


def _py_quant(vec):
    amax = max(abs(x) for x in vec) if vec else 0.0
    if amax == 0.0:
        return [0] * len(vec), 0.0
    return [
        math.floor(QUANT_LEVELS * x / amax + 0.5) for x in vec
    ], amax / QUANT_LEVELS


def test_quantize_values(spark):
    rows = [
        (1, [1.0, -1.0, 0.5, 0.0]),
        (2, [0.0, 0.0]),          # all-zero -> zero qvec, scale 0
        (3, None),                # NULL passes through
        (4, [2.0, -0.25]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["qvec"], r["scale"])
        for r in quantize_embeddings(df).collect()
    }
    assert got[1][0] == [127, -127, 64, 0]  # floor(63.5+0.5) = 64
    assert got[2] == ([0, 0], 0.0)
    assert got[3] == (None, None)
    q4, s4 = got[4]
    assert q4 == _py_quant([2.0, -0.25])[0]
    # dequantization error bound: half a grid step
    for x, q in zip([2.0, -0.25], q4):
        assert abs(x - q * s4) <= s4 / 2 + 1e-12


def _dvecs(n, dim=8):
    """Deterministic pseudo-vectors (no RNG: md5-free integer mix)."""
    return [
        (i, [((i * 37 + j * 11) % 19 - 9) / 3.0 for j in range(dim)])
        for i in range(n)
    ]


def _ref_topk(rows, k):
    qs = {i: _py_quant(v)[0] for i, v in rows}
    out = {}
    for qi, qv in qs.items():
        scored = sorted(
            (
                (-sum(a * b for a, b in zip(qv, nv)), ni)
                for ni, nv in qs.items()
                if ni != qi
            ),
        )[:k]
        out[qi] = [(ni, -negdot, r + 1) for r, (negdot, ni) in enumerate(scored)]
    return out


def test_topk_matches_reference_and_blocks_invariant(spark):
    rows = _dvecs(40)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = _ref_topk(rows, k=3)

    def run(nb):
        res = quantized_ip_topk(df, df, k=3, n_blocks=nb).collect()
        got = {}
        for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
            got.setdefault(r["query_id"], []).append(
                (r["neighbor_id"], r["qdot"], r["rank"])
            )
        return got

    a = run(2)
    assert a == want
    assert run(5) == a  # block count cannot change results


def test_scores_are_exact_integers(spark):
    rows = _dvecs(12)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = quantized_ip_topk(df, df, k=2, n_blocks=2)
    assert dict(res.dtypes)["qdot"] == "bigint"
    qs = {i: _py_quant(v)[0] for i, v in rows}
    for r in res.collect():
        want = sum(a * b for a, b in zip(qs[r["query_id"]], qs[r["neighbor_id"]]))
        assert r["qdot"] == want
