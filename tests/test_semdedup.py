"""SemDeDup (operators/semdedup.py) — pinned micro-fixtures with a
hand-checkable codebook, a numpy exact-twin over the real sf0.001
embeddings, and the clique-keeps-one invariant."""

import numpy as np
import pytest

from docling_translate_spark.operators.semdedup import semdedup_exact
from docling_translate_spark.operators.similarity import (
    IVF_GRID,
    ivf_centroid_ints,
    ivf_train_rows,
)

SF_DIR = "/root/testdata/sf0.001"


def _micro_df(spark):
    # two obvious directions (axis-ish cells). vec_id 0/1/2 point +x
    # with slight jitter (cosines ≈ 1 ≥ τ), 10 points +y alone, 11
    # points −x (negative dot with everyone in cell x — never a dup).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [0.998, -0.02, 0.0, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# codebook pinned by hand: cell 0 = +x, cell 1 = +y
MICRO_CENTS = [
    [IVF_GRID, 0, 0, 0],
    [0, IVF_GRID, 0, 0],
]


def test_micro_drops_exact(spark):
    out = {
        r["vec_id"]: r.asDict()
        for r in semdedup_exact(
            _micro_df(spark), thr_milli=950, centroid_ints=MICRO_CENTS
        ).collect()
    }
    assert set(out) == {0, 1, 2, 10, 11}
    # cells: +x vectors and −x (argmax over {+x,+y} dots: −x has dot
    # −grid² vs 0 → cell 1 wins for −x!) — check: −x dot c0 = −grid²,
    # dot c1 = 0 ⇒ assigned cell 1 (the +y cell).
    assert out[0]["cell"] == 0 and out[1]["cell"] == 0 and out[2]["cell"] == 0
    assert out[10]["cell"] == 1 and out[11]["cell"] == 1
    # prune order in cell 0 by (cdot ASC, id): id 2 (0.998·grid²-ish
    # minus jitter) ranks before 1 and 0 by raw dot; all three are
    # mutually ≥0.95-similar, so exactly the rank-first survives.
    cell0 = {i: out[i] for i in (0, 1, 2)}
    first = min(cell0.values(), key=lambda r: (r["cdot"], r["vec_id"]))
    for r in cell0.values():
        assert r["kept"] == (r["vec_id"] == first["vec_id"])
    # cell 1: +y vs −x cosine is 0 < τ ⇒ both kept
    assert out[10]["kept"] and out[11]["kept"]


def test_zero_vector_never_dups(spark):
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup_exact(
        df, thr_milli=100, centroid_ints=[[IVF_GRID, 0]]
    ).collect()
    assert all(r["kept"] for r in out)


def test_thr_validation(spark):
    with pytest.raises(ValueError):
        semdedup_exact(_micro_df(spark), thr_milli=0, centroid_ints=MICRO_CENTS)
    with pytest.raises(ValueError):
        semdedup_exact(
            _micro_df(spark), thr_milli=1001, centroid_ints=MICRO_CENTS
        )


def _numpy_twin(ids, vecs, cents, thr_milli):
    """Independent exact recompute of assignment + prune in numpy
    object-int arithmetic (no 64-bit overflow risk on the products)."""
    q = np.floor(vecs * IVF_GRID + 0.5).astype(np.int64)
    c = np.asarray(cents, dtype=np.int64)
    dots = q @ c.T  # (n, cells) — fits int64
    cell = np.argmax(dots, axis=1)  # ties → lower index, same as engine
    cdot = dots[np.arange(len(ids)), cell]
    nsq = (q * q).sum(axis=1)
    kept = np.ones(len(ids), dtype=bool)
    t2 = thr_milli * thr_milli
    for ci in np.unique(cell):
        idx = np.where(cell == ci)[0]
        order = idx[np.lexsort((ids[idx], cdot[idx]))]
        for bi_pos, bi in enumerate(order):
            for ai in order[:bi_pos]:
                d = int(q[ai] @ q[bi])
                if d > 0 and 1_000_000 * d * d >= t2 * int(nsq[ai]) * int(
                    nsq[bi]
                ):
                    kept[bi] = False
                    break
    return cell, cdot, nsq, kept


def test_numpy_twin_on_sf0001(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = ivf_train_rows(emb, max_train=65536)
    cents = ivf_centroid_ints(rows, 16)
    out = semdedup_exact(emb, thr_milli=400, centroid_ints=cents).collect()
    got = {r["vec_id"]: r for r in out}

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    cell, cdot, nsq, kept = _numpy_twin(ids, vecs, cents, 400)

    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        r = got[int(vid)]
        assert r["cell"] == int(cell[i]), vid
        assert r["cdot"] == int(cdot[i]), vid
        assert r["nsq"] == int(nsq[i]), vid
        assert r["kept"] == bool(kept[i]), vid
    # the data actually exercises the drop path at τ=0.4
    assert (~kept).sum() > 0
    # clique-keeps-one invariant: each cell's rank-first member is kept
    for ci in np.unique(cell):
        idx = np.where(cell == ci)[0]
        first = idx[np.lexsort((ids[idx], cdot[idx]))][0]
        assert kept[first]
