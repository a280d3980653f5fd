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


# ---------------------------------------------------------------------------
# semantic_decontaminate
# ---------------------------------------------------------------------------


def test_decontam_micro_pinned(spark):
    """Corpus +x pair vs eval containing a +x twin and an unrelated +y:
    only the +x-aligned corpus vectors are flagged, each with one hit."""
    from docling_translate_spark.operators.semdedup import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),  # +z: own cell, no eval there
        ],
        "vec_id long, embedding array<double>",
    )
    evalset = spark.createDataFrame(
        [(100, [1.0, 0.001, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [
        [IVF_GRID, 0, 0, 0],
        [0, IVF_GRID, 0, 0],
        [0, 0, IVF_GRID, 0],
    ]
    out = {
        r["vec_id"]: r.asDict()
        for r in semantic_decontaminate(
            corpus, evalset, thr_milli=950, centroid_ints=cents
        ).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0]["n_hits"] == 1 and not out[0]["kept"]
    assert out[1]["n_hits"] == 1 and not out[1]["kept"]
    assert out[2]["n_hits"] == 0 and out[2]["kept"]


def test_decontam_multiprobe_recall(spark):
    """An eval vector between two cells still catches a corpus twin in
    its SECOND-closest cell when nprobe >= 2 and misses it at nprobe=1
    — pinning that multiprobe is what buys the boundary recall."""
    from docling_translate_spark.operators.semdedup import (
        semantic_decontaminate,
    )

    # corpus vector sits squarely in cell 1 (+y); the eval vector leans
    # +x but is close enough in angle to the corpus one to clear τ=0.7
    corpus = spark.createDataFrame(
        [(0, [0.6, 0.8, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    evalset = spark.createDataFrame(
        [(100, [0.8, 0.6, 0.0, 0.0])],  # argmax cell 0, second cell 1
        "vec_id long, embedding array<double>",
    )
    cents = [[IVF_GRID, 0, 0, 0], [0, IVF_GRID, 0, 0]]
    kw = dict(thr_milli=700, centroid_ints=cents)
    hit2 = semantic_decontaminate(corpus, evalset, nprobe=2, **kw).collect()
    hit1 = semantic_decontaminate(corpus, evalset, nprobe=1, **kw).collect()
    assert hit2[0]["n_hits"] == 1 and not hit2[0]["kept"]
    assert hit1[0]["n_hits"] == 0 and hit1[0]["kept"]


def test_decontam_numpy_twin_on_sf0001(spark):
    """Exact numpy recompute of the whole pass (corpus = md5 80% split,
    eval = the other 20%, codebook trained on the full table) over the
    real sf0.001 embeddings."""
    from docling_translate_spark.functions.hashing import md5_prefix60
    from docling_translate_spark.operators.semdedup import (
        semantic_decontaminate,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = ivf_train_rows(emb, max_train=65536)
    cents = ivf_centroid_ints(rows, 16)
    split = md5_prefix60(F.col("vec_id").cast("string")) % 5
    corpus, evalset = emb.filter(split < 4), emb.filter(split >= 4)
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            corpus, evalset, thr_milli=400, nprobe=4, centroid_ints=cents
        ).collect()
    }

    def mats(df):
        pdf = df.select("vec_id", "embedding").toPandas()
        ids = pdf["vec_id"].to_numpy()
        vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        return ids, np.floor(vecs * IVF_GRID + 0.5).astype(np.int64)

    cids, cq = mats(corpus)
    eids, eq = mats(evalset)
    cmat = np.asarray(cents, dtype=np.int64)
    cdots = cq @ cmat.T
    ccell = np.argmax(cdots, axis=1)
    cnsq = (cq * cq).sum(axis=1)
    edots = eq @ cmat.T
    ensq = (eq * eq).sum(axis=1)
    # eval top-4 probe cells under (-dot, cell) lexicographic order
    eprobes = [
        [c for _, c in sorted(zip(-edots[i], range(len(cents))))[:4]]
        for i in range(len(eids))
    ]
    n_hits = {int(v): 0 for v in cids}
    for i, cid in enumerate(cids):
        for j in range(len(eids)):
            if int(ccell[i]) not in eprobes[j]:
                continue
            d = int(cq[i] @ eq[j])
            if d > 0 and 1_000_000 * d * d >= 400 * 400 * int(
                cnsq[i]
            ) * int(ensq[j]):
                n_hits[int(cid)] += 1

    assert len(out) == len(cids)
    flagged = 0
    for i, cid in enumerate(cids):
        r = out[int(cid)]
        assert r["cell"] == int(ccell[i]), cid
        assert r["n_hits"] == n_hits[int(cid)], cid
        assert r["kept"] == (n_hits[int(cid)] == 0), cid
        flagged += int(n_hits[int(cid)] > 0)
    assert flagged > 0  # τ=0.4 actually fires on this data
    assert flagged < len(cids)


def test_decontam_thr_validation(spark):
    from docling_translate_spark.operators.semdedup import (
        semantic_decontaminate,
    )

    df = _micro_df(spark)
    with pytest.raises(ValueError):
        semantic_decontaminate(df, df, thr_milli=0, centroid_ints=MICRO_CENTS)


def test_decontam_nprobe_validation(spark):
    from docling_translate_spark.operators.semdedup import (
        semantic_decontaminate,
    )

    df = _micro_df(spark)
    with pytest.raises(ValueError, match="nprobe"):
        semantic_decontaminate(
            df, df, nprobe=0, centroid_ints=MICRO_CENTS
        )
