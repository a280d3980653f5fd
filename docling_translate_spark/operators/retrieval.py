"""BM25 full-text retrieval: score every document against a short
keyword query and return the top-k (Robertson & Zaragoza 2009; the
Lucene-default variant with the always-positive idf
``ln(1 + (N - df + 0.5)/(df + 0.5))``).

Engine addition — the text-retrieval counterpart of the ANN suite (the
reference has no search surface at all). Useful in a curation pipeline
for exemplar mining: pull the corpus documents most similar to a
hand-written probe query before seeding DSIR's target set.

Scale shape (the short-query fast path, len(terms) ≤ ~32): per-term
term frequencies are row-local array reductions over the tokenized
text — NO explode, NO per-token shuffle. Corpus statistics (N, Σdl,
per-term document frequencies) reduce to ONE row via partial
aggregation and re-attach as a broadcast nested-loop join of that
single row, so the whole scoring plan is scan → project → tiny agg
broadcast → TakeOrdered: zero wide shuffles of corpus rows. For
hundred-term queries you would flip to the explode + filter-to-terms +
groupBy((doc, term)) shape instead; at 1-32 terms the row-local battery
is strictly cheaper (the per-row work is size(filter(toks, ·)) per
term, all codegen).

Cross-engine FP stability (same discipline as ``dsir_weights``): each
per-(doc, term) partial score is quantized to integer MICRO-units
(``round(idf·tfnorm·1e6) → BIGINT``) and the per-doc total is a sum of
exact integers — order-independent, so Spark and a SQL oracle agree
whenever the quantized terms agree. All ops in the term score are
correctly-rounded IEEE (divisions, multiplies) on identical inputs
except ``ln``, whose 1-ulp libm wobble sits ~1e-8 grid units from any
x.5 boundary at the micro grid — per-term residual risk, never
observed (see the dsir_weights docstring for the full argument).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

# row-local fast path bound: beyond this the per-row battery of
# size(filter(...)) columns stops beating an explode + groupBy plan
MAX_FAST_TERMS = 32


def _tokenize(text_col: str):
    txt = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    return F.filter(F.split(txt, r"\s+"), lambda t: t != "")


def _tf_of(term: str):
    # closure factory, NOT `lambda t, trm=trm: ...` — a second (even
    # defaulted) parameter makes Spark bind the (element, index) form
    # of the higher-order lambda and the term literal becomes an index
    return lambda t: t == F.lit(term)


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under BM25, deterministic total
    order (score DESC, id ASC — ties at the cut are engine-stable
    because scores derive from exact BIGINT micro-unit sums).

    Output: ``(id, matched BIGINT, score DOUBLE)`` — ``matched`` is the
    number of distinct query terms present in the doc. Documents
    matching no term score 0.0 and rank by id; an empty corpus or an
    all-empty corpus yields all-zero scores (no division by zero).
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if len(terms) > MAX_FAST_TERMS:
        raise ValueError(
            f"row-local BM25 path caps at {MAX_FAST_TERMS} terms; "
            "use an explode+groupBy plan for long queries"
        )

    # tokens materialize in their own projection: 1 + len(terms)
    # consumers follow, and Catalyst keeps a multiply-referenced
    # non-cheap alias in its own project instead of re-inlining the
    # split per consumer (the higher-order-lambda re-eval lesson)
    tok = df.select(
        F.col(id_col).alias("_id"), _tokenize(text_col).alias("_toks")
    )
    base = tok.select(
        "_id",
        F.size("_toks").alias("_dl"),
        *[
            F.size(F.filter(F.col("_toks"), _tf_of(trm))).alias(f"_tf{i}")
            for i, trm in enumerate(terms)
        ],
    )

    # ONE stats row: N, Σdl, per-term doc frequencies — partial agg on
    # every task, a single-row exchange, then a broadcast re-attach
    stats = base.agg(
        F.count("*").alias("_N"),
        F.coalesce(F.sum("_dl"), F.lit(0)).alias("_sdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))

    n = F.col("_N").cast("double")
    # avgdl > 0 guard: an all-empty corpus keeps every tfnorm at 0
    avgdl = F.when(F.col("_sdl") > 0, F.col("_sdl").cast("double") / n)
    micro_terms = []
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (n - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        tfnorm = (tf * F.lit(k1 + 1.0)) / (
            tf
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * (F.col("_dl").cast("double") / avgdl))
        )
        micro_terms.append(
            F.when(
                (F.col(f"_tf{i}") > 0) & avgdl.isNotNull(),
                F.round(idf * tfnorm * F.lit(1e6), 0).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )

    matched = reduce(
        lambda a, c: a + c,
        [(F.col(f"_tf{i}") > 0).cast("long") for i in range(len(terms))],
    )
    score_micro = reduce(lambda a, c: a + c, micro_terms)
    out = scored.select(
        F.col("_id").alias(id_col),
        matched.alias("matched"),
        (score_micro.cast("double") / F.lit(1e6)).alias("score"),
    )
    return out.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
