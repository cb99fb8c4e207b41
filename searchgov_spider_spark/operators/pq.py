"""Product quantization (PQ) for embedding compression + ANN — Jégou et al.
2011, "Product Quantization for Nearest Neighbor Search".

The memory-scale path for a 100-TB embedding column: a d-dim float vector
(d*4 bytes) compresses to ``m`` one-byte codes (32x smaller at d=64, m=8
codes per subspace), and query-time distances are table lookups (ADC —
asymmetric distance computation) instead of d-dim float math.  This module
complements the pruning-based ANN paths (similarity.ann_topk_lsh /
ann_topk_ivf) with the compression-based one.

Repo-wide determinism contract (same trick as operators/training):

- **Codebook training is EXACT fixed-point distributed Lloyd.**  Centroid
  updates sum per-coordinate contributions as ``cast(x * 2^24 as bigint)``
  — integer sums are associative, so the codebooks are bit-identical at
  local[2], local[32], or 1000 executors, and the pure-Python oracle
  re-derives every centroid bit-for-bit.  (2^24 keeps 10^10-row
  per-coordinate sums below 2^63 for |x| <= 100.)
- **Assignment / encode / ADC use only +, -, *, and comparisons** in a
  fixed left-associated order — each is correctly rounded IEEE arithmetic,
  identical in any engine; ties break on the lower centroid id.
- Initial centroids are the subspace slices of the ``k`` lowest-id
  vectors (a bounded TakeOrdered collect).

Scale shape:

- training: per iteration ONE map (assign all m subspaces against literal
  centroids, zero joins) + ONE groupBy((subspace, code, pos)) with at most
  m*k*dsub keys (m=4, k=8, dsub=16 -> 512), so map-side partial agg
  collapses the shuffle to <= 512 rows per partition at ANY corpus size;
- encode: a pure map with the codebooks folded into the plan as literals —
  zero shuffles, whole-stage codegen;
- ADC query: the m*k lookup table is computed driver-side (O(m*k*dsub))
  and folded in as literal arrays; scoring is element_at sums + one
  TakeOrderedAndProject — the corpus never shuffles.

Reference parity note: the reference (GSA-TTS/searchgov-spider) has no
embedding pipeline; this is a §"beyond the reference" similarity-search
operator (brief: ANN over an embedding column — IVF or LSH as the scale
path; PQ is the compression companion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PQ_SCALE = 1 << 24  # fixed-point scale for exact centroid sums


def _slice_expr(vec_col: str, j: int, dsub: int) -> str:
    return f"slice({vec_col}, {j * dsub + 1}, {dsub})"


def _sqdist_expr(vec_expr: str, centroid: list[float]) -> str:
    """Left-associated sum of squared differences — both engines evaluate
    the identical sequence of correctly-rounded IEEE ops."""
    terms = [
        f"({vec_expr}[{i}] - cast({c!r} as double)) * ({vec_expr}[{i}] - cast({c!r} as double))"
        for i, c in enumerate(centroid)
    ]
    return "(" + " + ".join(terms) + ")"


def _argmin_expr(vec_expr: str, centroids: list[list[float]]) -> str:
    """array_min over literal (dist, id) structs: struct ordering compares
    dist first, then id — the tie-breaks-low rule for free."""
    structs = ", ".join(
        f"struct({_sqdist_expr(vec_expr, c)} as d, {i} as c)"
        for i, c in enumerate(centroids)
    )
    return f"array_min(array({structs})).c"


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    m: int = 4,
    k: int = 8,
    n_iters: int = 3,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks with exact fixed-point Lloyd; returns
    ``codebooks[j][c]`` = centroid ``c`` of subspace ``j`` (driver state:
    m*k*dsub floats, O(1) in corpus size)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    seed_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seed_rows)}")
    books: list[list[list[float]]] = [
        [[float(x) for x in r[vec_col][j * dsub : (j + 1) * dsub]] for r in seed_rows]
        for j in range(m)
    ]
    cached = df.select(id_col, vec_col).persist()
    try:
        cached.count()
        for _ in range(n_iters):
            # one pass: (subspace, code, slice) per row per subspace,
            # exploded to (subspace, code, pos, fixed-point coord)
            sub_structs = ", ".join(
                f"struct({j} as j, {_argmin_expr(_slice_expr(vec_col, j, dsub), books[j])} as c, "
                f"{_slice_expr(vec_col, j, dsub)} as s)"
                for j in range(m)
            )
            sums = (
                cached.select(F.expr(f"explode(array({sub_structs}))").alias("a"))
                .select(
                    F.col("a.j").alias("j"),
                    F.col("a.c").alias("c"),
                    F.expr("posexplode(a.s)").alias("pos", "x"),
                )
                .groupBy("j", "c", "pos")
                .agg(
                    F.sum(
                        F.expr(f"cast(x * cast({PQ_SCALE} as double) as bigint)")
                    ).alias("s"),
                    F.count("*").alias("n"),
                )
                .collect()
            )
            acc: dict[tuple[int, int], tuple[list[int], int]] = {}
            for r in sums:
                key = (r["j"], r["c"])
                if key not in acc:
                    acc[key] = ([0] * dsub, int(r["n"]))
                acc[key][0][r["pos"]] = int(r["s"])
            for (j, c), (svec, n) in acc.items():
                books[j][c] = [(s / float(PQ_SCALE)) / n for s in svec]
            # clusters with no members keep their previous centroid
        return books
    finally:
        cached.unpersist()


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector to its m nearest-centroid codes — codebooks fold
    into the plan as literals; a zero-shuffle whole-stage-codegen map."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    return df.select(
        F.col(id_col),
        *[
            F.expr(_argmin_expr(_slice_expr(vec_col, j, dsub), codebooks[j]))
            .cast("int")
            .alias(f"code{j}")
            for j in range(m)
        ],
    )


def adc_lut(
    codebooks: list[list[list[float]]], query: list[float]
) -> list[list[float]]:
    """Driver-side ADC lookup table: lut[j][c] = squared distance from the
    query's subspace-j slice to centroid c, computed with the SAME
    left-associated fold as _sqdist_expr."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut: list[list[float]] = []
    for j in range(m):
        q = query[j * dsub : (j + 1) * dsub]
        row = []
        for c in codebooks[j]:
            s = 0.0
            for i in range(dsub):
                s = s + (q[i] - c[i]) * (q[i] - c[i])
            row.append(s)
        lut.append(row)
    return lut


def ann_topk_pq(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: encode + lookup-table scoring as one pure map (no joins,
    no shuffles before the final TakeOrderedAndProject); ties break on the
    lower vector id.  Returns (id, adc_dist)."""
    lut = adc_lut(codebooks, query)
    codes = pq_encode(df, codebooks, vec_col=vec_col, id_col=id_col)
    lut_arrays = [
        "array(" + ",".join(f"cast({x!r} as double)" for x in row) + ")"
        for row in lut
    ]
    score = " + ".join(
        f"element_at({arr}, code{j} + 1)" for j, arr in enumerate(lut_arrays)
    )
    return (
        codes.select(F.col(id_col), F.expr(score).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def rerank_topk_pq(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    r: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ + exact re-rank — the production two-stage shape (Jégou §V):
    ADC over the compressed codes selects ``r`` candidates (cheap: the
    corpus-side work is table lookups), then ONLY those ``r`` rows pay the
    exact d-dim distance.  The candidate set broadcasts back onto the
    corpus (an ``r``-row build side — the 100-TB side never shuffles), so
    the whole query is two maps + two TakeOrderedAndProject.  Within-cell
    ADC ties (unrecoverable by codes alone) are resolved exactly here.
    Returns (id, sq_dist) — exact squared L2, ties on the lower id."""
    cands = ann_topk_pq(
        df, codebooks, query, k=r, vec_col=vec_col, id_col=id_col
    ).select(id_col)
    exact = " + ".join(
        f"({vec_col}[{i}] - cast({q!r} as double)) * ({vec_col}[{i}] - cast({q!r} as double))"
        for i, q in enumerate(query)
    )
    return (
        df.join(F.broadcast(cands), id_col)
        .select(F.col(id_col), F.expr(exact).alias("sq_dist"))
        .orderBy(F.asc("sq_dist"), F.asc(id_col))
        .limit(k)
    )
