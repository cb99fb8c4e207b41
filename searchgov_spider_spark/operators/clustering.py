"""Distributed embedding clustering + second-moment statistics.

Full-corpus Lloyd k-means and the covariance/whitening moments a training-
data pipeline computes over its embedding column before cluster-based
selection (SemDeDup-style pruning wants cluster structure; whitening wants
the d x d covariance).  Unlike similarity.kmeans_centroids (a driver-side
numpy Lloyd over a bounded ~4096-row SAMPLE that seeds the IVF index), the
operators here train on the FULL corpus distributed:

- every assignment pass is a pure map against LITERAL centroids (no join,
  no shuffle, whole-stage codegen);
- every centroid update is one posexplode + groupBy(cluster, pos) with at
  most k*d distinct keys, so map-side partial aggregation collapses the
  shuffle to <= k*d rows per partition at ANY corpus size;
- the only driver materialization is the k*d centroid table per iteration
  (k=8, d=64 -> 512 rows), O(1) in corpus size.

Determinism contract (the repo-wide cross-engine rule): centroids are
rounded to 6 dp after every update, squared distances are rounded to 6 dp
before the argmin, and ties break on the lower cluster id — so the DuckDB
oracle's unrolled-CTE re-derivation (queries._q96_oracle_sql) lands on the
identical assignment bit-for-bit.

Reference parity note: the reference (GSA-TTS/searchgov-spider) has no
embedding pipeline; these are the §"beyond the reference" training-data
operators the build brief requires (SemDeDup / cluster-balanced selection
prerequisites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _centroid_array_sql(vec: list[float]) -> str:
    return "array(" + ",".join(f"cast({x!r} as double)" for x in vec) + ")"


def _assign_expr(centroids: dict[int, list[float]], vec_col: str) -> F.Column:
    """array_min over literal (dist, cluster) structs: struct ordering
    compares dist first, then cluster id — exactly the (round(dist,6), cid)
    tie-break the oracle states.  Pure map, codegen, zero shuffle."""
    terms = []
    for cid in sorted(centroids):
        arr = _centroid_array_sql(centroids[cid])
        dist = (
            f"round(aggregate(zip_with({vec_col}, {arr}, (x, y) -> (x - y) * (x - y)),"
            f" cast(0.0 as double), (acc, d) -> acc + d), 6)"
        )
        terms.append(f"struct({dist} as dist, {cid} as cluster)")
    return F.expr(f"array_min(array({','.join(terms)}))")


def kmeans_assign(
    df: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> DataFrame:
    """One assignment pass: (id_col, cluster, dist) for the nearest centroid
    under the rounded-distance / lowest-cid-tie contract."""
    a = df.select(id_col, vec_col, _assign_expr(centroids, vec_col).alias("a"))
    return a.select(id_col, vec_col, F.col("a.cluster").alias("cluster"), F.col("a.dist").alias("dist"))


def kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    n_updates: int = 2,
) -> DataFrame:
    """Full-corpus Lloyd k-means, deterministic end to end.

    Init: the k rows with the smallest ``id_col`` (cluster id = rank of the
    seed id), components rounded to 6 dp.  Then ``n_updates`` rounds of
    [assign -> per-(cluster, pos) mean rounded to 6 dp], and a FINAL
    assignment against the last centroids.  Empty clusters drop out of the
    centroid table (their id is never reassigned), mirroring the SQL
    re-derivation.

    Returns (id_col, cluster, dist) — dist is the 6-dp-rounded squared
    euclidean distance to the winning centroid.

    Scale: assignment is a literal-centroid map (no shuffle); each update
    shuffles <= k*d rows per partition (partial agg over k*d keys); the
    driver holds k*d rows per iteration.  Lineage never grows: each pass
    re-derives from the base scan with fresh literal centroids.
    """
    base = df.select(
        F.col(id_col).alias(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    seeds = base.orderBy(id_col).limit(k).collect()  # bounded: k rows
    centroids = {
        cid: [round(float(x), 6) for x in row["v"]]
        for cid, row in enumerate(sorted(seeds, key=lambda r: r[id_col]))
    }
    for _ in range(n_updates):
        assigned = kmeans_assign(base, centroids, "v", id_col)
        upd = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("cval"))
            .collect()  # bounded: <= k*d rows at any corpus size
        )
        centroids = {}
        for r in upd:
            centroids.setdefault(r["cluster"], {})[r["pos"]] = r["cval"]
        centroids = {
            cid: [pv[p] for p in sorted(pv)] for cid, pv in centroids.items()
        }
    return kmeans_assign(base, centroids, "v", id_col).select(id_col, "cluster", "dist")


def kmeans_summary(assignments: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-cluster rollup of a kmeans() result: size + inertia (sum of the
    already-6dp-rounded distances, re-rounded to 4 dp for a stable hash)."""
    return assignments.groupBy("cluster").agg(
        F.count("*").alias("n_points"),
        F.round(F.sum("dist"), 4).alias("inertia"),
    )


def embedding_covariance(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Population mean + covariance of an embedding column, JVM-side.

    Output: one row per (i, j) with 1 <= i <= j <= dim — columns
    (i, j, mean_i, mean_j, cov) with cov = E[x_i x_j] - E[x_i] E[x_j]
    rounded to 6 dp (means to 6 dp as well).  The full upper triangle
    including the variance diagonal: exactly the statistics whitening /
    PCA preprocessing consumes.

    Cross-engine determinism: the raw moments are rounded to 8 dp FIRST, so
    the subtraction runs on bit-identical doubles in Spark and the SQL
    oracle — the last-ulp difference between the engines' unordered avg()
    sums can otherwise flip a 6-dp rounding that sits on a boundary (one of
    2,080 entries did at sf0.01).  8-dp pre-rounding moves the divergence
    window from ~1e-14/5e-7 to ~1e-18/5e-9 per entry.

    Scale: the cross-moment explode emits d*(d+1)/2 structs per row
    MAP-SIDE, and the groupBy has d*(d+1)/2 distinct keys, so partial
    aggregation bounds the shuffle at ~d^2/2 rows per partition regardless
    of corpus size (d=64 -> 2,080).  For d in the thousands, switch to a
    mapInPandas outer-product accumulator; for the <=128-dim regime this
    stays whole-stage-codegen with zero Python.
    """
    base = df.select(F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"))
    pairs = base.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, {dim}), i -> "
                f"transform(sequence(i, {dim}), j -> "
                "struct(i as i, j as j, element_at(v, i) * element_at(v, j) as xy))))"
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.xy")
    exy = pairs.groupBy("i", "j").agg(F.round(F.avg("xy"), 8).alias("exy"))
    means = (
        base.select(F.posexplode("v").alias("pos0", "val"))
        .select((F.col("pos0") + 1).alias("pos"), "val")
        .groupBy("pos")
        .agg(F.round(F.avg("val"), 8).alias("mu"))
    )
    mi = means.select(F.col("pos").alias("i"), F.col("mu").alias("mu_i"))
    mj = means.select(F.col("pos").alias("j"), F.col("mu").alias("mu_j"))
    # means is a <= dim-row table: broadcast both sides of the enrichment
    return (
        exy.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            # "+ 0.0" folds IEEE -0.0 to +0.0 so value hashes that
            # stringify floats agree across engines
            (F.round("mu_i", 6) + F.lit(0.0)).alias("mean_i"),
            (F.round("mu_j", 6) + F.lit(0.0)).alias("mean_j"),
            (F.round(F.col("exy") - F.col("mu_i") * F.col("mu_j"), 6) + F.lit(0.0)).alias("cov"),
        )
    )
