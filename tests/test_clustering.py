"""operators/clustering: full-corpus Lloyd k-means + embedding covariance.

Parity oracle here is an independent pure-Python/numpy Lloyd with the same
determinism contract (6-dp centroids/distances, lowest-cid tie-break); the
DuckDB unrolled-CTE oracle is exercised by test_entry_oracle (q96/q97).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators import clustering


def _toy(spark, n=60, d=8, seed=7, parts=1):
    rng = np.random.RandomState(seed)
    vecs = rng.uniform(-1, 1, size=(n, d)).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return (df.repartition(parts) if parts > 1 else df), vecs


def _py_lloyd(vecs, k, n_updates):
    """Independent single-node Lloyd under the identical rounding contract."""
    cents = {c: [round(float(x), 6) for x in vecs[c]] for c in range(k)}

    def assign(cs):
        out = {}
        for i, v in enumerate(vecs):
            best = None
            for cid in sorted(cs):
                dist = round(sum((float(a) - b) ** 2 for a, b in zip(v, cs[cid])), 6)
                if best is None or (dist, cid) < best:
                    best = (dist, cid)
            out[i] = (best[1], best[0])
        return out

    for _ in range(n_updates):
        a = assign(cents)
        sums, counts = {}, {}
        for i, (cid, _) in a.items():
            counts[cid] = counts.get(cid, 0) + 1
            acc = sums.setdefault(cid, [0.0] * len(vecs[i]))
            for p, x in enumerate(vecs[i]):
                acc[p] += float(x)
        cents = {
            cid: [round(s / counts[cid], 6) for s in sums[cid]] for cid in sums
        }
    return assign(cents)


def test_kmeans_matches_pure_python_lloyd(spark):
    df, vecs = _toy(spark)
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in clustering.kmeans(df, "embedding", "vec_id", k=4, n_updates=2).collect()
    }
    exp = _py_lloyd(vecs, k=4, n_updates=2)
    assert got == {i: (c, pytest.approx(d, abs=1e-9)) for i, (c, d) in exp.items()}


def test_kmeans_partition_invariant(spark):
    df1, _ = _toy(spark, parts=1)
    df7, _ = _toy(spark, parts=7)
    a = sorted(map(tuple, clustering.kmeans(df1, "embedding", "vec_id", k=4, n_updates=2).collect()))
    b = sorted(map(tuple, clustering.kmeans(df7, "embedding", "vec_id", k=4, n_updates=2).collect()))
    assert a == b


def test_kmeans_updates_reduce_inertia(spark):
    df, _ = _toy(spark, n=120)

    def inertia(n_updates):
        s = clustering.kmeans_summary(
            clustering.kmeans(df, "embedding", "vec_id", k=4, n_updates=n_updates)
        )
        return sum(r["inertia"] for r in s.collect())

    i0, i2 = inertia(0), inertia(2)
    assert i2 <= i0  # Lloyd never increases the objective


def test_kmeans_handles_empty_cluster(spark):
    # two far-apart groups, k=3 seeded from the first three rows (all in
    # group A) -> after one update at least one centroid keeps points; a
    # cluster that loses every point must drop out, not crash or emit NULLs
    rows = [(i, [0.0 + i * 1e-4, 0.0]) for i in range(3)] + [
        (i, [100.0, 100.0 + (i - 3) * 1e-4]) for i in range(3, 20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = clustering.kmeans(df, "embedding", "vec_id", k=3, n_updates=2).collect()
    assert len(out) == 20
    assert all(r["cluster"] is not None and r["dist"] is not None for r in out)


def test_assignment_plan_is_shuffle_free(spark):
    """The final assignment pass must be a pure map: literal centroids, no
    Exchange anywhere in the plan (the 100-TB contract)."""
    df, _ = _toy(spark)
    cents = {0: [0.0] * 8, 1: [0.5] * 8}
    base = df.select("vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    plan = clustering.kmeans_assign(base, cents, "v", "vec_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_covariance_plan_partial_aggregates_and_broadcasts(spark):
    df, _ = _toy(spark, parts=4)
    cov = clustering.embedding_covariance(df, "embedding", dim=8)
    plan = cov._jdf.queryExecution().executedPlan().toString()
    # map-side combine before the (i, j) shuffle + broadcast mean joins
    assert "partial_avg" in plan or "partial" in plan.lower()
    assert "BroadcastHashJoin" in plan


def test_covariance_matches_numpy(spark):
    df, vecs = _toy(spark, n=80, d=6)
    got = {(r["i"], r["j"]): r["cov"] for r in clustering.embedding_covariance(df, "embedding", dim=6).collect()}
    v = vecs.astype(np.float64)
    mu = np.round(v.mean(axis=0), 8)
    for i in range(6):
        for j in range(i, 6):
            exy = round(float((v[:, i] * v[:, j]).mean()), 8)
            exp = round(exy - float(mu[i]) * float(mu[j]), 6) + 0.0
            assert got[(i + 1, j + 1)] == pytest.approx(exp, abs=2e-6)
    assert len(got) == 6 * 7 // 2
