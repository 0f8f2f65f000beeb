"""K-means over embedding columns — the second iterative operator (with
plans/graph.py): fixed-round Lloyd's algorithm, Spark-distributed.

Why this shape: model state (k x dim centroids) is tiny and belongs on the
driver; data (n x dim embeddings) is huge and never leaves the executors.
Each round is ONE distributed pass: a ``mapInPandas`` that both assigns
every batch to its nearest centroid (one BLAS matmul per Arrow batch) and
emits per-batch partial sums — (k x dim sums + counts) per batch — so the
driver reduces #batches * k tiny rows instead of n. No per-dimension
explode, no groupBy shuffle at all: the only data movement per round is
the partial-sum collect, O(batches * k * dim).

Determinism: centroids init from the k smallest ids; fixed round count (no
data-dependent early exit); nearest-centroid ties break to the lowest
centroid index (argmin does this for free).

Scale notes (100 TB): rounds scan the cached fact once each; partial sums
keep driver traffic independent of n. For huge k (10^5+, e.g. IVF
codebooks), switch the assign step to a blocked matmul and the reduce to a
``groupBy(cluster)`` tree aggregate — same API.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Run ``iters`` Lloyd rounds; return (assignments, centroids).

    assignments: (id, cluster) DataFrame from the FINAL centroids;
    centroids: (k, dim) float64 array.
    """
    init = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    centroids = np.array([r[1] for r in init], dtype=np.float64)
    data = emb.select(id_col, vec_col)
    data = data.persist()
    try:
        for _ in range(iters):
            parts = data.mapInPandas(
                _partial_stats_fn(centroids, id_col, vec_col),
                "cluster int, n long, sums array<double>",
            ).collect()
            sums = np.zeros_like(centroids)
            counts = np.zeros(len(centroids), dtype=np.int64)
            for row in parts:
                sums[row["cluster"]] += np.asarray(row["sums"])
                counts[row["cluster"]] += row["n"]
            nonempty = counts > 0
            centroids = centroids.copy()
            centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        assign = data.mapInPandas(
            _assign_fn(centroids, id_col, vec_col),
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("cluster", T.IntegerType()),
                ]
            ),
        )
        # materialize before unpersist so the last pass reads the cache
        assign = assign.localCheckpoint()
    finally:
        data.unpersist()
    return assign, centroids


def _nearest(c_mat: np.ndarray, x: np.ndarray) -> np.ndarray:
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per row ->
    # argmin over (-2 x.c + ||c||^2). np.argmin returns the FIRST minimum,
    # which is the tie-break-to-lowest-index rule.
    scores = -2.0 * (x @ c_mat.T) + (c_mat * c_mat).sum(axis=1)[None, :]
    return np.argmin(scores, axis=1)


def _partial_stats_fn(centroids: np.ndarray, id_col: str, vec_col: str):
    c_mat = centroids.copy()

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            lab = _nearest(c_mat, x)
            rows = []
            for c in np.unique(lab):
                mask = lab == c
                rows.append(
                    {
                        "cluster": int(c),
                        "n": int(mask.sum()),
                        "sums": x[mask].sum(axis=0).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return fn


def _assign_fn(centroids: np.ndarray, id_col: str, vec_col: str):
    c_mat = centroids.copy()

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "cluster": _nearest(c_mat, x).astype(np.int32),
                }
            )

    return fn


def pca_project(
    emb: DataFrame,
    n_components: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Distributed PCA: partial Gramians per Arrow batch, eig on the driver,
    projection as a second distributed pass.

    The classic two-sided split for tall-skinny matrices: executors reduce
    n×dim rows to per-batch (dim×dim Gramian, dim sum, count) partials —
    O(batches · dim²) driver traffic, independent of n — the driver forms
    the covariance, eigendecomposes (dim×dim, trivial), and broadcasts the
    top components back into a ``mapInPandas`` projection.  Eigenvector
    sign is fixed by making each component's largest-|loading| coordinate
    positive, so results are deterministic.

    Returns (projections DataFrame (id, pc0..pc{k-1}), components array).
    """
    data = emb.select(id_col, vec_col)
    parts = data.mapInPandas(
        _gramian_fn(vec_col),
        "n long, sums array<double>, gram array<double>",
    ).collect()
    dim = len(parts[0]["sums"])
    n = sum(p["n"] for p in parts)
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for p in parts:
        s += np.asarray(p["sums"])
        g += np.asarray(p["gram"]).reshape(dim, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    comps = eigvecs[:, ::-1][:, :n_components].T  # (k, dim), top-first
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    schema = T.StructType(
        [T.StructField("id", T.LongType())]
        + [T.StructField(f"pc{i}", T.DoubleType()) for i in range(n_components)]
    )
    proj = data.mapInPandas(_project_fn(mean, comps, id_col, vec_col), schema)
    return proj, comps


def _gramian_fn(vec_col: str):
    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            yield pd.DataFrame(
                [
                    {
                        "n": int(x.shape[0]),
                        "sums": x.sum(axis=0).tolist(),
                        "gram": (x.T @ x).ravel().tolist(),
                    }
                ]
            )

    return fn


def _project_fn(mean: np.ndarray, comps: np.ndarray, id_col: str, vec_col: str):
    m, c = mean.copy(), comps.copy()

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            y = (x - m[None, :]) @ c.T
            out = {"id": pdf[id_col].to_numpy(dtype=np.int64)}
            for i in range(c.shape[0]):
                out[f"pc{i}"] = y[:, i]
            yield pd.DataFrame(out)

    return fn


def pca_summary(emb: DataFrame, n_components: int = 2) -> DataFrame:
    """Query surface: top-2 PCA coordinates for vec_id < 20, rounded.

    Rounded to 4 decimals — the Gramian partial-sum order jitters at
    ~1e-12 relative; the numpy-pinned test checks exact agreement against
    a single-node reference at the same rounding.
    """
    proj, _ = pca_project(emb, n_components=n_components)
    return (
        proj.where(F.col("id") < 20)
        .select(
            F.col("id").alias("vec_id"),
            *[
                F.round(f"pc{i}", 4).alias(f"pc{i}")
                for i in range(n_components)
            ],
        )
        .orderBy("vec_id")
    )


def kmeans_summary(emb: DataFrame, k: int = 8, iters: int = 5) -> DataFrame:
    """Per-cluster summary for the query surface: size + centroid norm.

    Norm rounded to 2 decimals: partial-sum order across batches jitters
    the mean at ~1e-12 relative, far below the rounding grain.
    """
    assign, centroids = kmeans_assign(emb, k=k, iters=iters)
    norms = np.round(np.linalg.norm(centroids, axis=1), 2)
    spark = emb.sparkSession
    norm_df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(norms)],
        "cluster int, centroid_norm double",
    )
    return (
        assign.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .join(F.broadcast(norm_df), "cluster")
        .select(
            F.col("cluster").alias("cluster_id"),
            "n_members",
            "centroid_norm",
        )
        .orderBy("cluster_id")
    )
