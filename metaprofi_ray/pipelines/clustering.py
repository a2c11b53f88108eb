"""Iterative distributed algorithms over the embeddings table.

Mini-batch-free Lloyd's k-means as the canonical iterative pattern the
Dataset API supports naturally: per iteration, centroids are broadcast
(``ray.put``), every batch emits per-cluster partial sums/counts (the
combiner), and the tiny partial table reduces on the driver — k×blocks
rows, never the vectors themselves.  Deterministic: seeded init, fixed
iteration count, float64 accumulation.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def kmeans_centroids(
    path: str, k: int = 10, iters: int = 5, seed: int = 5
) -> tuple[np.ndarray, pd.DataFrame]:
    """Lloyd k-means over an embeddings parquet file; returns
    ``(centroids, last_partials)``.  Used both by the ``kmeans_embeddings``
    query and as the IVF coarse quantizer trainer (``ann_ivf``)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # init from the leading row group(s) only — a deterministic seeded
    # choice within a bounded prefix, never a full-table driver read
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    prefix = []
    got = 0
    for rg in range(pf.num_row_groups):
        t = pf.read_row_group(rg, columns=["embedding"])
        prefix.append(t)
        got += t.num_rows
        if got >= max(k, 256):
            break
    import pyarrow as pa

    boot = pa.concat_tables(prefix)
    rng = np.random.default_rng(seed)
    init_rows = rng.choice(
        boot.num_rows, size=min(k, boot.num_rows), replace=False
    )
    emb = np.asarray(boot["embedding"].to_pylist(), dtype=np.float64)
    centroids = emb[np.sort(init_rows)]

    # materialize once: Lloyd iterations re-scan the SAME blocks from the
    # object store instead of re-reading parquet every round (at 100 TB the
    # object store spills cold blocks to disk; the re-scan is still cheaper
    # than re-decoding parquet per iteration)
    ds = rd.read_parquet(path, columns=["embedding"]).materialize()

    for _ in range(iters):
        cref = ray.put(centroids)

        class Assign:
            def __init__(self):
                self.c = ray.get(cref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                if len(df) == 0:
                    return pd.DataFrame(
                        {"cluster": pd.Series([], dtype="int64"),
                         "n": pd.Series([], dtype="int64"),
                         "vec_sum": pd.Series([], dtype="object"),
                         "inertia": pd.Series([], dtype="float64")}
                    )
                mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
                d2 = (
                    (mat * mat).sum(1)[:, None]
                    - 2 * mat @ self.c.T
                    + (self.c * self.c).sum(1)[None, :]
                )
                lab = d2.argmin(1)
                rows = {"cluster": [], "n": [], "vec_sum": [], "inertia": []}
                for c in np.unique(lab):
                    sel = lab == c
                    rows["cluster"].append(int(c))
                    rows["n"].append(int(sel.sum()))
                    rows["vec_sum"].append(mat[sel].sum(0).tobytes())
                    rows["inertia"].append(float(d2[sel, c].sum()))
                return pd.DataFrame(rows)

        partials = ds.map_batches(
            Assign, batch_format="pandas", batch_size=2048, concurrency=(1, 8)
        ).to_pandas()  # k x blocks tiny rows
        dim = centroids.shape[1]
        new = centroids.copy()
        for c, g in partials.groupby("cluster"):
            total = g["n"].sum()
            vec = np.zeros(dim)
            for b in g["vec_sum"]:
                vec += np.frombuffer(b, dtype=np.float64)
            new[c] = vec / max(total, 1)
        centroids = new
        last = partials
    return centroids, last


def kmeans_embeddings(
    sf_dir: str, k: int = 10, iters: int = 5, seed: int = 5
) -> pd.DataFrame:
    """Returns per-cluster (cluster, size, inertia_sum) after ``iters``
    Lloyd iterations; centroids init = k seeded rows from the leading row
    group."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    _, last = kmeans_centroids(path, k=k, iters=iters, seed=seed)
    out = (
        last.groupby("cluster", as_index=False)
        .agg(size=("n", "sum"), inertia_sum=("inertia", "sum"))
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    out["inertia_sum"] = out["inertia_sum"].round(4)
    return out
