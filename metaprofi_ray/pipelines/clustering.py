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


# Lloyd/k-means|| rounds re-scan the corpus; materializing once lets each
# round re-read object-store blocks instead of re-decoding parquet.  That
# pins the corpus in the store for the run, so it is gated on an explicit
# byte budget (VERDICT r2 #6): above the budget the Dataset stays lazy and
# every round re-reads parquet — slower per round, bounded memory.
MATERIALIZE_BUDGET_BYTES = 8 << 30


def _scan(path: str, columns: list[str], budget_bytes: int | None) -> rd.Dataset:
    ds = rd.read_parquet(path, columns=columns)
    if budget_bytes is None or os.path.getsize(path) <= budget_bytes:
        return ds.materialize()
    return ds


def _row_uniform(vec_ids: np.ndarray, rnd: int, seed: int) -> np.ndarray:
    """Deterministic per-(vec_id, round) uniform in [0, 1) — independent of
    partitioning/parallelism (splitmix64-style mix, no stateful RNG)."""
    x = vec_ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    salt = ((rnd + 1) * 0xBF58476D1CE4E5B9 + seed * 0x94D049BB133111EB) % (
        1 << 64
    )
    x += np.uint64(salt)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x.astype(np.float64) / float(2**64)


def kmeans_parallel_init(
    path: str, k: int, rounds: int = 4, seed: int = 5,
    materialize_budget_bytes: int | None = MATERIALIZE_BUDGET_BYTES,
) -> np.ndarray:
    """Distributed k-means|| initialization (Bahmani et al., VLDB 2012):
    per round, one pass computes the cost φ = Σ min-d² and one pass samples
    each point with probability min(1, 2k·d²/φ) — candidates accumulate
    (≈ 2k per round), then a weighted k-means++ on the (small) candidate
    set on the driver picks the final k seeds.  Sampling uses a
    deterministic per-(vec_id, round) hash, so the result is identical
    under any partitioning.  Replaces prefix-row init when the leading
    row group would bias the seeds (TODO §5)."""
    import pyarrow.parquet as pq

    first = pq.ParquetFile(path).read_row_group(0, columns=["embedding"])
    centers = np.asarray(first["embedding"].to_pylist(), dtype=np.float64)[:1]
    ds = _scan(path, ["vec_id", "embedding"], materialize_budget_bytes)
    ell = 2 * k

    def min_d2(mat: np.ndarray, C: np.ndarray) -> np.ndarray:
        d2 = (
            (mat * mat).sum(1)[:, None]
            - 2 * mat @ C.T
            + (C * C).sum(1)[None, :]
        )
        return np.maximum(d2.min(axis=1), 0.0)

    for rnd in range(rounds):
        cref = ray.put(centers)

        def cost_pass(df: pd.DataFrame) -> pd.DataFrame:
            C = ray.get(cref)
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            return pd.DataFrame({"phi": [float(min_d2(mat, C).sum())]})

        phi = float(
            ds.map_batches(cost_pass, batch_format="pandas")
            .to_pandas()["phi"]
            .sum()
        )
        if phi <= 0:
            break

        def sample_pass(df: pd.DataFrame) -> pd.DataFrame:
            C = ray.get(cref)
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            p = np.minimum(1.0, ell * min_d2(mat, C) / phi)
            u = _row_uniform(
                df["vec_id"].to_numpy().astype(np.int64), rnd, seed
            )
            sel = u < p
            return pd.DataFrame(
                {
                    "vec_id": df["vec_id"].to_numpy().astype(np.int64)[sel],
                    "embedding": [v.tolist() for v in mat[sel]],
                }
            )

        new = ds.map_batches(sample_pass, batch_format="pandas").to_pandas()
        if len(new):
            # Ray's streaming executor does NOT preserve block order by
            # default, so the collected candidate order varies run-to-run;
            # the weighted k-means++ below is order-sensitive (argmin index
            # ties, rng.choice positions) — sort by vec_id to restore
            # determinism (regression: test_kmeans_parallel_init flaked)
            new = new.sort_values("vec_id")
            centers = np.vstack(
                [centers, np.asarray(new["embedding"].tolist(), dtype=np.float64)]
            )

    # weight candidates by the points they capture (one assignment pass)
    cref = ray.put(centers)

    def count_pass(df: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(cref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        d2 = (
            (mat * mat).sum(1)[:, None] - 2 * mat @ C.T + (C * C).sum(1)[None, :]
        )
        lab = d2.argmin(1)
        cnt = np.bincount(lab, minlength=len(C))
        return pd.DataFrame({"cand": np.arange(len(C)), "n": cnt})

    w = (
        ds.map_batches(count_pass, batch_format="pandas")
        .to_pandas()
        .groupby("cand")["n"]
        .sum()
        .reindex(range(len(centers)), fill_value=0)
        .to_numpy()
        .astype(np.float64)
    )
    # weighted k-means++ over the small candidate set (driver-side; the
    # candidate set is O(rounds * 2k))
    rng = np.random.default_rng(seed)
    chosen = [int(np.argmax(w))]
    while len(chosen) < min(k, len(centers)):
        C = centers[chosen]
        d2 = min_d2(centers, C) * w
        tot = d2.sum()
        if tot <= 0:
            remaining = [i for i in range(len(centers)) if i not in chosen]
            chosen.append(remaining[0])
            continue
        chosen.append(int(rng.choice(len(centers), p=d2 / tot)))
    return centers[chosen]


def kmeans_centroids(
    path: str, k: int = 10, iters: int = 5, seed: int = 5,
    init: str = "prefix",
    materialize_budget_bytes: int | None = MATERIALIZE_BUDGET_BYTES,
    history: list | None = None,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Lloyd k-means over an embeddings parquet file; returns
    ``(centroids, last_partials)``.  Used both by the ``kmeans_embeddings``
    query and as the IVF coarse quantizer trainer (``ann_ivf``).

    ``init="prefix"`` (default) seeds from the leading row group —
    deterministic and cheap, biased toward the first files;
    ``init="kmeans||"`` runs the distributed k-means|| over-sampling pass
    (unbiased at any scale, a few extra corpus scans)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if init == "kmeans||":
        centroids = kmeans_parallel_init(
            path, k, seed=seed,
            materialize_budget_bytes=materialize_budget_bytes,
        )
        ds = _scan(path, ["embedding"], materialize_budget_bytes)
        return _lloyd(ds, centroids, iters, history=history)
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

    ds = _scan(path, ["embedding"], materialize_budget_bytes)
    return _lloyd(ds, centroids, iters, history=history)


def _lloyd(
    ds: rd.Dataset, centroids: np.ndarray, iters: int,
    history: list | None = None,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Distributed Lloyd iterations: per round, broadcast centroids, every
    batch emits per-cluster partial sums/counts (the combiner), the tiny
    partial table reduces on the driver.  ``history``, if given, collects
    the total inertia of each iteration (Lloyd guarantees it never
    increases — the convergence invariant ``kmeans_check`` asserts)."""
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
        if history is not None:
            history.append(float(partials["inertia"].sum()))
    return centroids, last


def kmeans_check(
    sf_dir: str, k: int = 10, iters: int = 5, seed: int = 5
) -> pd.DataFrame:
    """Bound-check face of ``kmeans_embeddings``: one row the DuckDB oracle
    reproduces — ``n_points`` (every vector assigned exactly once ⇒ equals
    the corpus row count, SQL's COUNT(*)), ``k_ok`` (≤ k non-empty
    clusters) and ``inertia_nonincreasing`` (Lloyd's convergence
    invariant over the iteration history), both pinned TRUE."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    hist: list[float] = []
    _, last = kmeans_centroids(path, k=k, iters=iters, seed=seed, history=hist)
    sizes = last.groupby("cluster")["n"].sum()
    noninc = all(
        hist[i + 1] <= hist[i] * (1 + 1e-9) + 1e-6
        for i in range(len(hist) - 1)
    )
    return pd.DataFrame(
        {
            "n_points": pd.array([int(sizes.sum())], dtype="int64"),
            "k_ok": [bool(0 < len(sizes) <= k)],
            "inertia_nonincreasing": [bool(noninc)],
        }
    )


def kmeans_cluster_sizes(
    sf_dir: str, k: int = 10, iters: int = 5, seed: int = 5
) -> pd.DataFrame:
    """Oracle-checkable face of ``kmeans_embeddings`` (VERDICT r3 #8): one
    row per cluster slot 0..k-1 with the invariants SQL can pin — the
    cluster-size total equals the corpus row count (every vector assigned
    exactly once per Lloyd pass) and every per-slot size is in
    ``[0, n_points]``.  The raw per-cluster sizes/inertia stay the library
    face (``kmeans_embeddings``, pytest-covered) since k-means content is
    not SQL-expressible."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    _, last = kmeans_centroids(path, k=k, iters=iters, seed=seed)
    sizes = (
        last.groupby("cluster")["n"].sum()
        .reindex(range(k), fill_value=0)
        .astype(int)
    )
    # independent row count (parquet metadata): SQL's COUNT(*) — the sum of
    # Lloyd assignment counts must equal it exactly (one cluster per vector)
    n_points = int(pq.ParquetFile(path).metadata.num_rows)
    return pd.DataFrame(
        {
            "cluster_id": pd.array(range(k), dtype="int64"),
            "size_ok": [bool(0 <= s <= n_points) for s in sizes],
            "sizes_sum_ok": [bool(int(sizes.sum()) == n_points)] * k,
            "n_points": pd.array([n_points] * k, dtype="int64"),
        }
    )


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
