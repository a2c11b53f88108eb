"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k is the exact baseline: the (small) query matrix is
broadcast with ``ray.put`` and every batch of the corpus computes one
numpy matmul block — a scan, not a shuffle.  The scale path is the
LSH-bucketed variant: random-hyperplane signatures put near vectors in the
same bucket, so each query only scans its bucket (probing the top-P closest
buckets for recall).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..functions.numeric import round_half_away


def _emb_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _query_vec(path: str, vec_id: int) -> np.ndarray:
    """Fetch ONE query row with a pushed-down row filter — row-group pruning
    via parquet statistics, never a full-table driver read (at 100 TB the
    store is vec_id-sorted so this touches a single row group)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "=", vec_id)]
    )
    if t.num_rows == 0:
        raise KeyError(f"vec_id {vec_id} not found")
    return np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[:1]


def _corpus_rows(path: str) -> int:
    """Row count from parquet footer metadata only (no data pages read)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def brute_force_topk(
    sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> pd.DataFrame:
    """Exact cosine top-k of one query vector against the corpus (excluding
    itself).  Per-batch partial top-k, final merge on the driver (the
    partial-aggregation pattern: only k rows per block leave the task)."""
    path = _emb_path(sf_dir)
    q = _normalize(_query_vec(path, query_vec_id))
    qref = ray.put(q)

    class Score:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                     "cosine": pd.Series([], dtype="float64")})
            mat = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
            sims = (mat @ self.q.T).ravel()
            keep = df["vec_id"].to_numpy() != query_vec_id
            out = pd.DataFrame(
                {"vec_id": df["vec_id"].to_numpy()[keep], "cosine": sims[keep]}
            )
            # partial top-k with deterministic tie-break inside the task
            return out.sort_values(
                ["cosine", "vec_id"], ascending=[False, True]
            ).head(k)

    partials = rd.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        Score, batch_format="pandas", batch_size=2048, concurrency=(1, 8)
    )
    top = (
        partials.to_pandas()
        .sort_values(["cosine", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["cosine"] = round_half_away(top["cosine"], 4)
    return top[["vec_id", "cosine"]]


def lsh_topk(
    sf_dir: str, query_vec_id: int = 0, k: int = 10, n_planes: int | None = None,
    n_probe_buckets: int = 8, seed: int = 13,
) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH: bucket = sign bits of
    ``n_planes`` projections; the query scans only the ``n_probe_buckets``
    buckets closest in Hamming distance.  At 100 TB the bucket id becomes
    the partition key of the embedding store so a probe touches only its
    bucket partitions."""
    path = _emb_path(sf_dir)
    q = _normalize(_query_vec(path, query_vec_id))
    dim = q.shape[1]
    if n_planes is None:
        # size buckets to ~32 vectors each so probing stays meaningful at
        # any corpus size (at 100 TB this is the partition-count knob);
        # corpus size comes from footer metadata, not a table read
        n_rows = _corpus_rows(path)
        n_planes = max(3, min(16, int(np.log2(max(n_rows, 64) / 32))))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    planes_ref = ray.put(planes)

    qsig_bits = (q @ planes.T > 0).astype(np.uint32).ravel()
    qref = ray.put(q)

    # bucket ids sorted by Hamming distance to the query signature
    all_sigs = np.arange(1 << n_planes, dtype=np.uint32)
    qsig = int((qsig_bits << np.arange(n_planes, dtype=np.uint32)).sum())
    ham = np.array([bin(int(s ^ qsig)).count("1") for s in all_sigs])
    probe = set(all_sigs[np.argsort(ham, kind="stable")][:n_probe_buckets].tolist())
    probe_ref = ray.put(probe)

    class BucketScore:
        def __init__(self):
            self.q = ray.get(qref)
            self.planes = ray.get(planes_ref)
            self.probe = ray.get(probe_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                     "cosine": pd.Series([], dtype="float64")})
            mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            bits = (mat @ self.planes.T > 0).astype(np.uint32)
            sig = (bits << np.arange(bits.shape[1], dtype=np.uint32)).sum(axis=1)
            mask = np.array([int(s) in self.probe for s in sig])
            mask &= df["vec_id"].to_numpy() != query_vec_id
            if not mask.any():
                return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                     "cosine": pd.Series([], dtype="float64")})
            sub = _normalize(mat[mask])
            sims = (sub @ self.q.T).ravel()
            out = pd.DataFrame(
                {"vec_id": df["vec_id"].to_numpy()[mask], "cosine": sims}
            )
            return out.sort_values(
                ["cosine", "vec_id"], ascending=[False, True]
            ).head(k)

    partials = rd.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        BucketScore, batch_format="pandas", batch_size=2048, concurrency=(1, 8)
    )
    pdf = partials.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    top = (
        pdf.sort_values(["cosine", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["cosine"] = round_half_away(top["cosine"], 4)
    return top[["vec_id", "cosine"]]


def knn_label_stats(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Per-label centroid norm + count (sanity aggregate over the embedding
    column — exercises list<float> columns through groupby)."""
    ds = rd.read_parquet(_emb_path(sf_dir), columns=["label", "embedding"])

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "label": [int(g["label"].iloc[0])],
                "n_vecs": [len(g)],
                "centroid_norm": [
                    float(round_half_away(np.linalg.norm(mat.mean(axis=0)), 4))
                ],
            }
        )

    return (
        ds.groupby("label")
        .map_groups(stats, batch_format="pandas")
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
