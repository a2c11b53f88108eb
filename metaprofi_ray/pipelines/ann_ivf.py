"""IVF-partitioned approximate nearest-neighbor search (the ANN scale path).

``ann.lsh_topk`` prunes by masking inside a full scan — every batch is still
read.  This module prunes AT THE READ: a k-means coarse quantizer (trained
distributed by ``clustering.kmeans_centroids``) assigns every vector to its
nearest-centroid cell, the store is rewritten as hive-partitioned Parquet
(``cells/bucket=<b>/``), and a query reads ONLY its ``nprobe`` closest
cells' files.  At 100 TB the cell is the unit of I/O: a probe touches
nprobe/nlist of the corpus, and the partitioned layout is exactly how the
store would be laid out on object storage.

Cosine metric throughout: vectors and centroids are L2-normalized, so
nearest-centroid = argmax dot product.

The cell index is built once per (corpus file, params) and cached in /tmp,
keyed by file size+mtime — the same discipline as
``flagship.build_index_for``.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import tempfile

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..functions.numeric import round_half_away
from .ann import _normalize, _query_vec
from .clustering import kmeans_centroids

CENTROIDS = "centroids.npy"
CELLS = "cells"


def build_ivf_index(
    emb_path: str, nlist: int = 16, iters: int = 4, seed: int = 5,
    init: str = "kmeans||", cell_row_budget: int | None = None,
) -> str:
    """Build (or reuse the cached) IVF cell layout for an embeddings file.
    Returns the index dir containing ``centroids.npy`` + ``cells/``.

    The coarse quantizer defaults to the distributed k-means|| init
    (VERDICT r2 #5): a prefix-seeded quantizer is biased toward the leading
    row group, which at 100 TB skews cell sizes — exactly what the cells
    manifest exists to detect.  ``cell_row_budget`` bounds the unit of
    probe I/O: any cell exceeding it is RE-SPLIT into hashed
    sub-partitions (``bucket=<b>/sub=<s>/``), so one hot cell never
    becomes one giant file / one straggler probe task — probes still read
    whole cells (pruning unchanged), just as several balanced files."""
    st = os.stat(emb_path)
    key_material = (
        f"{os.path.abspath(emb_path)}|{st.st_size}|{st.st_mtime_ns}"
        f"|nlist={nlist}|iters={iters}|seed={seed}|init={init}"
        f"|budget={cell_row_budget}|v3"
    )
    key = hashlib.blake2b(key_material.encode(), digest_size=8).hexdigest()
    index_dir = os.path.join(tempfile.gettempdir(), f"metaprofi_ray_ivf_{key}")
    if os.path.exists(os.path.join(index_dir, CENTROIDS)):
        return index_dir
    tmp = f"{index_dir}.building.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    centroids, _ = kmeans_centroids(
        emb_path, k=nlist, iters=iters, seed=seed, init=init
    )
    cnorm = _normalize(centroids)
    cref = ray.put(cnorm)

    class AssignBucket:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                df["bucket"] = pd.Series([], dtype="int64")
                return df
            mat = _normalize(
                np.stack(df["embedding"].to_numpy()).astype(np.float64)
            )
            df = df.copy()
            df["bucket"] = (mat @ self.c.T).argmax(axis=1).astype("int64")
            return df

    ds = rd.read_parquet(emb_path)
    ds.map_batches(
        AssignBucket, batch_format="pandas", batch_size=2048, concurrency=(1, 8)
    ).write_parquet(os.path.join(tmp, CELLS), partition_cols=["bucket"])
    np.save(os.path.join(tmp, CENTROIDS), centroids)
    # per-cell row counts from the written files' parquet footers (metadata
    # only): the balanced-probe manifest — lets a query report exactly what
    # fraction of the corpus its probed cells cover, and drives the
    # cell re-split below when assignment skews
    import json

    import pyarrow.parquet as pq

    def _count_cells(root: str) -> dict[str, int]:
        out: dict[str, int] = {}
        for bdir in sorted(glob.glob(os.path.join(root, CELLS, "bucket=*"))):
            b = os.path.basename(bdir).split("=", 1)[1]
            out[b] = sum(
                pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(os.path.join(bdir, "**", "*.parquet"),
                                   recursive=True)
            )
        return out

    cell_rows = _count_cells(tmp)
    resplit: dict[str, int] = {}
    if cell_row_budget:
        for b, n in cell_rows.items():
            if n <= cell_row_budget:
                continue
            n_sub = -(-n // cell_row_budget)
            bdir = os.path.join(tmp, CELLS, f"bucket={b}")

            def add_sub(df: pd.DataFrame, n_sub=n_sub) -> pd.DataFrame:
                df = df.copy()
                df["sub"] = (
                    df["vec_id"].to_numpy().astype(np.int64) % n_sub
                ).astype("int64")
                return df

            sub_tmp = bdir + ".resplit"
            rd.read_parquet(bdir).map_batches(
                add_sub, batch_format="pandas"
            ).write_parquet(sub_tmp, partition_cols=["sub"])
            shutil.rmtree(bdir)
            os.rename(sub_tmp, bdir)
            resplit[b] = n_sub
    with open(os.path.join(tmp, "cells_manifest.json"), "w") as fh:
        json.dump(
            {"nlist": nlist, "cell_rows": cell_rows,
             "cell_row_budget": cell_row_budget, "resplit": resplit},
            fh, indent=2,
        )
    try:
        os.rename(tmp, index_dir)  # atomic publish; loser of a race discards
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return index_dir


def _cell_files(index_dir: str, buckets: list[int]) -> tuple[list[str], int]:
    """Parquet files of the chosen cells + the total cell-file count
    (recursive: re-split cells hold ``sub=*`` sub-partitions)."""
    cells_dir = os.path.join(index_dir, CELLS)
    all_files = glob.glob(
        os.path.join(cells_dir, "bucket=*", "**", "*.parquet"), recursive=True
    )
    chosen: list[str] = []
    for b in buckets:
        chosen.extend(
            sorted(
                glob.glob(
                    os.path.join(cells_dir, f"bucket={b}", "**", "*.parquet"),
                    recursive=True,
                )
            )
        )
    return chosen, len(all_files)


def ivf_topk(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    return_stats: bool = False,
):
    """Approximate cosine top-k probing only the ``nprobe`` cells whose
    centroids are closest to the query.  ``nprobe == nlist`` degenerates to
    an exact scan (oracle-checked as ``ann_ivf_topk_full``); smaller nprobe
    trades recall for reading a fraction of the store (recall measured in
    tests/test_ann_ivf.py)."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    index_dir = build_ivf_index(emb_path, nlist=nlist)
    centroids = _normalize(np.load(os.path.join(index_dir, CENTROIDS)))
    q = _normalize(_query_vec(emb_path, query_vec_id))
    order = np.argsort(-(q @ centroids.T).ravel(), kind="stable")
    buckets = order[: max(1, min(nprobe, len(order)))].tolist()
    files, n_total_files = _cell_files(index_dir, buckets)
    qref = ray.put(q)

    class Score:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                     "cosine": pd.Series([], dtype="float64")})
            mat = _normalize(
                np.stack(df["embedding"].to_numpy()).astype(np.float64)
            )
            sims = (mat @ self.q.T).ravel()
            keep = df["vec_id"].to_numpy() != query_vec_id
            out = pd.DataFrame(
                {"vec_id": df["vec_id"].to_numpy()[keep], "cosine": sims[keep]}
            )
            return out.sort_values(
                ["cosine", "vec_id"], ascending=[False, True]
            ).head(k)

    partials = rd.read_parquet(files, columns=["vec_id", "embedding"]).map_batches(
        Score, batch_format="pandas", batch_size=2048, concurrency=(1, 8)
    )
    top = (
        partials.to_pandas()
        .sort_values(["cosine", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["cosine"] = round_half_away(top["cosine"], 4)
    top = top[["vec_id", "cosine"]]
    if return_stats:
        import json

        stats = {"files_read": len(files), "files_total": n_total_files,
                 "buckets": buckets}
        mpath = os.path.join(index_dir, "cells_manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as fh:
                man = json.load(fh)
            cr = man.get("cell_rows", {})
            total = sum(cr.values())
            probed = sum(cr.get(str(b), 0) for b in buckets)
            stats["rows_probed"] = probed
            stats["rows_total"] = total
            stats["row_coverage"] = round(probed / max(total, 1), 4)
        return top, stats
    return top


def ivf_topk_full(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pd.DataFrame:
    """nprobe = nlist: scans every cell — byte-identical to brute force, so
    the DuckDB cosine-top-k oracle verifies the whole IVF chain (assignment
    must not lose or duplicate a single vector)."""
    return ivf_topk(sf_dir, query_vec_id=query_vec_id, k=k, nprobe=10**9)


def ivf_topk_batch(
    sf_dir: str,
    query_vec_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    return_stats: bool = False,
):
    """Multi-query IVF probe with AMORTIZED cell reads: the union of every
    query's ``nprobe`` cells is read ONCE; each batch re-derives its rows'
    cell assignment (one matmul against the broadcast centroids — cheaper
    than trusting path parsing) and scores each query only against rows in
    cells that query probes.  Q queries cost |union cells| of I/O, not
    Q × nprobe cell reads — the serving shape a large corpus needs."""
    from .ann import _merge_partial_topk, _query_mat

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    index_dir = build_ivf_index(emb_path, nlist=nlist)
    centroids = _normalize(np.load(os.path.join(index_dir, CENTROIDS)))
    qmat, qids = _query_mat(emb_path, query_vec_ids)
    order = np.argsort(-(qmat @ centroids.T), axis=1, kind="stable")
    npb = max(1, min(nprobe, centroids.shape[0]))
    probe_cells = order[:, :npb]  # (nq, nprobe)
    # (nlist, nq) membership: does query j probe cell c?
    probes = np.zeros((centroids.shape[0], len(qids)), dtype=bool)
    for j in range(len(qids)):
        probes[probe_cells[j], j] = True
    union_cells = sorted({int(c) for c in probe_cells.ravel()})
    files, n_total_files = _cell_files(index_dir, union_cells)
    bref = ray.put((qmat, qids, centroids, probes))

    class Score:
        def __init__(self):
            self.qmat, self.qids, self.c, self.probes = ray.get(bref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            EMPTY = pd.DataFrame(
                {"qid": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
            if len(df) == 0:
                return EMPTY
            mat = _normalize(
                np.stack(df["embedding"].to_numpy()).astype(np.float64)
            )
            vids = df["vec_id"].to_numpy().astype(np.int64)
            cell = (mat @ self.c.T).argmax(axis=1)
            sims = mat @ self.qmat.T
            outs = []
            for j, q in enumerate(self.qids):
                keep = self.probes[cell, j] & (vids != q)
                if not keep.any():
                    continue
                sub = pd.DataFrame(
                    {"qid": q, "vec_id": vids[keep], "cosine": sims[keep, j]}
                )
                outs.append(
                    sub.sort_values(["cosine", "vec_id"],
                                    ascending=[False, True]).head(k)
                )
            return pd.concat(outs, ignore_index=True) if outs else EMPTY

    partials = rd.read_parquet(files, columns=["vec_id", "embedding"]).map_batches(
        Score, batch_format="pandas", batch_size=2048, concurrency=(1, 8)
    )
    top = _merge_partial_topk(partials.to_pandas(), k)
    if return_stats:
        stats = {
            "files_read": len(files),
            "files_total": n_total_files,
            "union_cells": union_cells,
            "cells_per_query": npb,
        }
        return top, stats
    return top


def ivf_batch_recall_check(
    sf_dir: str,
    query_vec_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    recall_bound: float = 0.3,
) -> pd.DataFrame:
    """Bound-check face of the batched IVF probe: rows are the exact
    multi-query brute-force top-k (SQL window-function-reproducible) plus
    constants the oracle pins TRUE — mean recall across the query batch
    ≥ ``recall_bound`` and read pruning (union of probed cells < store)."""
    from .ann import brute_force_topk_batch

    exact = brute_force_topk_batch(sf_dir, query_vec_ids, k)
    approx, stats = ivf_topk_batch(
        sf_dir, query_vec_ids, k, nlist=nlist, nprobe=nprobe,
        return_stats=True,
    )
    recalls = []
    for q in query_vec_ids:
        e = set(exact.loc[exact["qid"] == q, "vec_id"])
        a = set(approx.loc[approx["qid"] == q, "vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    out = exact.copy()
    out["recall_ok"] = bool(float(np.mean(recalls)) >= recall_bound)
    out["read_pruned"] = bool(stats["files_read"] < stats["files_total"])
    return out


def ivf_recall_check(
    sf_dir: str, query_vec_id: int = 0, k: int = 10, nlist: int = 16,
    nprobe: int = 8, recall_bound: float = 0.3,
) -> pd.DataFrame:
    """Bound-check face of ``ivf_topk``: rows are the EXACT brute-force
    top-k (SQL-reproducible) plus constants ``recall_ok`` (pruned-probe
    recall ≥ bound; random embeddings are IVF's hardest case, hence the
    loose bound — structured corpora do far better) and ``read_pruned``
    (the probe must read fewer files than the store holds).  The DuckDB
    oracle pins the exact rows and TRUE/TRUE."""
    from .ann import brute_force_topk

    exact = brute_force_topk(sf_dir, query_vec_id=query_vec_id, k=k)
    approx, stats = ivf_topk(
        sf_dir, query_vec_id=query_vec_id, k=k, nlist=nlist, nprobe=nprobe,
        return_stats=True,
    )
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / max(k, 1)
    out = exact.copy()
    out["recall_ok"] = bool(recall >= recall_bound)
    out["read_pruned"] = bool(stats["files_read"] < stats["files_total"])
    return out
