"""IVF-partitioned ANN: read pruning + recall vs the exact baseline."""

import numpy as np
import pytest

from metaprofi_ray.pipelines import ann, ann_ivf

SF = "/root/testdata/sf0.001"


def test_ivf_full_equals_brute(ray_session):
    """nprobe=nlist scans everything → must equal exact brute force (also
    proves the cell assignment kept every vector exactly once)."""
    brute = ann.brute_force_topk(SF, query_vec_id=0, k=10)
    full = ann_ivf.ivf_topk_full(SF, query_vec_id=0, k=10)
    assert full["vec_id"].tolist() == brute["vec_id"].tolist()
    np.testing.assert_allclose(full["cosine"], brute["cosine"], atol=1e-9)


def test_ivf_prunes_reads(ray_session):
    top, stats = ann_ivf.ivf_topk(
        SF, query_vec_id=0, k=10, nlist=16, nprobe=4, return_stats=True
    )
    assert len(top) == 10
    assert stats["files_read"] < stats["files_total"], stats
    # reads at most ~nprobe/nlist of the cells (file counts per cell vary)
    assert stats["files_read"] / stats["files_total"] <= 0.5


@pytest.mark.parametrize("qid", [0, 7, 23])
def test_ivf_recall(ray_session, qid):
    """recall@10 of the pruned probe vs exact — reported, bounded below.
    Random embeddings are the hardest case for IVF (no cluster structure),
    so the bound is deliberately loose; structured corpora do far better."""
    brute = set(ann.brute_force_topk(SF, query_vec_id=qid, k=10)["vec_id"])
    approx = set(
        ann_ivf.ivf_topk(SF, query_vec_id=qid, k=10, nlist=16, nprobe=8)[
            "vec_id"
        ]
    )
    recall = len(brute & approx) / 10
    assert recall >= 0.3, f"recall@10 = {recall}"


def test_kmeans_parallel_init(ray_session):
    """k-means|| init: deterministic under reruns, k centroids of the right
    shape, and end inertia no worse than ~2x the prefix init's."""
    import numpy as np

    from metaprofi_ray.pipelines.clustering import kmeans_centroids

    path = SF + "/embeddings.parquet"
    c1, last1 = kmeans_centroids(path, k=8, iters=3, init="kmeans||")
    c2, _ = kmeans_centroids(path, k=8, iters=3, init="kmeans||")
    np.testing.assert_allclose(c1, c2)
    assert c1.shape[0] == 8
    _, last_p = kmeans_centroids(path, k=8, iters=3)
    assert last1["inertia"].sum() <= 2.0 * last_p["inertia"].sum()


def test_ivf_cells_manifest(ray_session):
    """The cell manifest's row counts sum to the corpus and probe stats
    report the exact row coverage."""
    import json
    import os

    import pyarrow.parquet as pq

    top, stats = ann_ivf.ivf_topk(
        SF, query_vec_id=0, k=10, nlist=16, nprobe=4, return_stats=True
    )
    assert "row_coverage" in stats
    corpus_rows = pq.ParquetFile(SF + "/embeddings.parquet").metadata.num_rows
    assert stats["rows_total"] == corpus_rows
    assert 0 < stats["rows_probed"] <= corpus_rows
    assert stats["row_coverage"] < 1.0


def test_ivf_cell_balance_on_skewed_corpus(ray_session, tmp_path):
    """k-means|| (the default quantizer init since round 3) must keep cell
    sizes bounded on a skewed corpus whose leading row group holds ONLY the
    dominant cluster — exactly the layout that biases prefix init."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    n, dim, nlist = 2000, 16, 8
    centers = rng.standard_normal((nlist, dim)) * 5.0
    labels = np.where(rng.random(n) < 0.6, 0, rng.integers(1, nlist, n))
    vecs = centers[labels] + rng.standard_normal((n, dim)) * 0.5
    order = np.argsort(labels, kind="stable")  # cluster 0 first: worst case
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs[order]], pa.list_(pa.float64())
            ),
        }
    )
    path = str(tmp_path / "skewed.parquet")
    pq.write_table(tbl, path, row_group_size=256)
    idx = ann_ivf.build_ivf_index(path, nlist=nlist, iters=4)
    with open(idx + "/cells_manifest.json") as fh:
        man = json.load(fh)
    rows = [int(v) for v in man["cell_rows"].values()]
    assert sum(rows) == n  # no vector lost or duplicated
    # the dominant cluster is 60% of the corpus; a healthy quantizer splits
    # it across cells instead of collapsing everything into one
    assert max(rows) <= 0.75 * n, rows
    assert len([r for r in rows if r > 0]) >= nlist // 2, rows


def test_batched_ann_matches_per_query(ray_session):
    """Batched brute force (one corpus pass for Q queries) must equal the
    per-query exact path; the batched IVF probe reads the UNION of probed
    cells once and keeps per-query recall above the check bound."""
    from metaprofi_ray.pipelines.ann import brute_force_topk, brute_force_topk_batch

    batch = brute_force_topk_batch(SF, (0, 7, 23), k=10)
    for q in (0, 7, 23):
        solo = brute_force_topk(SF, query_vec_id=q, k=10)
        sub = batch[batch["qid"] == q].reset_index(drop=True)
        assert sub["vec_id"].tolist() == solo["vec_id"].tolist(), q
        np.testing.assert_allclose(sub["cosine"], solo["cosine"], atol=1e-9)
    approx, stats = ann_ivf.ivf_topk_batch(
        SF, (0, 7, 23), k=10, nprobe=4, return_stats=True
    )
    assert stats["files_read"] <= stats["files_total"]
    # amortization: union of 3x4 probed cells <= 12 files, read once
    assert stats["files_read"] <= 3 * 4
    for q in (0, 7, 23):
        assert len(approx[approx["qid"] == q]) == 10


def test_ivf_cell_resplit_bounds_file_size(ray_session, tmp_path):
    """cell_row_budget re-splits oversized cells into hashed sub-partitions:
    no probe unit exceeds the budget (2x slack for hash jitter), no vector
    is lost, and probes read the sub-files transparently."""
    import glob as g
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    n, dim, nlist = 1500, 8, 4
    centers = rng.standard_normal((nlist, dim)) * 6.0
    labels = np.where(rng.random(n) < 0.7, 0, rng.integers(1, nlist, n))
    vecs = centers[labels] + rng.standard_normal((n, dim)) * 0.3
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float64())
            ),
        }
    )
    path = str(tmp_path / "skew2.parquet")
    pq.write_table(tbl, path)
    budget = 300
    idx = ann_ivf.build_ivf_index(path, nlist=nlist, cell_row_budget=budget)
    with open(idx + "/cells_manifest.json") as fh:
        man = json.load(fh)
    assert man["resplit"], man  # the hot cell must have been split
    files = g.glob(idx + "/cells/bucket=*/**/*.parquet", recursive=True)
    per_file = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert sum(per_file) == n
    assert max(per_file) <= 2 * budget, sorted(per_file)[-3:]
    # probes see the sub-files transparently
    chosen, total = ann_ivf._cell_files(idx, list(range(nlist)))
    assert sorted(chosen) == sorted(files) and total == len(files)
