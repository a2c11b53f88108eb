"""Distributed-probe scale evidence (VERDICT r3 #4 "Done" criteria):

  1. 50k queries: distributed-probe results == broadcast-streaming results
     (hit-set parity at theta=75), with both wall times.
  2. 1M queries: the distributed run COMPLETES end-to-end (the monolithic
     probe-set build was the old ceiling), with wall time.
  3. Probe-set PREP scales with CPUs: the same 1M-query prep pass timed in
     fresh Ray sessions at 8 and 32 CPUs (the sandbox stand-in for the
     two-cluster-size criterion).

Usage:
  python scripts/probe_scale_bench.py            # full orchestration
  python scripts/probe_scale_bench.py --prep-only <ncpu>   # one prep run

Results are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SOURCES = 16
N_DOCS = 200_000
QUERY_TOKENS = 16  # 9 windows/query at k=8 — keeps 1M-query meta ~200 MB
INDEX_DIR = "/tmp/metaprofi_probe_scale_idx"
CORPUS_TAG = "probe_scale"


def _cfg():
    from metaprofi_ray.config import SketchConfig

    return SketchConfig(k=8, h=2, m=1 << 22, shards=8, hll_p=14)


def _queries(n: int):
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(11)
    toks = rng.integers(
        0, 1 << 20, size=(n, QUERY_TOKENS), dtype=np.int32
    )
    return pa.table(
        {
            "query_id": [f"q{i}" for i in range(n)],
            "tokens": pa.array(list(toks), type=pa.list_(pa.int32())),
        }
    )


def _init_ray(ncpu: int):
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _ensure_index():
    from metaprofi_ray.pipelines.build import build_from_parquet
    from metaprofi_ray.sources.synth_fast import generate_corpus_fast

    corpus = generate_corpus_fast(
        f"/tmp/metaprofi_bench_corpus_{CORPUS_TAG}_{N_DOCS}",
        n_docs=N_DOCS, files_per_source=2, max_docs_per_file=15_000,
        n_sources=N_SOURCES,
    )
    if not os.path.exists(os.path.join(INDEX_DIR, "manifest.json")):
        shutil.rmtree(INDEX_DIR, ignore_errors=True)
        build_from_parquet(corpus, _cfg(), INDEX_DIR)
    return corpus


def prep_only(ncpu: int, n_queries: int = 1_000_000) -> None:
    _init_ray(ncpu)
    import ray
    import ray.data as rd

    from functools import partial

    from metaprofi_ray.sources import io as bank_io
    from metaprofi_ray.stages.probe_distributed import prep_probe_batch

    cfg, _ = bank_io.read_manifest(INDEX_DIR)
    nsb = bank_io.shard_bucket_count(INDEX_DIR) or 1
    qt = _queries(n_queries)
    out = f"/tmp/metaprofi_probeset_bench_{ncpu}"
    shutil.rmtree(out, ignore_errors=True)
    qds = rd.from_arrow(qt).repartition(ncpu * 4).materialize()
    t0 = time.perf_counter()
    qds.map_batches(
        partial(prep_probe_batch, cfg=cfg, nsb=nsb),
        batch_format="pyarrow", zero_copy_batch=True,
    ).write_parquet(out, partition_cols=["sb"])
    wall = time.perf_counter() - t0
    print(json.dumps({"ncpu": ncpu, "n_queries": n_queries,
                      "prep_sec": round(wall, 3)}))
    ray.shutdown()


def main() -> None:
    _init_ray(int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    import ray

    from metaprofi_ray.pipelines import query as query_pipe

    _ensure_index()
    out: dict = {"metric": "distributed_probe_scale", "unit": "sec"}

    # ---- 50k parity: distributed vs broadcast streaming ----------------
    qt50 = _queries(50_000)
    t0 = time.perf_counter()
    bc = query_pipe.query_index_streaming(INDEX_DIR, qt50, theta=75).to_pandas()
    out["bcast_50k_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    dd = query_pipe.query_index_streaming_distributed(
        INDEX_DIR, qt50, theta=75
    ).to_pandas()
    out["dist_50k_sec"] = round(time.perf_counter() - t0, 3)
    key = lambda df: sorted(
        map(tuple, df[["query_id", "source", "wins_found"]].values.tolist())
    )
    assert key(bc) == key(dd), (
        f"parity FAILED: {len(bc)} vs {len(dd)} hits"
    )
    out["parity_50k"] = True
    out["hits_50k"] = len(dd)

    # ---- 1M end-to-end completion --------------------------------------
    qt1m = _queries(1_000_000)
    t0 = time.perf_counter()
    n = query_pipe.query_index_streaming_distributed(
        INDEX_DIR, qt1m, theta=75
    ).count()
    out["dist_1m_sec"] = round(time.perf_counter() - t0, 3)
    out["hits_1m"] = int(n)
    ray.shutdown()

    # ---- prep scaling at 8 vs 32 CPUs (fresh sessions) -----------------
    for ncpu in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--prep-only",
             str(ncpu)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        r = json.loads(p.stdout.strip().splitlines()[-1])
        out[f"prep_sec_{ncpu}cpu"] = r["prep_sec"]
    eff = (out["prep_sec_8cpu"] / out["prep_sec_32cpu"]) / (32 / 8)
    out["prep_scaling_efficiency"] = round(eff, 3)
    print(json.dumps(out))


def sparse_mode(n_sources: int = 1000, n_queries: int = 50_000) -> None:
    """Adversarial sparse-shard run (VERDICT r4 #2 "Done" criterion): one
    8-token doc per source → ONE window → ≤2 of 8 shards covered per
    source, while every 16-token query's constraints span ~all shards, so
    the lane reduce's missing-shard correction flags ~every (source,
    query) cell (~S×Q).  Before the vectorization this degraded to
    row-at-a-time Python unpackbits; now it is one gather + dedupe +
    bit-test + bincount per source segment.  Prints the sparse wall next
    to the same-Q dense-index wall for the flat-vs-fast-path comparison."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd

    from metaprofi_ray.pipelines import query as query_pipe
    from metaprofi_ray.pipelines.build import build_index

    _init_ray(int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    sparse_idx = "/tmp/metaprofi_probe_sparse_idx"
    if not os.path.exists(os.path.join(sparse_idx, "manifest.json")):
        shutil.rmtree(sparse_idx, ignore_errors=True)
        rng = np.random.default_rng(5)
        docs = pa.table(
            {
                "doc_id": [f"d{i}" for i in range(n_sources)],
                "tokens": pa.array(
                    list(rng.integers(0, 1 << 20, size=(n_sources, 8),
                                      dtype=np.int32)),
                    type=pa.list_(pa.int32()),
                ),
                "n_tok": pa.array([8] * n_sources, pa.int32()),
                "source": [f"s{i}" for i in range(n_sources)],
            }
        )
        build_index(rd.from_arrow(docs), _cfg(), sparse_idx)
    _ensure_index()
    qt = _queries(n_queries)
    out: dict = {"metric": "sparse_shard_lane_reduce", "unit": "sec",
                 "n_sources": n_sources, "n_queries": n_queries}
    t0 = time.perf_counter()
    n = query_pipe.query_index_streaming_distributed(
        sparse_idx, qt, theta=75, lane_mode=True
    ).count()
    out["sparse_sec"] = round(time.perf_counter() - t0, 3)
    out["sparse_hits"] = int(n)
    t0 = time.perf_counter()
    n = query_pipe.query_index_streaming_distributed(
        INDEX_DIR, qt, theta=75, lane_mode=True
    ).count()
    out["dense_sec"] = round(time.perf_counter() - t0, 3)
    out["dense_hits"] = int(n)
    print(json.dumps(out))
    ray.shutdown()


def _queries_parquet(n: int) -> str:
    """The same deterministic query panel as ``_queries`` persisted as a
    multi-file parquet dataset — the production-shaped query source (a
    1M-row driver-side pa.Table is the documented anti-pattern; real
    callers read query panels from storage, which streams and
    parallelizes the prep pass)."""
    import pyarrow.parquet as pq

    out = f"/tmp/metaprofi_query_panel_{n}"
    if not os.path.isdir(out):
        os.makedirs(out + ".tmp", exist_ok=True)
        qt = _queries(n)
        step = max(n // 32, 1)
        for i in range(0, n, step):
            pq.write_table(
                qt.slice(i, step),
                os.path.join(out + ".tmp", f"part-{i:09d}.parquet"),
            )
        os.rename(out + ".tmp", out)
    return out


def e2e_scaling(levels=(8, 32), n_queries: int = 1_000_000) -> None:
    """Full 1M-query distributed search at two parallelism levels in fresh
    processes (VERDICT r4 #7): the query-side counterpart of bench.py
    --scaling's build criterion.  The index is built once up front; each
    child pays the full e2e cost (probeset prep + probe + reduce).  Both
    query-source shapes are measured: the driver-side TABLE (includes the
    serial ingestion overhead the API docs call out) and the parquet
    Dataset (the production shape — prep streams from storage)."""
    _init_ray(int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    import ray

    _ensure_index()
    ray.shutdown()
    _queries_parquet(n_queries)
    out: dict = {"metric": "dist_query_e2e_scaling", "unit": "ratio",
                 "n_queries": n_queries, "levels": list(levels)}
    for mode, flag in (("table", []), ("pq", ["--pq"])):
        for ncpu in levels:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--e2e",
                 str(n_queries)] + flag,
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))
                ),
            )
            r = json.loads(p.stdout.strip().splitlines()[-1])
            out[f"e2e_{mode}_sec_{ncpu}cpu"] = r["e2e_sec"]
            out[f"hits_{mode}_{ncpu}cpu"] = r["hits"]
        lo, hi = levels
        eff = (
            out[f"e2e_{mode}_sec_{lo}cpu"] / out[f"e2e_{mode}_sec_{hi}cpu"]
        ) / (hi / lo)
        out[f"efficiency_{mode}"] = round(eff, 3)
    out["value"] = out["efficiency_pq"]
    print(json.dumps(out))


def e2e_only(n_queries: int, from_parquet: bool = False) -> None:
    """One end-to-end distributed search at an arbitrary query count
    (the 4M-tier record in BENCH/BASELINE.md was produced with this).
    ``from_parquet`` feeds the query panel as a streamed parquet Dataset
    instead of a driver-side table."""
    _init_ray(int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    import ray
    import ray.data as rd

    from metaprofi_ray.pipelines import query as query_pipe

    _ensure_index()
    if from_parquet:
        qt = rd.read_parquet(_queries_parquet(n_queries))
    else:
        qt = _queries(n_queries)
    t0 = time.perf_counter()
    n = query_pipe.query_index_streaming_distributed(
        INDEX_DIR, qt, theta=75
    ).count()
    print(json.dumps({"n_queries": n_queries,
                      "e2e_sec": round(time.perf_counter() - t0, 3),
                      "hits": int(n)}))
    ray.shutdown()


if __name__ == "__main__":
    if "--prep-only" in sys.argv:
        i = sys.argv.index("--prep-only")
        ncpu = int(sys.argv[i + 1])
        nq = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 1_000_000
        prep_only(ncpu, nq)
    elif "--e2e-scaling" in sys.argv:
        e2e_scaling()
    elif "--e2e" in sys.argv:
        i = sys.argv.index("--e2e")
        e2e_only(int(sys.argv[i + 1]), from_parquet="--pq" in sys.argv)
    elif "--sparse" in sys.argv:
        sparse_mode()
    else:
        main()
