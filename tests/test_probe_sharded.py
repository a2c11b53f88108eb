"""Streaming sharded query path: equivalence with the broadcast prober."""

import glob

import pandas as pd
import pytest

from metaprofi_ray.config import SketchConfig
from metaprofi_ray.pipelines import build as build_pipe
from metaprofi_ray.pipelines import query as query_pipe
from metaprofi_ray.sources.synth import generate_corpus, make_queries

CFG = SketchConfig(k=8, h=2, m=1 << 16, shards=4)


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("shq")
    corpus = generate_corpus(str(root / "corpus"), n_sources=6, docs_total=500, k=8)
    idx = str(root / "idx")
    build_pipe.build_from_parquet(sorted(glob.glob(corpus + "/*.parquet")), CFG, idx)
    return corpus, idx


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["query_id", "source"]).reset_index(drop=True)
        [["query_id", "source", "wins_found", "n_wins", "fraction"]]
    )


@pytest.mark.parametrize("lane_mode", [False, True])
@pytest.mark.parametrize("theta", [100, 60])
def test_streaming_equals_broadcast(small_index, theta, lane_mode):
    corpus, idx = small_index
    queries = make_queries(corpus, CFG.k, n_exact=20, n_negative=20)
    broadcast = query_pipe.query_table(idx, queries, theta=theta).to_pandas()
    streaming = query_pipe.query_index_streaming(
        idx, queries, theta=theta, lane_mode=lane_mode
    ).to_pandas()
    assert _norm(streaming).equals(_norm(broadcast))


def test_streaming_missing_shard_semantics(ray_session, tmp_path_factory):
    """A source whose bank lacks a probed shard must NOT vacuously match.
    Tiny corpus with one-doc sources makes sparse shard coverage likely."""
    import numpy as np
    import pyarrow as pa

    from metaprofi_ray.pipelines.build import build_index
    import ray.data as rd

    root = tmp_path_factory.mktemp("sparse")
    rng = np.random.default_rng(3)
    # one doc with exactly one window per source: touches at most h shards
    docs = pa.table(
        {
            "doc_id": [f"d{i}" for i in range(6)],
            "tokens": pa.array(
                [rng.integers(0, 100, size=8, dtype=np.int32) for _ in range(6)],
                type=pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([8] * 6, pa.int32()),
            "source": [f"s{i}" for i in range(6)],
        }
    )
    idx = str(root / "idx")
    build_index(rd.from_arrow(docs), CFG, idx)
    # query = doc 0's window: must hit ONLY sources containing that window
    queries = pa.table(
        {"query_id": ["q0"], "tokens": pa.array([docs["tokens"][0].as_py()], pa.list_(pa.int32()))}
    )
    broadcast = query_pipe.query_table(idx, queries, theta=100).to_pandas()
    streaming = query_pipe.query_index_streaming(idx, queries, theta=100).to_pandas()
    assert _norm(streaming).equals(_norm(broadcast))
    assert "s0" in set(streaming["source"])
    # the lane protocol carries vacuous template bits for unconstrained
    # (source, query) cells and relies on the correction to clear them
    lanes = query_pipe.query_index_streaming(
        idx, queries, theta=100, lane_mode=True
    ).to_pandas()
    assert _norm(lanes).equals(_norm(broadcast))


def test_source_restricted_query_prunes_at_read(small_index):
    """On the hive srcbucket layout a sources= query must read FEWER files
    than the whole index holds (dir-level pruning) and return exactly the
    full run's hits for those sources."""
    from metaprofi_ray.sources import io as bank_io

    corpus, idx = small_index
    queries = make_queries(corpus, CFG.k, n_exact=12, n_negative=6)
    full = query_pipe.query_index_streaming(idx, queries, theta=100).to_pandas()
    assert len(full) > 0
    # pick one source that actually has hits
    target = sorted(full["source"])[0]
    pruned_files, total = bank_io.bank_files(idx, sources=[target])
    assert total > 0 and len(pruned_files) < total, (len(pruned_files), total)
    restricted = query_pipe.query_index_streaming(
        idx, queries, theta=100, sources=[target]
    ).to_pandas()
    expect = full[full["source"] == target]
    assert _norm(restricted).equals(_norm(expect))


def test_bank_files_flat_layout_no_prune(ray_session, tmp_path_factory):
    """src_buckets=0 writes the flat layout; bank_files must then return
    every file regardless of sources (no false pruning)."""
    from metaprofi_ray.sources import io as bank_io

    root = tmp_path_factory.mktemp("flat")
    corpus = generate_corpus(str(root / "corpus"), n_sources=3, docs_total=120, k=8)
    idx = str(root / "idx")
    build_pipe.build_index(
        build_pipe.read_tokens(sorted(glob.glob(corpus + "/*.parquet"))),
        CFG, idx, src_buckets=0,
    )
    files, total = bank_io.bank_files(idx, sources=["anything"])
    assert len(files) == total > 0
    # flat + bucketed layouts answer queries identically
    queries = make_queries(corpus, CFG.k, n_exact=5, n_negative=2)
    hits = query_pipe.query_index_streaming(idx, queries, theta=100).to_pandas()
    broadcast = query_pipe.query_table(idx, queries, theta=100).to_pandas()
    assert _norm(hits).equals(_norm(broadcast))
