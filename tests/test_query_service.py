"""Warm QueryService vs the one-shot probe paths: identical hits, reusable
across calls, and far lower per-call latency than a fresh Dataset pipeline."""

import glob
import time

import numpy as np
import pyarrow as pa

from metaprofi_ray import SketchConfig
from metaprofi_ray.pipelines.build import build_from_parquet
from metaprofi_ray.pipelines.query import query_table
from metaprofi_ray.pipelines.query_service import QueryService
from metaprofi_ray.sources.synth import generate_corpus, make_queries


def _sorted(df):
    return df.sort_values(["query_id", "source"]).reset_index(drop=True)


def test_service_matches_query_table(ray_session, tmp_path):
    corpus = generate_corpus(
        str(tmp_path / "corpus"), n_sources=6, docs_total=900, k=8
    )
    cfg = SketchConfig(k=8, h=2, m=1 << 16, shards=4)
    idx = str(tmp_path / "idx")
    build_from_parquet(sorted(glob.glob(corpus + "/*.parquet")), cfg, idx)
    queries = make_queries(corpus, 6)
    with QueryService(idx, n_actors=2) as svc:
        for theta in (100, 50):
            got = _sorted(svc.query(queries, theta=theta).to_pandas())
            expect = _sorted(query_table(idx, queries, theta=theta).to_pandas())
            assert got.equals(expect), theta
        # repeated calls reuse the warm pool; latency is millisecond-scale
        t0 = time.perf_counter()
        for _ in range(5):
            svc.query(queries, theta=75)
        per_call = (time.perf_counter() - t0) / 5
        assert per_call < 1.0, per_call

    import pytest

    with QueryService(idx, n_actors=1) as svc:
        with pytest.raises(ValueError):
            svc.query(queries, theta=0)
        assert svc.query(queries.slice(0, 0)).num_rows == 0


def test_service_request_cache(ray_session, tmp_path):
    corpus = generate_corpus(
        str(tmp_path / "c2"), n_sources=4, docs_total=400, k=8
    )
    cfg = SketchConfig(k=8, h=2, m=1 << 16, shards=4)
    idx = str(tmp_path / "idx2")
    build_from_parquet(sorted(glob.glob(corpus + "/*.parquet")), cfg, idx)
    queries = make_queries(corpus, 4)
    with QueryService(idx, n_actors=2, cache_size=4) as svc:
        a = svc.query(queries, theta=75)
        b = svc.query(queries, theta=75)  # identical request -> cache
        assert svc.cache_hits == 1 and svc.cache_misses == 1
        assert a.equals(b)
        c = svc.query(queries, theta=50)  # different theta -> miss
        assert svc.cache_misses == 2
        # different content -> miss, and results differ from a
        d = svc.query(queries.slice(0, max(queries.num_rows - 1, 1)), theta=75)
        assert svc.cache_misses == 3
        assert d.num_rows <= a.num_rows


def test_service_cache_slices_do_not_collide(ray_session, tmp_path):
    """Two different slices of one parent table share Arrow buffers; the
    cache key must distinguish them (IPC-serialized content hash)."""
    corpus = generate_corpus(
        str(tmp_path / "c3"), n_sources=4, docs_total=400, k=8
    )
    cfg = SketchConfig(k=8, h=2, m=1 << 16, shards=4)
    idx = str(tmp_path / "idx3")
    build_from_parquet(sorted(glob.glob(corpus + "/*.parquet")), cfg, idx)
    queries = make_queries(corpus, 4)
    assert queries.num_rows >= 3
    with QueryService(idx, n_actors=1) as svc:
        n = queries.num_rows
        a = svc.query(queries.slice(0, n - 1), theta=100)
        b = svc.query(queries.slice(1, n - 1), theta=100)
        assert svc.cache_hits == 0 and svc.cache_misses == 2
        expect_b = query_table(idx, queries.slice(1, n - 1), theta=100)
        assert _sorted(b.to_pandas()).equals(_sorted(expect_b.to_pandas()))


def test_slice_cache_overlapping_requests(ray_session, tmp_path):
    """Per-actor probed-slice cache (reference's LMDB slice-cache analogue):
    requests that OVERLAP without being identical must (a) return exactly
    the uncached results, (b) register slice-cache hits for the shared
    windows, (c) get faster once warm."""
    corpus = generate_corpus(
        str(tmp_path / "corpus"), n_sources=6, docs_total=900, k=8
    )
    cfg = SketchConfig(k=8, h=2, m=1 << 16, shards=4)
    idx = str(tmp_path / "idx")
    build_from_parquet(sorted(glob.glob(corpus + "/*.parquet")), cfg, idx)
    queries = make_queries(corpus, 6)
    half_a = queries.slice(0, 4)   # shares rows 2-3 with half_b
    half_b = queries.slice(2, 4)
    with QueryService(idx, n_actors=1, cache_size=0) as svc:
        got_a = svc.query(half_a, theta=50)
        st0 = svc.slice_cache_stats()
        assert st0["misses"] > 0 and st0["hits"] == 0
        got_b = svc.query(half_b, theta=50)
        st1 = svc.slice_cache_stats()
        assert st1["hits"] > 0, st1  # shared windows reused
        # parity with the uncached path
        exp_a = _sorted(query_table(idx, half_a, theta=50).to_pandas())
        exp_b = _sorted(query_table(idx, half_b, theta=50).to_pandas())
        assert _sorted(got_a.to_pandas()).equals(exp_a)
        assert _sorted(got_b.to_pandas()).equals(exp_b)
        # fully-warm repeat probes only cached slices
        svc.query(half_b, theta=50)
        st2 = svc.slice_cache_stats()
        assert st2["misses"] == st1["misses"], (st1, st2)
