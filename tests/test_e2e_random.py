"""Randomized end-to-end property: build + query vs brute force on many
small random corpora (beyond the fixed fixture — random lengths, skew,
configs).  Bloom guarantees checked exactly: no false negatives ever;
counters exact; theta threshold exact on true counts."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metaprofi_ray.config import SketchConfig
from metaprofi_ray.pipelines.build import build_index
from metaprofi_ray.pipelines.query import query_table


def _random_corpus(rng, n_docs, n_sources, k, vocab):
    rows = {"doc_id": [], "tokens": [], "n_tok": [], "source": []}
    for i in range(n_docs):
        n = int(rng.integers(1, 40))
        toks = rng.integers(0, vocab, size=n, dtype=np.int32)
        rows["doc_id"].append(f"d{i:05d}")
        rows["tokens"].append(toks)
        rows["n_tok"].append(n)
        rows["source"].append(f"s{int(rng.integers(0, n_sources)):02d}")
    return pa.table(
        {
            "doc_id": rows["doc_id"],
            "tokens": pa.array(rows["tokens"], pa.list_(pa.int32())),
            "n_tok": pa.array(rows["n_tok"], pa.int32()),
            "source": rows["source"],
        }
    )


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_random_corpus_no_false_negatives_and_exact_counts(
    ray_session, tmp_path_factory, seed
):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 6))
    cfg = SketchConfig(
        k=k, h=int(rng.integers(1, 4)), m=1 << 15,
        shards=int(rng.choice([1, 2, 4, 8])),
    )
    vocab = 500  # small vocab -> real duplicate windows across docs
    corpus = _random_corpus(rng, n_docs=150, n_sources=4, k=k, vocab=vocab)
    idx = str(tmp_path_factory.mktemp(f"rnd{seed}") / "idx")
    build_index(rd.from_arrow(corpus), cfg, idx)

    # brute-force window bags
    bags: dict[str, list[bytes]] = {}
    for r in range(corpus.num_rows):
        toks = np.asarray(corpus["tokens"][r].as_py(), dtype=np.int32)
        src = corpus["source"][r].as_py()
        for i in range(len(toks) - k + 1):
            bags.setdefault(src, []).append(toks[i : i + k].tobytes())

    # queries: random spans of random docs + pure random rows
    q_rows = {"query_id": [], "tokens": []}
    for j in range(40):
        if j % 2 == 0:
            r = int(rng.integers(0, corpus.num_rows))
            toks = np.asarray(corpus["tokens"][r].as_py(), dtype=np.int32)
            if len(toks) < k:
                continue
            lo = int(rng.integers(0, len(toks) - k + 1))
            hi = int(rng.integers(lo + k, len(toks) + 1))
            q_rows["query_id"].append(f"span{j}")
            q_rows["tokens"].append(toks[lo:hi])
        else:
            q_rows["query_id"].append(f"rand{j}")
            q_rows["tokens"].append(
                rng.integers(0, vocab, size=int(rng.integers(1, 30)), dtype=np.int32)
            )
    queries = pa.table(
        {
            "query_id": q_rows["query_id"],
            "tokens": pa.array(q_rows["tokens"], pa.list_(pa.int32())),
        }
    )

    for theta in (100, int(rng.integers(20, 90))):
        hits = query_table(idx, queries, theta=theta)
        got = {
            (hits["query_id"][r].as_py(), hits["source"][r].as_py()):
                hits["wins_found"][r].as_py()
            for r in range(hits.num_rows)
        }
        for row in range(queries.num_rows):
            qid = queries["query_id"][row].as_py()
            toks = np.asarray(queries["tokens"][row].as_py(), dtype=np.int32)
            wins = [toks[i : i + k].tobytes() for i in range(len(toks) - k + 1)]
            if not wins:
                assert all(q != qid for q, _ in got)
                continue
            min_wins = max(1, math.ceil(len(wins) * theta / 100))
            for src, bag in bags.items():
                bag_set = set(bag)
                true_cnt = sum(w in bag_set for w in wins)
                if true_cnt >= min_wins:
                    # Bloom: no false negatives, and reported >= true
                    assert (qid, src) in got, (seed, theta, qid, src)
                    assert got[(qid, src)] >= true_cnt


@pytest.mark.parametrize("seed", [5, 19])
def test_random_corpus_distributed_lane_equals_broadcast(
    ray_session, tmp_path_factory, seed
):
    """All four mask protocols — distributed pair/lane AND broadcast-
    streaming pair/lane — must reproduce the broadcast prober EXACTLY on
    random corpora: random k/h/shards, skewed sources, queries including
    sub-window (nw=0) rows that yield no probeset entries at all."""
    from metaprofi_ray.pipelines.query import (
        query_index_streaming,
        query_index_streaming_distributed,
    )

    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 6))
    cfg = SketchConfig(
        k=k, h=int(rng.integers(1, 4)), m=1 << 15,
        shards=int(rng.choice([1, 2, 4, 8])),
    )
    corpus = _random_corpus(rng, n_docs=120, n_sources=5, k=k, vocab=400)
    idx = str(tmp_path_factory.mktemp(f"lane{seed}") / "idx")
    build_index(rd.from_arrow(corpus), cfg, idx)

    q_rows = {"query_id": [], "tokens": []}
    for j in range(30):
        if j % 2 == 0:
            r = int(rng.integers(0, corpus.num_rows))
            toks = np.asarray(corpus["tokens"][r].as_py(), dtype=np.int32)
            q_rows["query_id"].append(f"span{j}")
            q_rows["tokens"].append(toks)
        else:
            q_rows["query_id"].append(f"rand{j}")
            q_rows["tokens"].append(
                rng.integers(0, 400, size=int(rng.integers(1, 30)),
                             dtype=np.int32)
            )
    queries = pa.table(
        {
            "query_id": q_rows["query_id"],
            "tokens": pa.array(q_rows["tokens"], pa.list_(pa.int32())),
        }
    )
    theta = int(rng.integers(20, 101))
    ref = query_table(idx, queries, theta=theta).to_pandas()
    key = lambda df: sorted(
        map(tuple,
            df[["query_id", "source", "wins_found", "n_wins"]]
            .values.tolist())
    )
    for lane in (False, True):
        got = query_index_streaming_distributed(
            idx, queries, theta=theta, lane_mode=lane
        ).to_pandas()
        assert key(got) == key(ref), (seed, theta, lane)
        got_s = query_index_streaming(
            idx, queries, theta=theta, lane_mode=lane
        ).to_pandas()
        assert key(got_s) == key(ref), (seed, theta, "stream", lane)
