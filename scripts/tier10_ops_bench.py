"""10×-tier operator benchmark (VERDICT r3 #7).

The 1.2M-doc bench tier is startup-flavored (sandbox noise ~2×); this
script times the dedup ladder, the streaming/distributed query paths and
the relational+text operators at 10× their driver-table scale, where
shuffle work dominates:

  - documents ×10 (50k docs, deterministic: rotations of the sf0.1 texts
    with a 5% exact-duplicate injection so the dedup ladder has real work)
  - events ×10 (1M rows, jittered timestamps, same user cardinality so
    per-user session groups grow 10×)
  - the 12M-doc bench corpus index for the query paths (10k broadcast-
    streaming queries + 50k distributed-probe queries)

Prints ONE JSON line; results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
TIER_DIR = "/tmp/metaprofi_tier10_tables"
INDEX_DIR = "/tmp/metaprofi_tier10_idx"
REPL = 10


def synth_tables() -> str:
    """documents.parquet ×REPL and events.parquet ×REPL under TIER_DIR
    (deterministic; reused across runs if present)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(TIER_DIR, exist_ok=True)
    dpath = os.path.join(TIER_DIR, "documents.parquet")
    if not os.path.exists(dpath):
        base = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
        n = base.num_rows
        parts = []
        for r in range(REPL):
            texts = base["text"].to_pylist()
            if r > 0:
                rot = []
                for i, t in enumerate(texts):
                    w = t.split()
                    if i % 20 == 0 or len(w) < 4:
                        rot.append(t)  # 5% stay EXACT duplicates
                    else:
                        k = 1 + (r + i) % max(len(w) - 1, 1)
                        rot.append(" ".join(w[k:] + w[:k]))
                texts = rot
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(
                            (np.arange(n, dtype=np.int64) + r * n)
                        ),
                        "text": pa.array(texts, pa.string()),
                        "lang": base["lang"],
                        "source": base["source"],
                        "n_chars": pa.array(
                            [len(t) for t in texts], pa.int64()
                        ),
                    }
                )
            )
        pq.write_table(pa.concat_tables(parts), dpath)
    empath = os.path.join(TIER_DIR, "embeddings.parquet")
    if not os.path.exists(empath):
        base = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
        n = base.num_rows
        emb = np.stack(
            [np.asarray(e, dtype=np.float32) for e in
             base["embedding"].to_pylist()]
        )
        parts = []
        for r in range(REPL):
            rolled = np.roll(emb, r, axis=1)  # norm-preserving, deterministic
            parts.append(
                pa.table(
                    {
                        "vec_id": pa.array(
                            np.arange(n, dtype=np.int64) + r * n
                        ),
                        "embedding": pa.array(
                            list(rolled), pa.list_(pa.float32())
                        ),
                        "label": base["label"],
                    }
                )
            )
        pq.write_table(pa.concat_tables(parts), empath)
    epath = os.path.join(TIER_DIR, "events.parquet")
    if not os.path.exists(epath):
        base = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
        n = base.num_rows
        parts = []
        ts = base["ts"].cast(pa.int64())
        for r in range(REPL):
            jitter = pa.compute.add(ts, (r * 7_919_000_000))  # ~7.9 s steps
            parts.append(
                pa.table(
                    {
                        "event_id": pa.array(
                            np.arange(n, dtype=np.int64) + r * n
                        ),
                        "ts": jitter.cast(base.schema.field("ts").type),
                        "user_id": base["user_id"],
                        "event_type": base["event_type"],
                        "value": base["value"],
                        "props": base["props"],
                    }
                )
            )
        pq.write_table(pa.concat_tables(parts), epath)
    return TIER_DIR


def _bpe_corpus(
    n_vocab: int = 50_000, n_docs: int = 100_000, words_per_doc: int = 100
) -> str:
    """Deterministic word-diverse corpus for the vocab-training row: 50k
    distinct pseudo-words (3–12 letters), quadratically skewed (Zipf-ish)
    draws, ~10M running words over 100k docs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = "/tmp/metaprofi_bpe_corpus"
    path = os.path.join(out, "documents.parquet")
    if os.path.exists(path):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(23)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 13, size=n_vocab)
    flat = rng.integers(0, 26, size=int(lens.sum()))
    vocab, pos = [], 0
    for L in lens:
        vocab.append("".join(letters[flat[pos : pos + L]]))
        pos += L
    vocab = np.array(vocab)
    u = rng.random(size=(n_docs, words_per_doc))
    idx = (u * u * n_vocab).astype(np.int64)  # quadratic skew toward 0
    texts = [" ".join(row) for row in vocab[idx]]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(["bpe"] * n_docs, pa.string()),
            }
        ),
        path,
    )
    return out


def main() -> None:
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    tier = synth_tables()
    out: dict = {"metric": "tier10_ops", "unit": "sec", "repl": REPL}

    from metaprofi_ray.pipelines import dedup, relational, textstats

    def timed(name, fn, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            res = fn(tier)
            if hasattr(res, "count"):
                res.count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)

    timed("exact_dedup", dedup.exact_dedup)
    timed("dedup_stats", dedup.dedup_stats)
    timed("minhash_lsh_pairs", dedup.minhash_lsh_pairs_ds)
    timed("simhash_pairs", dedup.simhash_pairs_ds)
    timed("events_hourly", relational.events_hourly)
    timed("events_sessionize", relational.events_sessionize)
    timed("token_counts_bpe", textstats.token_counts_bpe)
    timed("quality_scores", textstats.quality_scores)
    timed("contamination_check", textstats.contamination_check)

    from metaprofi_ray.pipelines import ann, ann_ivf

    timed("ann_lsh_topk", lambda d: ann.lsh_topk(d, query_vec_id=3))
    timed("ann_ivf_topk_batch", lambda d: ann_ivf.ivf_topk_batch(d))

    # production-vocab BPE: 1000 merges in batched disjoint rounds (one
    # distributed pass per ROUND, not per merge).  The driver documents
    # table has a CLOSED 31-word vocabulary (all learnable merges exhaust
    # at 113), so this row runs over a word-diverse Zipf corpus — 50k
    # distinct pseudo-words, ~10M running words — the shape a vocab
    # trainer actually faces
    from metaprofi_ray.pipelines import bpe

    bpe_dir = _bpe_corpus()
    t0 = time.perf_counter()
    merges = bpe.bpe_train(bpe_dir, n_merges=1000, batch=256, min_freq=2)
    out["bpe_1000_merges_sec"] = round(time.perf_counter() - t0, 3)
    out["bpe_1000_merges_learned"] = merges.num_rows

    # ---- query paths against the 12M-doc (10×) index -------------------
    from metaprofi_ray.config import SketchConfig
    from metaprofi_ray.pipelines import query as query_pipe
    from metaprofi_ray.pipelines.build import build_from_parquet
    from metaprofi_ray.sources.synth_fast import generate_corpus_fast

    n_docs = int(os.environ.get("GRAFT_BENCH_DOCS", "12000000"))
    corpus = generate_corpus_fast(
        f"/tmp/metaprofi_bench_corpus_sf1.0_{n_docs}",
        n_docs=n_docs, files_per_source=2, max_docs_per_file=150_000,
    )
    cfg = SketchConfig(k=8, h=2, m=1 << 24, shards=8, hll_p=14)
    if not os.path.exists(os.path.join(INDEX_DIR, "manifest.json")):
        shutil.rmtree(INDEX_DIR, ignore_errors=True)
        t0 = time.perf_counter()
        build_from_parquet(corpus, cfg, INDEX_DIR)
        out["build_12m_sec"] = round(time.perf_counter() - t0, 3)
        out["build_12m_seq_per_sec"] = round(
            n_docs / out["build_12m_sec"], 1
        )

    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(7)

    def qset(n):
        return pa.table(
            {
                "query_id": [f"q{i}" for i in range(n)],
                "tokens": pa.array(
                    list(rng.integers(0, 1 << 20, size=(n, 40),
                                      dtype=np.int32)),
                    type=pa.list_(pa.int32()),
                ),
            }
        )

    # warm 2k broadcast query: first call loads the index (cold), second
    # measures the warm path the QueryService regime runs in
    import ray.data as rd

    q2k = qset(2_000)
    t0 = time.perf_counter()
    query_pipe.query_index(INDEX_DIR, rd.from_arrow(q2k), theta=75).count()
    out["bloom_query_2k_cold_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    query_pipe.query_index(INDEX_DIR, rd.from_arrow(q2k), theta=75).count()
    out["bloom_query_2k_warm_sec"] = round(time.perf_counter() - t0, 3)

    q10k = qset(10_000)
    t0 = time.perf_counter()
    query_pipe.query_index_streaming(INDEX_DIR, q10k, theta=75).count()
    out["stream_10k_sec"] = round(time.perf_counter() - t0, 3)
    q50k = qset(50_000)
    t0 = time.perf_counter()
    query_pipe.query_index_streaming_distributed(
        INDEX_DIR, q50k, theta=75
    ).count()
    out["dist_50k_sec"] = round(time.perf_counter() - t0, 3)
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
