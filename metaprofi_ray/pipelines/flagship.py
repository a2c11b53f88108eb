"""Flagship sketch pipelines over the driver's sf tables.

The driver's testdata has no pre-tokenized table, so ``tokens_dataset``
derives one DETERMINISTICALLY from ``documents.parquet`` (token id =
blake2b(word) % vocab over whitespace words) as a streaming map_batches
stage — giving the sketch engine a real corpus at every sf, with counts
that a SQL oracle can reproduce (word counting is SQL-expressible even
though hashing is not).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..config import SketchConfig
from ..sketches import cms as cms_mod
from ..sketches import hll as hll_mod
from ..sketches.kll import KLL
from ..sketches.tdigest import TDigest
from ..sources.synth import VOCAB, stable_hash
from ..stages.bloom_build import STATS_SHARD
from . import build as build_pipe
from . import query as query_pipe

DEFAULT_CFG = SketchConfig(k=8, h=2, m=1 << 18, shards=4, hll_p=12)


class Tokenizer:
    """documents rows → tokens rows, fully vectorized: one Arrow
    whitespace-split over the batch, one dictionary-encode to unique words,
    hashing only the batch's unique words.  The per-word hash memo is actor
    state (built up across batches) so a word hashes once per actor."""

    def __init__(self, vocab: int = VOCAB):
        self.vocab = vocab
        self.memo: dict[str, int] = {}

    def _hash_word(self, w: str) -> int:
        return stable_hash(w) % self.vocab

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import wordids

        flat, row_of, n = wordids.split_words(batch.column("text"))
        ids, _, lens = wordids.intern_ids(
            flat, row_of, n, self._hash_word, memo=self.memo, dtype=np.int32
        )
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(ids, pa.int32())
        )
        doc_nums = batch.column("doc_id").to_numpy(zero_copy_only=False)
        labels = np.char.add(
            "doc", np.char.zfill(doc_nums.astype(np.int64).astype("U"), 8)
        )
        return pa.table(
            {
                "doc_id": pa.array(labels),
                "tokens": tokens,
                "n_tok": pa.array(lens.astype(np.int32), type=pa.int32()),
                "source": batch.column("source"),
            }
        )


def tokens_dataset(sf_dir: str) -> rd.Dataset:
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return docs.map_batches(Tokenizer, batch_format="pyarrow", concurrency=(1, 8))


def build_index_for(sf_dir: str, cfg: SketchConfig = DEFAULT_CFG) -> str:
    """Build (or reuse the cached) index for an sf dir.

    Cache key = hash of (absolute source path, source file size+mtime,
    frozen config incl. format version) — a different corpus at the same
    basename, an in-place regeneration, or a format change can never
    resurrect a stale index.  The build goes to a private tmp dir and is
    published with an atomic ``os.rename``, so concurrent builders cannot
    corrupt each other: exactly one rename wins, losers discard."""
    import hashlib
    import shutil

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key_material = (
        f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}|{cfg.to_json()}"
    )
    key = hashlib.blake2b(key_material.encode(), digest_size=8).hexdigest()
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    index_dir = os.path.join(
        tempfile.gettempdir(), f"metaprofi_ray_index_{tag}_{key}"
    )
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        tmp = f"{index_dir}.building.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build_pipe.build_index(tokens_dataset(sf_dir), cfg, tmp)
        try:
            os.rename(tmp, index_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # a concurrent builder won
    return index_dir


def bloom_build_sources(sf_dir: str) -> pd.DataFrame:
    """Per-source EXACT build counters from the sketch index (n_docs rows
    surviving the n_tok >= k filter, window count, token count) — the
    SQL-checkable face of the Bloom build (A1/A8)."""
    index_dir = build_index_for(sf_dir)
    import pyarrow.parquet as pq

    s = pq.read_table(
        os.path.join(index_dir, "sources.parquet"),
        columns=["source", "n_docs", "n_wins", "n_tokens"],
    ).to_pandas()
    return s.sort_values("source").reset_index(drop=True)


def bloom_query_self(sf_dir: str, theta: int = 100, n_queries: int = 40) -> pd.DataFrame:
    """Self-containment check: windows copied from the corpus itself must
    hit their owning source (zero false negatives — Bloom property)."""
    index_dir = build_index_for(sf_dir)
    cfg = DEFAULT_CFG
    docs = (
        tokens_dataset(sf_dir)
        .map_batches(
            lambda t: t.filter(pa.compute.greater_equal(t["n_tok"], cfg.k + 4)),
            batch_format="pyarrow",
        )
        .limit(n_queries)
        .to_pandas()
    )
    queries = pa.table(
        {
            "query_id": [
                f"{d}|{s}" for d, s in zip(docs["doc_id"], docs["source"])
            ],
            "tokens": pa.array(
                [np.asarray(t, dtype=np.int32)[: cfg.k + 8] for t in docs["tokens"]],
                type=pa.list_(pa.int32()),
            ),
        }
    )
    hits = query_pipe.query_table(index_dir, queries, theta=theta).to_pandas()
    hits["owner"] = hits["query_id"].str.split("|").str[1]
    hits["self_hit"] = hits["owner"] == hits["source"]
    return hits.sort_values(["query_id", "source"]).reset_index(drop=True)


def _stats_rows(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    index_dir = build_index_for(sf_dir)
    # row-group filter + column pruning: the Bloom bits never reach the
    # driver, only the small per-source stats rows do
    stats = pq.read_table(
        os.path.join(index_dir, "banks"),
        columns=["source", "shard_id", "n_docs", "n_wins", "n_tokens",
                 "hll", "cms", "tdigest", "kll"],
        filters=[("shard_id", "=", STATS_SHARD)],
    )
    return stats.to_pandas().sort_values("source").reset_index(drop=True)


def hll_distinct_per_source(sf_dir: str) -> pd.DataFrame:
    """(source, hll_distinct_windows, fpr_bound) — HLL estimates feeding the
    FPR accounting (SURVEY.md §7.3)."""
    cfg = DEFAULT_CFG
    stats = _stats_rows(sf_dir)
    ests = [
        hll_mod.estimate(hll_mod.from_bytes(b)) for b in stats["hll"]
    ]
    return pd.DataFrame(
        {
            "source": stats["source"],
            "hll_distinct": np.round(ests, 1),
            "fpr_bound": [round(cfg.fpr_bound(int(e)), 6) for e in ests],
        }
    )


def cms_token_estimates(sf_dir: str, tokens: tuple[str, ...] = ("the", "and", "data")) -> pd.DataFrame:
    """CMS point estimates for chosen words per source (over-estimate
    guaranteed; compared to exact counts in tests, rows-only for driver)."""
    cfg = DEFAULT_CFG
    stats = _stats_rows(sf_dir)
    probe = np.array([stable_hash(w) % VOCAB for w in tokens], dtype=np.int32)
    rows = {"source": [], "token": [], "cms_estimate": []}
    for _, r in stats.iterrows():
        table = cms_mod.from_bytes(r["cms"], cfg.cms_d, cfg.cms_w)
        est = cms_mod.query(table, probe)
        for w, e in zip(tokens, est):
            rows["source"].append(r["source"])
            rows["token"].append(w)
            rows["cms_estimate"].append(int(e))
    return pd.DataFrame(rows)


def bloom_fpr_report(sf_dir: str, n_probes: int = 3000) -> pd.DataFrame:
    """FPR accounting (SURVEY.md §7.3 / north_star): per source, the
    HLL-estimated distinct-shingle count, the analytic bound
    ``(1-e^{-h·n/m})^h`` with that ``n``, and the MEASURED false-positive
    rate on deterministic negative probes (token ids outside the
    tokenizer's vocab, so provably absent from the corpus)."""
    cfg = DEFAULT_CFG
    index_dir = build_index_for(sf_dir)
    stats = _stats_rows(sf_dir)
    rng = np.random.default_rng(4242)
    probes = pa.table(
        {
            "query_id": [f"fp{i}" for i in range(n_probes)],
            "tokens": pa.array(
                [
                    rng.integers(VOCAB * 2, VOCAB * 3, size=cfg.k, dtype=np.int32)
                    for _ in range(n_probes)
                ],
                type=pa.list_(pa.int32()),
            ),
        }
    )
    hits = query_pipe.query_table(index_dir, probes, theta=100).to_pandas()
    fp_per_source = hits.groupby("source").size()
    rows = {"source": [], "hll_distinct": [], "fpr_bound": [], "measured_fpr": []}
    for _, r in stats.iterrows():
        est = hll_mod.estimate(hll_mod.from_bytes(r["hll"]))
        rows["source"].append(r["source"])
        rows["hll_distinct"].append(round(est, 1))
        rows["fpr_bound"].append(round(cfg.fpr_bound(int(est)), 6))
        rows["measured_fpr"].append(
            round(float(fp_per_source.get(r["source"], 0)) / n_probes, 6)
        )
    return pd.DataFrame(rows)


def doclen_quantiles(sf_dir: str) -> pd.DataFrame:
    """t-digest + KLL quantiles of the per-source document-length (n_tok)
    distribution, from the merged index stats rows."""
    stats = _stats_rows(sf_dir)
    rows = {"source": [], "q": [], "tdigest_est": [], "kll_est": []}
    for _, r in stats.iterrows():
        td = TDigest.from_bytes(r["tdigest"])
        kl = KLL.from_bytes(r["kll"])
        for q in (0.1, 0.5, 0.9):
            rows["source"].append(r["source"])
            rows["q"].append(q)
            rows["tdigest_est"].append(round(td.quantile(q), 2))
            rows["kll_est"].append(round(kl.quantile(q), 2))
    return pd.DataFrame(rows)
