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


def bloom_selfhit_check(sf_dir: str, n_queries: int = 40) -> pd.DataFrame:
    """Zero-false-negative oracle face of the query path (A4): the first
    ``n_queries`` docs BY doc_id with ≥ k+4 tokens become 16-token
    self-queries; the Bloom property guarantees the owning source hits at
    theta=100 with EVERY window found — no hash luck involved.  Rows
    (query_id, owner, n_wins) are fully SQL-reproducible
    (n_wins = min(n_words, 16) − k + 1); ``self_hit`` / ``full_fraction``
    are pinned TRUE by the DuckDB oracle — a lost bank bit or a broken
    probe flips them and fails the hash match."""
    index_dir = build_index_for(sf_dir)
    cfg = DEFAULT_CFG
    sel = (
        tokens_dataset(sf_dir)
        .map_batches(
            lambda t: t.filter(pa.compute.greater_equal(t["n_tok"], cfg.k + 4)),
            batch_format="pyarrow",
        )
        .sort("doc_id")
        .limit(n_queries)
        .to_pandas()
    )
    queries = pa.table(
        {
            "query_id": [
                f"{d}|{s}" for d, s in zip(sel["doc_id"], sel["source"])
            ],
            "tokens": pa.array(
                [np.asarray(t, dtype=np.int32)[: cfg.k + 8] for t in sel["tokens"]],
                type=pa.list_(pa.int32()),
            ),
        }
    )
    hits = query_pipe.query_table(index_dir, queries, theta=100).to_pandas()
    hmap = {
        (q, s): (int(wf), int(nw))
        for q, s, wf, nw in zip(
            hits["query_id"], hits["source"], hits["wins_found"], hits["n_wins"]
        )
    }
    qids = [f"{d}|{s}" for d, s in zip(sel["doc_id"], sel["source"])]
    exp_wins = (
        np.minimum(sel["n_tok"].to_numpy(), cfg.k + 8) - cfg.k + 1
    ).astype(np.int64)
    self_hit, full = [], []
    for qid, owner, nw in zip(qids, sel["source"], exp_wins):
        wf, nw_probe = hmap.get((qid, owner), (0, -1))
        self_hit.append(bool(wf == int(nw) and nw_probe == int(nw)))
        full.append(bool(wf == nw_probe and wf > 0))
    return (
        pd.DataFrame(
            {
                "query_id": qids,
                "owner": sel["source"].to_numpy(),
                "n_wins": exp_wins,
                "self_hit": self_hit,
                "full_fraction": full,
            }
        )
        .sort_values("query_id")
        .reset_index(drop=True)
    )


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


def exact_distinct_windows(sf_dir: str, cfg: SketchConfig = DEFAULT_CFG) -> pd.DataFrame:
    """EXACT distinct-window-hash count per source, computed distributed:
    per-batch unique (source, h1) pairs → groupby(source, h) dedupe →
    groupby(source) count.  Shuffle volume is O(distinct windows), the
    two-level groupby pattern that stays flat at corpus scale."""
    import pyarrow.compute as pc

    from ..functions.tokenize import batch_windows
    from ..sketches import hashing

    def win_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_tok"], cfg.k))
        if t.num_rows == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "h": pa.array([], pa.int64())}
            )
        values, starts, row_of = batch_windows(t, cfg.k)
        h1 = hashing.hash_windows(values, starts, cfg.k, hashing.SEED_H1)
        src_dict = pc.dictionary_encode(t.column("source")).combine_chunks()
        codes = src_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        win_src = codes[row_of]
        # batch-local dedupe (the combiner): one row per distinct (src, h)
        key = np.stack([win_src, h1.view(np.int64)], axis=1)
        uniq = np.unique(key, axis=0)
        names = np.asarray(src_dict.dictionary.to_pylist(), dtype=object)
        return pa.table(
            {
                "source": pa.array(names[uniq[:, 0]], pa.string()),
                "h": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    pairs = tokens_dataset(sf_dir).map_batches(win_pairs, batch_format="pyarrow")
    from ..functions.hashagg import (
        hash_partition_exec,
        hash_path_pays,
        partitions_for,
    )

    raw = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    if hash_path_pays(raw, threshold=50_000):
        # distinct-window cardinality ≈ docs × windows/doc — the LARGEST
        # key space in the engine, where the native sort aggregate's
        # per-group Python loop melts (functions/hashagg.py).  Key by h
        # alone: all duplicates of any (source, h) share its h, so the
        # per-block Arrow dedupe + per-source count is exact; the final
        # per-source sum is a tiny native aggregate.
        def distinct_then_count(t: pa.Table) -> pa.Table:
            per = t.group_by(["source", "h"]).aggregate([])
            agg = per.group_by("source").aggregate([([], "count_all")])
            return pa.table({"source": agg["source"], "n": agg["count_all"]})

        # window-pair rows ≈ docs × windows/doc (~16) × ~40 B/row
        partials = hash_partition_exec(
            pairs, ["h"], distinct_then_count,
            min_partitions=partitions_for(raw.count(), 640),
        )
        counts = (
            partials.groupby("source")
            .sum("n")
            .to_pandas()
            .rename(columns={"sum(n)": "exact_distinct"})
        )
    else:
        distinct = pairs.groupby(["source", "h"]).count()
        counts = (
            distinct.map_batches(
                lambda t: pa.table({"source": t["source"]}), batch_format="pyarrow"
            )
            .groupby("source")
            .count()
            .to_pandas()
            .rename(columns={"count()": "exact_distinct"})
        )
    counts["exact_distinct"] = counts["exact_distinct"].astype("int64")
    return counts.sort_values("source").reset_index(drop=True)


def hll_error_check(sf_dir: str) -> pd.DataFrame:
    """Bounds-checked oracle face of the HLL (north_rule "estimates within
    the published error bound"): per source, is the HLL estimate within
    3·1.04/√(2^p) relative error of the EXACT distinct-window count
    (computed distributed by ``exact_distinct_windows``)?  The SQL oracle
    pins the source list and asserts TRUE — a failure here means the sketch
    broke its bound, not a flaky tolerance."""
    cfg = DEFAULT_CFG
    stats = _stats_rows(sf_dir)
    exact = exact_distinct_windows(sf_dir, cfg).set_index("source")[
        "exact_distinct"
    ]
    rel_tol = 3 * 1.04 / np.sqrt(2.0**cfg.hll_p)
    rows = {"source": [], "within_bound": []}
    for _, r in stats.iterrows():
        est = hll_mod.estimate(hll_mod.from_bytes(r["hll"]))
        ex = float(exact.get(r["source"], 0))
        rows["source"].append(r["source"])
        rows["within_bound"].append(bool(abs(est - ex) <= rel_tol * max(ex, 1)))
    return (
        pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
    )


def cms_error_check(
    sf_dir: str, tokens: tuple[str, ...] = ("the", "and", "data")
) -> pd.DataFrame:
    """Bounds-checked oracle face of the CMS: for chosen words per source,
    (a) ``exact_n`` — the exact word-occurrence count, computed distributed
    AND by the SQL oracle (full value check), (b) ``ge_exact`` — the CMS
    never under-counts (deterministic guarantee), (c) ``within_eps`` — the
    estimate is ≤ exact-token-id-count + ε·N with ε = e/cms_w (the
    published CMS bound, checked against the id-level count the sketch
    actually saw — hash collisions word→id make it ≥ ``exact_n``)."""
    import pyarrow.compute as pc

    from ..functions.wordids import split_words

    cfg = DEFAULT_CFG
    stats = _stats_rows(sf_dir)
    tok_ids = {w: stable_hash(w) % VOCAB for w in tokens}
    probe = np.array([tok_ids[w] for w in tokens], dtype=np.int32)

    # distributed exact counts: word occurrences AND token-id occurrences
    tok_arr = pa.array(list(tokens))
    id_arr = np.array(sorted(set(tok_ids.values())), dtype=np.int64)

    def count_words(t: pa.Table) -> pa.Table:
        flat, row_of, n = split_words(t.column("text"))
        src_dict = pc.dictionary_encode(t.column("source")).combine_chunks()
        codes = src_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = src_dict.dictionary.to_pylist()
        hit = pc.is_in(flat, value_set=tok_arr).to_numpy(zero_copy_only=False)
        # mirror the build's n_tok >= k doc filter (the CMS never saw
        # shorter docs; the SQL oracle applies the same predicate)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_words = np.bincount(row_of[nonempty], minlength=n)
        hit &= n_words[row_of] >= cfg.k
        words = np.asarray(flat.to_pandas(), dtype=object)
        out = {"source": [], "token": [], "n": []}
        for s_code, s_name in enumerate(names):
            sel = hit & (codes[row_of] == s_code)
            w_sel, cnts = np.unique(words[sel], return_counts=True)
            for w, c in zip(w_sel, cnts):
                out["source"].append(s_name)
                out["token"].append(str(w))
                out["n"].append(int(c))
        return pa.table(
            {
                "source": pa.array(out["source"], pa.string()),
                "token": pa.array(out["token"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
            }
        )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text", "source"]
    )
    from ray.data.aggregate import Sum

    word_counts = (
        docs.map_batches(count_words, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    wc = {
        (r["source"], r["token"]): int(r["n"]) for _, r in word_counts.iterrows()
    }

    # token-ID occurrence counts per source (what the CMS actually ingested)
    def count_ids(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_tok"], cfg.k))  # build parity
        out = {"source": [], "tok_id": [], "n": []}
        src_dict = pc.dictionary_encode(t.column("source")).combine_chunks()
        codes = src_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = src_dict.dictionary.to_pylist()
        toks = t.column("tokens")
        flat = toks.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        tok_src = np.repeat(codes, lens)
        for s_code, s_name in enumerate(names):
            sub = flat[tok_src == s_code]
            for tid in id_arr:
                out["source"].append(s_name)
                out["tok_id"].append(int(tid))
                out["n"].append(int((sub == tid).sum()))
        return pa.table(
            {
                "source": pa.array(out["source"], pa.string()),
                "tok_id": pa.array(out["tok_id"], pa.int64()),
                "n": pa.array(out["n"], pa.int64()),
            }
        )

    id_counts = (
        tokens_dataset(sf_dir)
        .map_batches(count_ids, batch_format="pyarrow")
        .groupby(["source", "tok_id"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    ic = {
        (r["source"], int(r["tok_id"])): int(r["n"])
        for _, r in id_counts.iterrows()
    }

    eps = np.e / cfg.cms_w
    rows = {
        "source": [], "token": [], "exact_n": [],
        "ge_exact": [], "within_eps": [],
    }
    for _, r in stats.iterrows():
        table = cms_mod.from_bytes(r["cms"], cfg.cms_d, cfg.cms_w)
        est = cms_mod.query(table, probe)
        n_tokens = int(r["n_tokens"])
        for w, e in zip(tokens, est):
            exact_w = wc.get((r["source"], w), 0)
            exact_id = ic.get((r["source"], tok_ids[w]), 0)
            rows["source"].append(r["source"])
            rows["token"].append(w)
            rows["exact_n"].append(exact_w)
            rows["ge_exact"].append(bool(int(e) >= exact_w))
            rows["within_eps"].append(
                bool(int(e) <= exact_id + eps * n_tokens)
            )
    return (
        pd.DataFrame(rows)
        .astype({"exact_n": "int64"})
        .sort_values(["source", "token"])
        .reset_index(drop=True)
    )


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


def fpr_bound_check(sf_dir: str, n_probes: int = 3000) -> pd.DataFrame:
    """Driver-checked face of the north-star FPR criterion ("query FPR held
    within the configured Bloom bound"): per source, measured FPR on
    provably-negative probes (token ids outside the tokenizer vocab) must
    not exceed the analytic bound plus 3 binomial standard errors (the
    sampling noise of n_probes trials).  The SQL oracle pins the source
    list and asserts TRUE."""
    rep = bloom_fpr_report(sf_dir, n_probes)
    bound = rep["fpr_bound"].to_numpy(dtype=np.float64)
    measured = rep["measured_fpr"].to_numpy(dtype=np.float64)
    margin = 3 * np.sqrt(bound * (1 - bound) / n_probes) + 2.0 / n_probes
    return pd.DataFrame(
        {
            "source": rep["source"],
            "fpr_ok": (measured <= bound + margin),
        }
    ).sort_values("source").reset_index(drop=True)


def quantile_error_check(
    sf_dir: str, qs: tuple[float, ...] = (0.1, 0.5, 0.9)
) -> pd.DataFrame:
    """Bounds-checked oracle face of the quantile sketches: per (source, q),
    (a) ``exact_q`` — the exact q-quantile of the per-source doc-length
    distribution (value at rank ceil(q·n)), computed distributed from a
    (source, n_tok) histogram groupby AND by the SQL oracle (full value
    check); (b) rank-error booleans for KLL (published ~1.65% normalized
    rank error at k=200; checked at 2%) and t-digest (checked at a
    conservative 5%).  A FALSE here means a sketch broke its bound."""
    import pyarrow.compute as pc

    from ..sketches.kll import KLL
    from ..sketches.tdigest import TDigest

    cfg = DEFAULT_CFG
    stats = _stats_rows(sf_dir)
    # distributed exact histogram: (source, n_tok) value counts — the
    # scale-safe exact-quantile path (doc lengths have bounded cardinality)
    hist = (
        tokens_dataset(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["n_tok"], cfg.k)).select(
                ["source", "n_tok"]
            ),
            batch_format="pyarrow",
        )
        .groupby(["source", "n_tok"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "cnt"})
    )
    rows = {
        "source": [], "q": [], "exact_q": [],
        "kll_rank_ok": [], "tdigest_rank_ok": [],
    }
    KLL_EPS, TD_EPS = 0.02, 0.05
    for _, r in stats.iterrows():
        h = hist[hist["source"] == r["source"]].sort_values("n_tok")
        vals = h["n_tok"].to_numpy(dtype=np.int64)
        cnts = h["cnt"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1]) if len(cum) else 0
        td = TDigest.from_bytes(r["tdigest"])
        kl = KLL.from_bytes(r["kll"])
        for q in qs:
            rank = max(1, int(np.ceil(q * n)))
            exact = int(vals[np.searchsorted(cum, rank)]) if n else 0
            rows["source"].append(r["source"])
            rows["q"].append(q)
            rows["exact_q"].append(exact)
            for name, est, eps in (
                ("kll_rank_ok", kl.quantile(q), KLL_EPS),
                ("tdigest_rank_ok", td.quantile(q), TD_EPS),
            ):
                # tie-aware rank check: a returned value v occupies the whole
                # rank interval [#(x < v), #(x <= v)]; the sketch satisfies
                # its bound iff that interval intersects [qn - εn, qn + εn]
                if n == 0:
                    rows[name].append(True)
                    continue
                lo_idx = np.searchsorted(vals, est, side="left")
                hi_idx = np.searchsorted(vals, est, side="right")
                rank_lo = int(cum[lo_idx - 1]) if lo_idx > 0 else 0
                rank_hi = int(cum[hi_idx - 1]) if hi_idx > 0 else 0
                ok = not (
                    rank_hi < q * n - eps * n - 1
                    or rank_lo > q * n + eps * n + 1
                )
                rows[name].append(bool(ok))
    return (
        pd.DataFrame(rows)
        .astype({"exact_q": "int64"})
        .sort_values(["source", "q"])
        .reset_index(drop=True)
    )


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
