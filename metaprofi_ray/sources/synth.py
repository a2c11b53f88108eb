"""Deterministic synthetic corpora (FIXTURES.md §1–§2).

Two generators:

* ``generate_corpus`` — the engine's own test/bench corpus of pre-tokenized
  sequences ``(doc_id, tokens, n_tok, source)`` with Zipf-skewed sources,
  planted motif windows (ground-truth positives) and short edge rows.  All
  randomness derives from ``base_seed ^ stable_hash(doc_id)`` so any subset /
  ordering / parallelism produces identical rows (SURVEY.md §7.3 "no
  nondeterminism in fixtures").

* ``tokens_from_documents`` — derives the same-shaped table deterministically
  from a driver testdata ``documents.parquet`` (doc_id, text, source) by
  whitespace-splitting and hashing words to int32 ids; used so the driver's
  sf directories can feed the sketch pipelines without external data.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_SEED = 42
VOCAB = 50_000
MOTIF_SEED = 12_345
N_MOTIFS = 32

TOKENS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def stable_hash(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def motif_table(k: int, vocab: int = VOCAB) -> np.ndarray:
    """The fixed (N_MOTIFS, k) planted-motif windows (FIXTURES.md §1)."""
    rng = np.random.default_rng(MOTIF_SEED)
    return rng.integers(0, vocab, size=(N_MOTIFS, k), dtype=np.int32)


def _doc_tokens(doc_id: str, doc_idx: int, k: int, motifs: np.ndarray,
                vocab: int, base_seed: int) -> np.ndarray:
    rng = np.random.default_rng((base_seed ^ stable_hash(doc_id)) & (2**63 - 1))
    # edge rows: ~4% shorter than k (filtered downstream), ~2% exactly k
    r = rng.random()
    if r < 0.04:
        n = int(rng.integers(1, k))
    elif r < 0.06:
        n = k
    else:
        n = int(rng.integers(5, 201))
    toks = rng.integers(0, vocab, size=n, dtype=np.int32)
    # plant a motif into every 5th doc (ground-truth positives)
    if n >= k and doc_idx % 5 == 0:
        m = motifs[doc_idx % N_MOTIFS]
        pos = int(rng.integers(0, n - k + 1))
        toks[pos : pos + k] = m
    return toks


def source_doc_counts(n_sources: int, docs_total: int) -> list[int]:
    """Zipf-like skew: the hot source holds ~40% of rows (FIXTURES.md §1)."""
    if n_sources == 1:
        return [docs_total]
    weights = np.array([0.40] + [0.60 / (n_sources - 1)] * (n_sources - 1))
    # tilt the tail slightly so sources differ
    tail = np.linspace(1.5, 0.5, n_sources - 1)
    weights[1:] = 0.60 * tail / tail.sum()
    counts = np.maximum((weights * docs_total).astype(int), 1)
    counts[0] += docs_total - counts.sum()
    return counts.tolist()


def generate_corpus(
    out_dir: str,
    n_sources: int = 8,
    docs_total: int = 1000,
    k: int = 8,
    vocab: int = VOCAB,
    base_seed: int = BASE_SEED,
    n_files: int = 4,
) -> str:
    """Write the deterministic corpus as ``n_files`` Parquet files; returns
    out_dir.  Multi-file so ``read_parquet`` parallelizes and the
    checkpointed build has natural input partitions."""
    os.makedirs(out_dir, exist_ok=True)
    motifs = motif_table(k, vocab)
    counts = source_doc_counts(n_sources, docs_total)
    rows_doc_id: list[str] = []
    rows_source: list[str] = []
    rows_tokens: list[np.ndarray] = []
    doc_idx = 0
    for s, cnt in enumerate(counts):
        src = f"src{s:02d}"
        for j in range(cnt):
            doc_id = f"{src}-doc{j:07d}"
            rows_doc_id.append(doc_id)
            rows_source.append(src)
            rows_tokens.append(
                _doc_tokens(doc_id, doc_idx, k, motifs, vocab, base_seed)
            )
            doc_idx += 1
    n = len(rows_doc_id)
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    for f in range(n_files):
        lo, hi = int(bounds[f]), int(bounds[f + 1])
        tbl = pa.table(
            {
                "doc_id": rows_doc_id[lo:hi],
                "tokens": pa.array(rows_tokens[lo:hi], type=pa.list_(pa.int32())),
                "n_tok": pa.array(
                    [len(t) for t in rows_tokens[lo:hi]], type=pa.int32()
                ),
                "source": rows_source[lo:hi],
            },
            schema=TOKENS_SCHEMA,
        )
        pq.write_table(tbl, os.path.join(out_dir, f"part-{f:05d}.parquet"))
    return out_dir


def make_queries(
    corpus_dir: str, k: int, n_exact: int = 30, n_negative: int = 50,
    theta_partials: tuple[int, ...] = (25, 50, 75), base_seed: int = BASE_SEED,
) -> pa.Table:
    """Deterministic query table (query_id, tokens) per FIXTURES.md §2:
    exact positives (windows copied from corpus docs), theta-partials
    (p% motif windows + (100-p)% fresh-random windows), and negatives
    (token values outside the corpus vocab range, guaranteed absent)."""
    corpus = pq.read_table(corpus_dir, columns=["doc_id", "tokens", "n_tok"])
    rng = np.random.default_rng(base_seed + 777)
    motifs = motif_table(k)
    q_ids: list[str] = []
    q_toks: list[np.ndarray] = []
    # exact positives: contiguous slices of real docs (>= k long)
    docs = corpus.filter(pa.compute.greater_equal(corpus["n_tok"], k + 4))
    pick = rng.integers(0, docs.num_rows, size=n_exact)
    for i, di in enumerate(pick):
        toks = np.asarray(docs["tokens"][int(di)].as_py(), dtype=np.int32)
        span = int(rng.integers(k, min(len(toks), k + 20) + 1))
        lo = int(rng.integers(0, len(toks) - span + 1))
        q_ids.append(f"exact-{i:04d}|{docs['doc_id'][int(di)].as_py()}")
        q_toks.append(toks[lo : lo + span])
    # theta partials: a CONTIGUOUS span copied from a corpus doc (all of its
    # sliding windows exist in that doc) followed by a random tail, sized so
    # the matching-window fraction lands near p%.  (Disjoint planted windows
    # cannot exceed ~1/k matching fraction under stride-1 counting — only
    # contiguous substrings give controllable theta.)
    theta_docs = corpus.filter(pa.compute.greater_equal(corpus["n_tok"], 64))
    for p in theta_partials:
        for j in range(6):
            toks = np.asarray(
                theta_docs["tokens"][(j * 11) % theta_docs.num_rows].as_py(),
                dtype=np.int32,
            )
            span = 40  # matching windows = span - k + 1
            seq_part = toks[:span]
            # choose tail length t so (span-k+1)/(span+t-k+1) ~= p/100
            match_w = span - k + 1
            total_w = max(match_w, round(match_w * 100 / p))
            t = total_w - match_w
            tail = rng.integers(VOCAB * 2, VOCAB * 3, size=t, dtype=np.int32)
            q_ids.append(f"theta{p:03d}-{j:02d}")
            q_toks.append(np.concatenate([seq_part, tail]).astype(np.int32))
    # negatives: token ids outside corpus vocab -> brute-force absent
    for i in range(n_negative):
        n = int(rng.integers(k, 3 * k))
        q_ids.append(f"neg-{i:04d}")
        q_toks.append(rng.integers(VOCAB * 2, VOCAB * 3, size=n, dtype=np.int32))
    return pa.table(
        {
            "query_id": q_ids,
            "tokens": pa.array(q_toks, type=pa.list_(pa.int32())),
        }
    )


def tokens_from_documents(documents_path: str, vocab: int = VOCAB) -> pa.Table:
    """Deterministically derive the tokens table from a driver
    ``documents.parquet`` (doc_id:int64, text, source): token id =
    blake2b(word) % vocab over whitespace-split words."""
    docs = pq.read_table(documents_path, columns=["doc_id", "text", "source"])
    texts = docs["text"].to_pylist()
    word_ids: dict[str, int] = {}
    tok_lists: list[np.ndarray] = []
    for t in texts:
        words = t.split()
        ids = np.empty(len(words), dtype=np.int32)
        for i, w in enumerate(words):
            v = word_ids.get(w)
            if v is None:
                v = stable_hash(w) % vocab
                word_ids[w] = v
            ids[i] = v
        tok_lists.append(ids)
    return pa.table(
        {
            "doc_id": [f"doc{int(d):08d}" for d in docs["doc_id"].to_pylist()],
            "tokens": pa.array(tok_lists, type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in tok_lists], type=pa.int32()),
            "source": docs["source"],
        },
        schema=TOKENS_SCHEMA,
    )
