"""Distributed BPE vocabulary training over the documents table.

The counting face (`textstats.token_counts_bpe`) tokenizes with a FIXED
BPE-ish regex; this module LEARNS the merge table itself — the vocab-
construction step a training-data pipeline runs over its corpus before
tokenizer freeze.  Classic word-level BPE (Sennrich et al. 2016, public
algorithm):

  1. One corpus pass builds the DISTINCT-WORD frequency table
     (``groupby(word).sum(freq)``) — the Zipf-bounded small side that
     all training iterations run against (distinct words ≪ corpus; at
     web scale ~10⁷–10⁸ rows vs 10¹²⁺ tokens).  Words are stored as
     symbol-sequence strings joined by U+0001 (a byte that cannot occur
     in the whitespace-split words), initial symbols = characters plus
     the ``</w>`` end marker.
  2. Each merge iteration is one small distributed pass over the word
     table: ``map_batches`` emits (pair, total_freq) partials per block
     (a combiner — pair counts collapse within each block before the
     shuffle), ``groupby(pair).sum`` reduces, and the winner is the
     lexicographically-smallest pair among the max-count ties (total
     order → deterministic across block layouts).  The merge is then
     applied with another ``map_batches`` (string replace on the
     delimited form — no Python pair loops over the corpus, only over
     each block's distinct words).
  3. The word table stays MATERIALIZED in the object store between
     iterations (it is the bounded small side; the corpus itself is
     read exactly once, in step 1).

No counterpart in the reference (its tokens are pre-assigned integer
ids; metaprofi never learns a vocabulary) — this is part of the
beyond-reference LLM-pipeline surface, like the dedup ladder.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

SEP = "\x01"
END = "</w>"


def _words_to_symbol_rows(t: pa.Table) -> pa.Table:
    """One batch of documents → (word, freq) partials: whitespace-split,
    per-block combine (dedupe words within the batch before shuffling)."""
    texts = t["text"].to_pylist()
    counts: dict[str, int] = {}
    for txt in texts:
        if not txt:
            continue
        for w in txt.split():
            counts[w] = counts.get(w, 0) + 1
    if not counts:
        return pa.table(
            {"word": pa.array([], pa.string()),
             "freq": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "word": pa.array(list(counts.keys()), pa.string()),
            "freq": pa.array(list(counts.values()), pa.int64()),
        }
    )


def _to_symbolic(t: pa.Table) -> pa.Table:
    """(word, freq) → (sym, freq): characters joined by SEP + END marker."""
    words = t["word"].to_pylist()
    sym = [SEP.join(list(w) + [END]) for w in words]
    return pa.table(
        {"sym": pa.array(sym, pa.string()), "freq": t["freq"]}
    )


def _pair_partials(t: pa.Table) -> pa.Table:
    """One word-table block → (left, right, n) pair-count partials,
    combined within the block before the groupby shuffle."""
    syms = t["sym"].to_pylist()
    freqs = t["freq"].to_pylist()
    counts: dict[tuple[str, str], int] = {}
    for s, f in zip(syms, freqs):
        parts = s.split(SEP)
        for a, b in zip(parts[:-1], parts[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    if not counts:
        return pa.table(
            {"left": pa.array([], pa.string()),
             "right": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    ls, rs = zip(*counts.keys())
    return pa.table(
        {
            "left": pa.array(list(ls), pa.string()),
            "right": pa.array(list(rs), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        }
    )


def _apply_merge(t: pa.Table, left: str, right: str) -> pa.Table:
    """Replace every (left, right) adjacency with the merged symbol."""
    merged = left + right
    pat = SEP + left + SEP + right + SEP
    rep = SEP + merged + SEP
    syms = t["sym"].to_pylist()
    out = []
    for s in syms:
        s2 = SEP + s + SEP
        # overlapping occurrences (e.g. a·a·a with merge (a,a)) need the
        # double pass a single str.replace cannot see
        while pat in s2:
            s2 = s2.replace(pat, rep)
        out.append(s2[1:-1])
    return pa.table({"sym": pa.array(out, pa.string()), "freq": t["freq"]})


def word_frequency_table(sf_dir: str) -> rd.Dataset:
    """ONE corpus pass → distinct (word, freq) Dataset."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    partials = docs.map_batches(
        _words_to_symbol_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("word").sum("freq").rename_columns(
        {"sum(freq)": "freq"}
    )


def bpe_train(
    sf_dir: str, n_merges: int = 10, min_freq: int = 2
) -> pa.Table:
    """Learn ``n_merges`` BPE merges; returns (rank, left, right, n).

    Deterministic: winner per round = max count, ties broken by
    (left, right) lexicographic order.  Stops early when no pair
    reaches ``min_freq``."""
    words = word_frequency_table(sf_dir).map_batches(
        _to_symbolic, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    from functools import partial

    ranks: list[int] = []
    lefts: list[str] = []
    rights: list[str] = []
    ns: list[int] = []
    for rank in range(n_merges):
        pairs = (
            words.map_batches(
                _pair_partials, batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby(["left", "right"])
            .sum("n")
        )
        # top-1 with a total order: count desc, then (left, right) asc
        top = pairs.sort(
            ["sum(n)", "left", "right"], descending=[True, False, False]
        ).limit(1).take_all()
        if not top or top[0]["sum(n)"] < min_freq:
            break
        left, right, n = top[0]["left"], top[0]["right"], top[0]["sum(n)"]
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        ns.append(int(n))
        words = words.map_batches(
            partial(_apply_merge, left=left, right=right),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def bpe_train_local(
    texts: list[str], n_merges: int = 10, min_freq: int = 2
) -> list[tuple[str, str, int]]:
    """Single-process reference implementation for the parity test —
    the textbook algorithm, no Ray."""
    freqs: dict[tuple[str, ...], int] = {}
    for txt in texts:
        for w in (txt or "").split():
            key = tuple(list(w) + [END])
            freqs[key] = freqs.get(key, 0) + 1
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for word, f in freqs.items():
            for a, b in zip(word[:-1], word[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # emulate (count desc, pair asc): find max count then min pair
        m = max(counts.values())
        if m < min_freq:
            break
        pair = min(k for k, v in counts.items() if v == m)
        merges.append((pair[0], pair[1], m))
        merged = pair[0] + pair[1]
        new_freqs: dict[tuple[str, ...], int] = {}
        for word, f in freqs.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and word[i] == pair[0]
                    and word[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_freqs[key] = new_freqs.get(key, 0) + f
        freqs = new_freqs
    return merges
