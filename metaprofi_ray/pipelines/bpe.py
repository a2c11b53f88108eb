"""Distributed BPE vocabulary training over the documents table.

The counting face (`textstats.token_counts_bpe`) tokenizes with a FIXED
BPE-ish regex; this module LEARNS the merge table itself — the vocab-
construction step a training-data pipeline runs over its corpus before
tokenizer freeze.  Classic word-level BPE (Sennrich et al. 2016, public
algorithm), with a batched merge schedule for production vocab sizes:

  1. One corpus pass builds the DISTINCT-WORD frequency table
     (``groupby(word).sum(freq)``) — the Zipf-bounded small side that
     all training iterations run against (distinct words ≪ corpus; at
     web scale ~10⁷–10⁸ rows vs 10¹²⁺ tokens).  Words are stored as
     symbol-sequence strings joined by U+0001, initial symbols =
     characters plus the ``</w>`` end marker.  U+0001 itself is NOT
     whitespace, so real text can contain it inside a word — it is
     stripped during word-table construction (both here and in the
     local parity reference), never silently corrupting the encoding.
  2. Each merge ROUND is one small distributed pass over the word
     table: ``map_batches`` emits (pair, total_freq) partials per block
     (a combiner — pair counts collapse within each block before the
     shuffle), ``groupby(pair).sum`` reduces, and each block then keeps
     only its TOP-K rows under the (count desc, pair asc) total order —
     the union of block top-Ks contains the exact global top-K (each
     post-groupby row carries its final global count), so the driver
     re-sorts the tiny candidate set and never pays a whole-dataset
     sort per round.  From the global top-K the round greedily selects
     up to ``batch`` pairwise-DISJOINT merges (no selected pair shares
     a symbol with the left/right/merged symbol of an earlier selected
     pair): disjoint merges neither create nor destroy each other's
     adjacencies, so applying the whole batch in one pass over the
     word table equals applying them one at a time with counts frozen
     at round start.  ``batch=1`` degenerates to the exact textbook
     sequential algorithm; a 32k-merge production vocab runs in
     ~vocab/batch distributed rounds instead of 32k.
  3. The word table stays MATERIALIZED in the object store between
     rounds (it is the bounded small side; the corpus itself is read
     exactly once, in step 1).

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
    per-block combine (dedupe words within the batch before shuffling).
    Strips the internal SEP byte from words (see module docstring).

    This is the only stage that scales with CORPUS size (everything after
    runs over the distinct-word table), so it runs the shared vectorized
    combiner kernel (``functions.wordids.word_counts`` — the same kernel
    ``textstats.token_topk`` uses).  Split convention: Arrow's Unicode
    White_Space (≙ ``str.split()`` on ASCII text; Python additionally
    treats U+001C–1F as separators — documented domain convention, same
    as token_topk's SQL-oracle note)."""
    from ..functions.wordids import word_counts

    words, counts = word_counts(t["text"], strip=SEP)
    return pa.table(
        {"word": words, "freq": pa.array(counts, pa.int64())}
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


def _block_topk(t: pa.Table, k: int) -> pa.Table:
    """Keep a block's top-k rows under (count desc, left asc, right asc).
    Post-groupby each (left, right) row carries its FINAL global count
    (column ``sum(n)``), so the union of block top-ks ⊇ the exact global
    top-k."""
    if t.num_rows <= k:
        return t
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        t,
        sort_keys=[("sum(n)", "descending"), ("left", "ascending"),
                   ("right", "ascending")],
    )
    return t.take(idx.slice(0, k))


def _select_disjoint(
    cands: list[tuple[int, str, str]], batch: int, min_freq: int
) -> list[tuple[str, str, int]]:
    """Greedy disjoint-merge selection over the (count desc, pair asc)
    ordered candidate list: a pair is selected iff none of its left /
    right / merged symbol strings was touched by an earlier selection.
    Disjointness makes the batch order-independent and equal to a
    sequential application with counts frozen at round start."""
    used: set[str] = set()
    sel: list[tuple[str, str, int]] = []
    for n, left, right in cands:
        if n < min_freq:
            break
        merged = left + right
        if left in used or right in used or merged in used:
            continue
        sel.append((left, right, int(n)))
        used.update((left, right, merged))
        if len(sel) >= batch:
            break
    return sel


def _apply_merges(t: pa.Table, merges: list[tuple[str, str]]) -> pa.Table:
    """Apply the batch's merges with the textbook LEFT-TO-RIGHT greedy
    scan (the exact formulation ``bpe_train_local`` uses): one pass per
    word checking each adjacency against the batch's pair map.  Merges
    within one batch are symbol-disjoint, so application order cannot
    matter — but repeat-symbol runs can: a ``str.replace``-style pass
    groups ``a×5`` as (aa, a, aa) where the scan's (aa, aa, a) is the
    textbook answer, so this must be a scan, not a replace."""
    pair_map = {(l, r): l + r for l, r in merges}
    syms = t["sym"].to_pylist()
    out = []
    for s in syms:
        parts = s.split(SEP)
        res: list[str] = []
        i, n = 0, len(parts)
        while i < n:
            if i + 1 < n and (parts[i], parts[i + 1]) in pair_map:
                res.append(pair_map[(parts[i], parts[i + 1])])
                i += 2
            else:
                res.append(parts[i])
                i += 1
        out.append(SEP.join(res))
    return pa.table({"sym": pa.array(out, pa.string()), "freq": t["freq"]})


def word_frequency_table(sf_dir: str) -> rd.Dataset:
    """ONE corpus pass → distinct (word, freq) Dataset.

    At corpus scale the reduce is a hash aggregate (``functions.hashagg``),
    not the native ``groupby(word).sum``: word cardinality is high, and
    the sort-based aggregate's per-group Python loop measured 347 s remote
    CPU / 24 s wall on a 49k-word table whose map+combine stages take
    2 s.  Hash-partition + per-block Arrow group_by runs the same reduce
    in C++ (24 → ~6 s e2e on the same corpus); small corpora keep the
    native path (the hash path's ~2 s actor spin-up dwarfs them)."""
    from ..functions.hashagg import (
        hash_aggregate,
        hash_path_pays_bytes,
        partitions_for,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    partials = docs.map_batches(
        _words_to_symbol_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    # gate on TEXT BYTES, not doc count: the reduce input is per-block
    # word partials (words, not docs — a 100k-doc/70 MB corpus feeds
    # 3.36M partial rows into the reduce, where the native path took 24 s)
    if hash_path_pays_bytes(docs):
        # partial rows ≤ blocks × per-block vocab ≲ content bytes / 24
        return hash_aggregate(
            partials, ["word"], [("freq", "sum", "freq")],
            min_partitions=partitions_for(docs.size_bytes() // 24, 24),
        )
    return partials.groupby("word").sum("freq").rename_columns(
        {"sum(freq)": "freq"}
    )


def _round_candidates(words: rd.Dataset, topk: int) -> list[tuple[int, str, str]]:
    """One distributed pass: pair partials → groupby sum → per-block
    top-k → tiny driver-side reduce.  Returns the EXACT global top-k as
    (n, left, right) tuples in (n desc, pair asc) order — no global sort
    of the pair table (the former per-merge whole-dataset shuffle)."""
    from functools import partial

    # The pair reduce stays on the NATIVE groupby: pair cardinality is
    # bounded by distinct ADJACENT SYMBOL pairs (~alphabet², tiny early,
    # modest late), not by word count — measured on the 49k-word corpus:
    # native 1.7 s/round vs 2.5 s/round for the hash aggregate (whose
    # per-call actor spin-up only pays off at high key cardinality; see
    # word_frequency_table for the case where it does).
    pairs = (
        words.map_batches(
            _pair_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["left", "right"])
        .sum("n")
        .map_batches(
            partial(_block_topk, k=topk), batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    rows = pairs.take_all()  # ≤ blocks × topk small rows
    cands = sorted(
        ((int(r["sum(n)"]), r["left"], r["right"]) for r in rows),
        key=lambda c: (-c[0], c[1], c[2]),
    )
    return cands[:topk]


def bpe_train(
    sf_dir: str, n_merges: int = 10, min_freq: int = 2, batch: int = 1,
    topk: int | None = None,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges; returns (rank, left, right, n).

    Deterministic: candidates are ordered by (count desc, then (left,
    right) lexicographic), and each ROUND applies up to ``batch``
    disjoint merges from the global top-``topk`` in one distributed
    pass (``batch=1`` = the exact textbook sequential algorithm).
    Stops early when no pair reaches ``min_freq``."""
    if topk is None:
        topk = max(64, 4 * batch)
    words = word_frequency_table(sf_dir).map_batches(
        _to_symbolic, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    from functools import partial

    ranks: list[int] = []
    lefts: list[str] = []
    rights: list[str] = []
    ns: list[int] = []
    while len(ranks) < n_merges:
        cands = _round_candidates(words, topk)
        sel = _select_disjoint(
            cands, min(batch, n_merges - len(ranks)), min_freq
        )
        if not sel:
            break
        for left, right, n in sel:
            ranks.append(len(ranks))
            lefts.append(left)
            rights.append(right)
            ns.append(n)
        words = words.map_batches(
            partial(_apply_merges, merges=[(l, r) for l, r, _ in sel]),
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
    texts: list[str], n_merges: int = 10, min_freq: int = 2,
    batch: int = 1, topk: int | None = None,
) -> list[tuple[str, str, int]]:
    """Single-process reference implementation for the parity test —
    the textbook algorithm (``batch=1``) or the same batched-round rule
    as ``bpe_train`` (greedy disjoint selection over the global
    top-``topk``), no Ray.

    Split-convention caveat: this uses ``str.split()`` where the
    distributed path uses Arrow's Unicode White_Space split; they agree
    on ASCII text but Python additionally treats U+001C–1F (file/group/
    record/unit separators) as whitespace.  Parity therefore holds on
    corpora without those control bytes — the same documented domain
    convention as ``textstats.token_topk``'s SQL oracle."""
    if topk is None:
        topk = max(64, 4 * batch)
    freqs: dict[tuple[str, ...], int] = {}
    for txt in texts:
        for w in (txt or "").split():
            w = w.replace(SEP, "")
            if not w:
                continue
            key = tuple(list(w) + [END])
            freqs[key] = freqs.get(key, 0) + 1
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        counts: dict[tuple[str, str], int] = {}
        for word, f in freqs.items():
            for a, b in zip(word[:-1], word[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        cands = sorted(
            ((n, a, b) for (a, b), n in counts.items()),
            key=lambda c: (-c[0], c[1], c[2]),
        )[:topk]
        sel = _select_disjoint(
            cands, min(batch, n_merges - len(merges)), min_freq
        )
        if not sel:
            break
        merges.extend(sel)
        pair_set = {(l, r): l + r for l, r, _ in sel}
        new_freqs: dict[tuple[str, ...], int] = {}
        for word, f in freqs.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and (word[i], word[i + 1]) in pair_set
                ):
                    out.append(pair_set[(word[i], word[i + 1])])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_freqs[key] = new_freqs.get(key, 0) + f
        freqs = new_freqs
    return merges
