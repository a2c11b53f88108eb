"""Vectorized word extraction + interning shared by the flagship tokenizer
and the MinHash signer.

Round-1 profiling showed both stages spending their time in a per-word
Python loop (dict probe + hash per word).  This module replaces that with
Arrow kernels end-to-end: one ``utf8_split_whitespace`` pass over the whole
batch, one ``dictionary_encode`` (C++ dedupe — the analogue of
``np.unique(return_inverse=True)`` without Python string comparisons), and a
hash loop ONLY over the batch's unique words, fronted by a per-actor memo so
a word hashes once per actor lifetime.

Parity contract: identical output to ``text.split()`` per row.  Arrow's
split kernel emits empty-string tokens at leading/trailing whitespace where
``str.split()`` emits nothing, so empty tokens are masked out with
offset-aware correction (tested against ``str.split`` on adversarial
strings in tests/test_ops.py).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def split_words(
    texts: pa.ChunkedArray | pa.Array, lower: bool = False
) -> tuple[pa.Array, np.ndarray, int]:
    """Whitespace-split a string column in one Arrow pass.

    Returns ``(flat_words, row_of, n_rows)``: the flat Arrow string array of
    all words (possibly containing empty tokens — callers go through
    ``intern_ids`` which drops them) and each word's owning row index.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        # null text would poison the downstream count arithmetic (NaN ->
        # astype(int64) garbage); treat it as an empty document instead
        texts = pc.fill_null(texts, "")
    if lower:
        texts = pc.utf8_lower(texts)
    la = pc.utf8_split_whitespace(texts)
    counts = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
    n_rows = len(counts)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    flat = la.flatten()
    return flat, row_of, n_rows


def word_counts(
    texts: pa.ChunkedArray | pa.Array, strip: str | None = None
) -> tuple[pa.Array, np.ndarray]:
    """Distinct-word counts for a batch of texts: one split pass, one C++
    ``dictionary_encode`` dedupe, counts via ``bincount`` — the shared
    combiner kernel of ``textstats.token_topk`` and the BPE word table.

    Returns ``(words, counts)`` with empty-string split artifacts removed.
    ``strip`` removes an in-band separator byte from every word first
    (probed on the flat word array — the ``replace_substring`` copy is
    only paid when the byte actually occurs)."""
    flat, _, _ = split_words(texts)
    if len(flat) == 0:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    if strip is not None and pc.any(pc.match_substring(flat, strip)).as_py():
        flat = pc.replace_substring(flat, pattern=strip, replacement="")
    dct = pc.dictionary_encode(flat)
    if isinstance(dct, pa.ChunkedArray):
        dct = dct.combine_chunks()
    idx = dct.indices.to_numpy(zero_copy_only=False)
    words = dct.dictionary
    counts = np.bincount(idx, minlength=len(words)).astype(np.int64)
    keep = pc.not_equal(words, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if keep_np.all():
        return words, counts
    return words.filter(keep), counts[keep_np]


def intern_ids(
    flat_words: pa.Array,
    row_of: np.ndarray,
    n_rows: int,
    hash_word: Callable[[str], int],
    memo: dict[str, int] | None = None,
    dtype=np.int64,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Map every word to ``hash_word(word)`` with batch-level dedupe.

    ``dictionary_encode`` collapses the flat words to unique values at C++
    speed; ``hash_word`` runs once per unique word not already in ``memo``
    (actor state — survives across batches).  Empty-string tokens (Arrow
    split artifacts at text boundaries) are dropped to match ``str.split``.

    Returns ``(word_ids, row_of, lens)`` where ``lens[r]`` is the word count
    of row r after the empty-token drop.
    """
    if len(flat_words) == 0:
        return (
            np.empty(0, dtype=dtype),
            np.empty(0, dtype=np.int64),
            np.zeros(n_rows, dtype=np.int64),
        )
    dct = pc.dictionary_encode(flat_words)
    if isinstance(dct, pa.ChunkedArray):
        dct = dct.combine_chunks()
    indices = dct.indices.to_numpy(zero_copy_only=False)
    uniq = dct.dictionary.to_pylist()
    uniq_ids = np.empty(len(uniq), dtype=dtype)
    empty_slot = -1
    if memo is None:
        memo = {}
    for i, w in enumerate(uniq):
        if w == "":
            empty_slot = i
            uniq_ids[i] = 0
            continue
        v = memo.get(w)
        if v is None:
            v = hash_word(w)
            memo[w] = v
        uniq_ids[i] = v
    if empty_slot >= 0:
        keep = indices != empty_slot
        indices = indices[keep]
        row_of = row_of[keep]
    word_ids = uniq_ids[indices]
    lens = np.bincount(row_of, minlength=n_rows)
    return word_ids, row_of, lens
