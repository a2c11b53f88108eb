"""Offset-aware shingle extraction over Arrow ``list<int32>`` token columns.

The reference slides a k-wide byte window over each sequence with stride 1
(/root/reference/metaprofi/lib/bloomfilter_cython.pyx:103-129).  Here the
payload is pre-tokenized, so a shingle is a window of k consecutive int32
tokens; windows never cross row boundaries.  Everything is zero-copy from the
Arrow buffers: the flat child values array and the offsets array are viewed as
NumPy, window starts computed by offset arithmetic (see
``sketches.hashing.window_starts``) — no per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketches.hashing import window_starts


def list_column_parts(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat int32 values, int64 offsets) for a list<int32>/large_list<int32>
    column.  Offsets point into the (unsliced) values buffer, matching Arrow's
    layout contract, so sliced arrays need no copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.LargeListArray):
        offsets = col.offsets.to_numpy().astype(np.int64, copy=False)
    elif isinstance(col, pa.ListArray):
        offsets = col.offsets.to_numpy().astype(np.int64, copy=False)
    else:
        raise TypeError(f"expected list<int32> column, got {col.type}")
    values = col.values.to_numpy(zero_copy_only=False)
    if values.dtype != np.int32:
        values = values.astype(np.int32)
    return values, offsets


def batch_windows(
    batch: pa.Table, k: int, tokens_col: str = "tokens"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All k-token windows of a batch.

    Returns (values, starts, row_of_window): hash windows with
    ``hashing.hash_windows(values, starts, k, seed)``; ``row_of_window`` maps
    each window back to its batch row (for per-source / per-query grouping).
    Rows shorter than k yield no windows (reference length filter,
    bloomfilter_cython.pyx:103); duplicates are preserved (theta semantics
    count every window, search_index.py:414-431).
    """
    values, offsets = list_column_parts(batch.column(tokens_col))
    starts, row_of_window = window_starts(offsets, k)
    return values, starts, row_of_window
