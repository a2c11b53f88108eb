"""Input-schema validation stage (reference manifest/id validation,
/root/reference/metaprofi/lib/zarrstore.py:106,117-129 — F4 in SURVEY.md §2.2).

A vectorized ``map_batches`` gate over the tokens table: raises on null /
empty ``doc_id``/``source``, negative ``n_tok``, or ``n_tok`` disagreeing
with the actual token-list length.  Pass-through on success (zero-copy),
so it can be prepended to any pipeline: ``ds.map_batches(validate_tokens)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class TokensSchemaError(ValueError):
    pass


def validate_tokens(batch: pa.Table) -> pa.Table:
    for col in ("doc_id", "tokens", "n_tok", "source"):
        if col not in batch.schema.names:
            raise TokensSchemaError(f"missing required column {col!r}")
    for col in ("doc_id", "source"):
        arr = batch[col]
        if arr.null_count:
            raise TokensSchemaError(f"{col} contains {arr.null_count} nulls")
        if pc.any(pc.equal(pc.utf8_length(arr), 0)).as_py():
            raise TokensSchemaError(f"{col} contains empty strings")
    if batch["tokens"].null_count:
        raise TokensSchemaError(
            f"tokens contains {batch['tokens'].null_count} null lists"
        )
    n_tok = batch["n_tok"]
    if n_tok.null_count or pc.any(pc.less(n_tok, 0)).as_py():
        raise TokensSchemaError("n_tok contains nulls or negative values")
    lengths = pc.list_value_length(batch["tokens"])
    if not pc.all(
        pc.equal(pc.cast(lengths, pa.int32()), pc.cast(n_tok, pa.int32()))
    ).as_py():
        bad = pc.sum(
            pc.cast(pc.not_equal(pc.cast(lengths, pa.int32()), pc.cast(n_tok, pa.int32())), pa.int64())
        ).as_py()
        raise TokensSchemaError(f"n_tok mismatches len(tokens) in {bad} rows")
    return batch
