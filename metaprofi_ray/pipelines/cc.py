"""Distributed connected components over a pair/edge Dataset.

The dedup ladder ends with "apply the near-dup pairs": pick one canonical
document per connected component of the pair graph.  Round 1 did this with
a driver-side union-find — fine while the pair list fits on the driver,
wrong at 100 TB.  This module is the scale-safe form: min-label propagation
expressed in Ray Data primitives only, shuffle volume O(V + E) per round,
convergence in graph-diameter rounds (near-dup components are shallow —
typically 2–3 rounds).

The per-round "join labels onto edges" is a bucketed co-partition join:
both edge rows (keyed by src) and label rows (keyed by node) carry
``kb = node % n_buckets``; one ``groupby(kb).map_groups`` co-locates each
bucket and a vectorized pandas merge inside the group produces the
messages.  Coarse buckets (not per-node groups) keep per-group dispatch
overhead negligible — the same discipline the LSH pair stage uses.
(``Dataset.join`` is deliberately avoided: Ray 2.49's hash join raises
ArrowInvalid when a right-side hash partition comes up empty, which small
label tables hit constantly.)

Labels only ever decrease, so ``sum(labels)`` strictly decreases until the
fixpoint; equality of consecutive sums is the exact convergence test and
costs one tiny scalar aggregate per round (no driver-side label state).
Node ids must be non-negative int64 (doc ids are).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

EMPTY_CC = pd.DataFrame(
    {"node": pd.Series([], dtype="int64"), "root": pd.Series([], dtype="int64")}
)

# tagged-row layout shared by both per-round stages:
#   tag=0: edge row   (node=src,  val=dst)
#   tag=1: label row  (node,      val=current label)
_TAGGED = pa.schema(
    [
        ("kb", pa.int64()),
        ("tag", pa.int8()),
        ("node", pa.int64()),
        ("val", pa.int64()),
    ]
)


def _tagged(kb, tag: int, node, val) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "kb": np.asarray(kb, dtype=np.int64),
            "tag": np.full(len(node), tag, dtype=np.int8),
            "node": np.asarray(node, dtype=np.int64),
            "val": np.asarray(val, dtype=np.int64),
        }
    )


def connected_components(
    edges: rd.Dataset,
    max_rounds: int = 50,
    n_buckets: int = 16,
) -> rd.Dataset:
    """``(a, b)`` int64 edge Dataset → ``(node, root)`` where ``root`` is the
    smallest node id in the node's component (matching union-by-min
    union-find output exactly; property-tested in tests/test_cc.py).

    Per round: every directed edge forwards its source's current label to
    its destination (bucketed merge), and each node keeps the minimum of
    its own label and all incoming ones (bucketed group-min).  One
    partitioning key (``node % n_buckets``) throughout.
    """
    B = n_buckets

    def both_dirs(t: pa.Table) -> pd.DataFrame:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return _tagged(src % B, 0, src, dst)

    dir_edges = edges.map_batches(
        both_dirs, batch_format="pyarrow", batch_size=None
    ).materialize()  # loop invariant, re-read from the object store each round
    if dir_edges.count() == 0:
        return rd.from_pandas(EMPTY_CC)

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        """One bucket: labels pass through; each edge emits (dst, lbl_src)."""
        e = g[g["tag"] == 0]
        l = g[g["tag"] == 1][["node", "val"]]
        m = e[["node", "val"]].rename(columns={"val": "dst"}).merge(
            l.rename(columns={"val": "lbl"}), on="node", how="inner"
        )
        out_node = np.concatenate([l["node"].to_numpy(), m["dst"].to_numpy()])
        out_val = np.concatenate([l["val"].to_numpy(), m["lbl"].to_numpy()])
        return _tagged(out_node % B, 1, out_node, out_val)

    def group_min(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("node", as_index=False)["val"].min()
        return _tagged(
            agg["node"].to_numpy() % B, 1, agg["node"], agg["val"]
        )

    # init: label(node) = min(node, min neighbor) — one group_min pass over
    # the edges re-tagged as (dst, src) candidates plus self-labels
    def init_labels(t: pa.Table) -> pd.DataFrame:
        node = t["node"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        cand_node = np.concatenate([node, node])
        cand_val = np.concatenate([np.minimum(node, val), node])
        return _tagged(cand_node % B, 1, cand_node, cand_val)

    labels = (
        dir_edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(group_min, batch_format="pandas")
        .materialize()
    )

    prev_sum = labels.aggregate(Sum("val"))["sum(val)"]
    for _ in range(max_rounds):
        labels = (
            dir_edges.union(labels)
            .groupby("kb")
            .map_groups(propagate, batch_format="pandas")
            .groupby("kb")
            .map_groups(group_min, batch_format="pandas")
            .materialize()
        )
        cur_sum = labels.aggregate(Sum("val"))["sum(val)"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "root": t["val"]}),
        batch_format="pyarrow",
    )


def to_pandas_cc(ds: rd.Dataset) -> pd.DataFrame:
    """Collect a (node, root) Dataset, restoring the schema Ray drops for
    empty pandas-backed datasets."""
    out = ds.to_pandas()
    if out.empty:
        return EMPTY_CC.copy()
    return out.astype({"node": "int64", "root": "int64"})


def components_pandas(pairs: pd.DataFrame) -> pd.DataFrame:
    """``(doc_a, doc_b)`` pandas pairs → ``(node, root)`` via the distributed
    path (convenience wrapper used by the dedup pipelines)."""
    if pairs.empty:
        return EMPTY_CC.copy()
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "a": pairs["doc_a"].astype("int64"),
                "b": pairs["doc_b"].astype("int64"),
            }
        )
    )
    return to_pandas_cc(connected_components(edges))
