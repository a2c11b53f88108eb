"""Distributed connected components vs reference union-find (pipelines/cc.py)."""

import numpy as np
import pandas as pd
import pytest

from metaprofi_ray.pipelines import cc


def unionfind_roots(pairs: pd.DataFrame) -> dict[int, int]:
    """The round-1 driver-side implementation (union-by-min)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = set(pairs["doc_a"]) | set(pairs["doc_b"])
    return {int(n): find(int(n)) for n in nodes}


def as_pairs(edges) -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_a": [a for a, _ in edges], "doc_b": [b for _, b in edges]}
    )


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2)],
        [(1, 2), (2, 3), (3, 4)],  # chain: propagation needs > 1 round
        [(10, 20), (30, 40), (20, 30)],  # merge two components
        [(5, 5)],  # self loop
        [(2, 1), (1, 2), (2, 1)],  # duplicates both directions
        [(100, 7), (7, 100), (9, 8), (8, 6), (6, 9)],  # cycle
        [(i, i + 1) for i in range(1, 30)],  # long chain, deep diameter
    ],
)
def test_cc_matches_unionfind(ray_session, edges):
    pairs = as_pairs(edges)
    got = cc.components_pandas(pairs).set_index("node")["root"].to_dict()
    expect = unionfind_roots(pairs)
    assert got == expect


def test_cc_random_graphs(ray_session):
    rng = np.random.default_rng(99)
    for trial in range(3):
        n_nodes = 60
        n_edges = int(rng.integers(10, 80))
        a = rng.integers(0, n_nodes, size=n_edges)
        b = rng.integers(0, n_nodes, size=n_edges)
        pairs = pd.DataFrame({"doc_a": a, "doc_b": b})
        got = cc.components_pandas(pairs).set_index("node")["root"].to_dict()
        expect = unionfind_roots(pairs)
        assert got == expect, f"trial {trial}"


def test_cc_empty(ray_session):
    out = cc.components_pandas(pd.DataFrame({"doc_a": [], "doc_b": []}))
    assert len(out) == 0
    assert list(out.columns) == ["node", "root"]
