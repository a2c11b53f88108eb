"""Unit + property tests for the mergeable sketch kernels (no Ray).

Mirrors FIXTURES.md §3: accuracy vs exact ground truth, merge associativity
(byte-identical for Bloom/HLL/CMS; within error bound for t-digest/KLL).
"""

import numpy as np
import pytest

from metaprofi_ray.config import SketchConfig
from metaprofi_ray.sketches import KLL, TDigest, bloom, cms, hashing, hll


CFG = SketchConfig(k=8, h=2, m=1 << 17, shards=4)


def _windows(rng, n, k=8, vocab=50_000):
    vals = rng.integers(0, vocab, size=n + k - 1, dtype=np.int32)
    starts = np.arange(n, dtype=np.int64)
    return vals, starts


# ---------------------------------------------------------------- Bloom
class TestBloom:
    def test_no_false_negatives(self):
        rng = np.random.default_rng(0)
        vals, starts = _windows(rng, 5000)
        bits = bloom.bits_for_windows(vals, starts, CFG)
        shards = bloom.set_bits_sharded(bits, CFG)
        # probe the same windows: every (window, hash) bit must be set
        mats = {
            sid: bloom.decode_dense(b, CFG.shard_bytes)[None, :]
            for sid, b in shards.items()
        }
        flat = bits.reshape(-1)
        present = np.zeros(flat.size, dtype=np.uint8)
        for sid, mat in mats.items():
            mask = flat // CFG.shard_bits == sid
            local = flat[mask] % CFG.shard_bits
            present[mask] = bloom.contains_counts(
                mat, local // 8, (local % 8).astype(np.uint8)
            )[:, 0]
        assert present.all()

    def test_fpr_within_bound(self):
        rng = np.random.default_rng(1)
        n = 4000
        vals, starts = _windows(rng, n)
        bits = bloom.bits_for_windows(vals, starts, CFG)
        shards = bloom.set_bits_sharded(bits, CFG)
        full = np.concatenate(
            [
                bloom.decode_dense(
                    shards.get(s, bloom.TAG_DENSE + bytes(CFG.shard_bytes)),
                    CFG.shard_bytes,
                )
                for s in range(CFG.shards)
            ]
        )
        # negatives: fresh random windows (vocab disjoint by offset)
        nvals = rng.integers(60_000, 120_000, size=20_000 + 7, dtype=np.int32)
        nstarts = np.arange(20_000, dtype=np.int64)
        nbits = bloom.bits_for_windows(nvals, nstarts, CFG)
        byte_idx = nbits // 8
        bit_pos = (nbits % 8).astype(np.uint8)
        hit = ((full[byte_idx] >> bit_pos) & 1).all(axis=1)
        fpr = hit.mean()
        bound = CFG.fpr_bound(n)
        assert fpr <= 3 * bound + 1e-4, (fpr, bound)

    def test_or_merge_associative_and_idempotent(self):
        rng = np.random.default_rng(2)
        parts = []
        for _ in range(5):
            vals, starts = _windows(rng, 500)
            bits = bloom.bits_for_windows(vals, starts, CFG)
            sh = bloom.set_bits_sharded(bits, CFG)
            parts.append(sh.get(0, bloom.TAG_DENSE + bytes(CFG.shard_bytes)))
        ltr = bloom.or_merge(parts, shard_bytes=CFG.shard_bytes)
        rtl = bloom.or_merge(parts[::-1], shard_bytes=CFG.shard_bytes)
        assert ltr == rtl
        assert bloom.or_merge([ltr, ltr]) == ltr  # idempotent

    def test_sharded_equals_unsharded(self):
        """Sharding is a pure layout choice: concatenated shards must equal
        the single-shard packing of the same bit set."""
        rng = np.random.default_rng(3)
        vals, starts = _windows(rng, 1000)
        bits = bloom.bits_for_windows(vals, starts, CFG)
        sharded = bloom.set_bits_sharded(bits, CFG)
        cfg1 = SketchConfig(k=8, h=2, m=CFG.m, shards=1)
        unsharded = bloom.decode_dense(
            bloom.set_bits_sharded(bits, cfg1)[0], cfg1.shard_bytes
        )
        cat = np.concatenate([
            bloom.decode_dense(
                sharded.get(s, bloom.TAG_DENSE + bytes(CFG.shard_bytes)),
                CFG.shard_bytes,
            )
            for s in range(CFG.shards)
        ])
        assert cat.tobytes() == unsharded.tobytes()


# ---------------------------------------------------------------- HLL
class TestHLL:
    @pytest.mark.parametrize("true_n", [100, 10_000, 500_000])
    def test_estimate_within_error(self, true_n):
        p = 12
        regs = hll.empty(p)
        rng = np.random.default_rng(true_n)
        vals = rng.integers(0, 2**31 - 1, size=true_n, dtype=np.int64)
        uniq = np.unique(vals)
        hashes = hashing.hash_values_u64(uniq.astype(np.int32), hashing.SEED_H1)
        hll.update(regs, hashes, p)
        est = hll.estimate(regs)
        rel_err = abs(est - uniq.size) / uniq.size
        assert rel_err < 3 * 1.04 / np.sqrt(1 << p), (est, uniq.size)

    def test_merge_max_byte_identical_any_order(self):
        p = 12
        rng = np.random.default_rng(5)
        chunks = [
            hashing.hash_values_u64(
                rng.integers(0, 10**6, size=1000, dtype=np.int32).astype(np.int32),
                hashing.SEED_H1,
            )
            for _ in range(4)
        ]
        regs_parts = []
        for c in chunks:
            r = hll.empty(p)
            hll.update(r, c, p)
            regs_parts.append(r)
        a = regs_parts[0]
        for r in regs_parts[1:]:
            a = hll.merge(a, r)
        b = regs_parts[3]
        for r in regs_parts[2::-1]:
            b = hll.merge(b, r)
        np.testing.assert_array_equal(a, b)
        # merged == single-pass
        single = hll.empty(p)
        hll.update(single, np.concatenate(chunks), p)
        np.testing.assert_array_equal(a, single)


# ---------------------------------------------------------------- CMS
class TestCMS:
    def test_never_underestimates_and_eps_bound(self):
        d, w = 4, 2048
        table = cms.empty(d, w)
        rng = np.random.default_rng(6)
        stream = rng.zipf(1.3, size=50_000).astype(np.int32) % 10_000
        cms.update(table, stream)
        true = np.bincount(stream, minlength=10_000)
        probe = np.arange(10_000, dtype=np.int32)
        est = cms.query(table, probe).astype(np.int64)
        assert (est >= true[:10_000]).all()
        eps = np.e / w
        over = est - true[:10_000]
        frac_bad = (over > eps * stream.size).mean()
        assert frac_bad < np.exp(-d) + 0.01, frac_bad

    def test_merge_sum_equals_single_pass(self):
        d, w = 4, 512
        rng = np.random.default_rng(7)
        s1 = rng.integers(0, 1000, 5000, dtype=np.int64).astype(np.int32)
        s2 = rng.integers(0, 1000, 5000, dtype=np.int64).astype(np.int32)
        a, b, full = cms.empty(d, w), cms.empty(d, w), cms.empty(d, w)
        cms.update(a, s1)
        cms.update(b, s2)
        cms.update(full, np.concatenate([s1, s2]))
        np.testing.assert_array_equal(cms.merge(a, b), full)
        np.testing.assert_array_equal(cms.merge(a, b), cms.merge(b, a))

    def test_roundtrip(self):
        d, w = 3, 128
        t = cms.empty(d, w)
        cms.update(t, np.array([1, 2, 3], dtype=np.int32))
        np.testing.assert_array_equal(cms.from_bytes(cms.to_bytes(t), d, w), t)


# ---------------------------------------------------------------- t-digest
class TestTDigest:
    def test_quantiles_vs_numpy(self):
        rng = np.random.default_rng(8)
        data = rng.lognormal(0, 1, size=100_000)
        td = TDigest(delta=100)
        for chunk in np.array_split(data, 13):
            td.update(chunk)
        for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
            est = td.quantile(q)
            # rank error: fraction of data below estimate should be near q
            rank = (data < est).mean()
            assert abs(rank - q) < 0.02, (q, rank)

    def test_merge_within_bound(self):
        rng = np.random.default_rng(9)
        data = rng.normal(0, 1, size=60_000)
        parts = np.array_split(data, 6)
        digests = []
        for p in parts:
            t = TDigest(100)
            t.update(p)
            digests.append(t)
        merged = digests[0]
        for t in digests[1:]:
            merged = merged.merge(t)
        assert abs(merged.n - data.size) < 1e-6
        for q in [0.1, 0.5, 0.9]:
            rank = (data < merged.quantile(q)).mean()
            assert abs(rank - q) < 0.03

    def test_roundtrip(self):
        t = TDigest(50)
        t.update(np.arange(1000.0))
        t2 = TDigest.from_bytes(t.to_bytes())
        assert abs(t.quantile(0.5) - t2.quantile(0.5)) < 1e-9


# ---------------------------------------------------------------- KLL
class TestKLL:
    def test_quantiles_vs_numpy(self):
        rng = np.random.default_rng(10)
        data = rng.exponential(2.0, size=100_000)
        sk = KLL(k=200)
        for chunk in np.array_split(data, 17):
            sk.update(chunk)
        for q in [0.05, 0.5, 0.95]:
            rank = (data < sk.quantile(q)).mean()
            assert abs(rank - q) < 0.025, (q, rank)

    def test_merge_within_bound_any_tree(self):
        rng = np.random.default_rng(11)
        data = rng.uniform(0, 1, size=80_000)
        parts = np.array_split(data, 8)
        sks = []
        for p in parts:
            s = KLL(200)
            s.update(p)
            sks.append(s)
        # left fold and pairwise tree
        left = sks[0]
        for s in sks[1:]:
            left = left.merge(s)
        pairs = sks
        while len(pairs) > 1:
            pairs = [pairs[i].merge(pairs[i + 1]) for i in range(0, len(pairs), 2)]
        tree = pairs[0]
        assert left.n == tree.n == data.size
        for q in [0.1, 0.5, 0.9]:
            assert abs((data < left.quantile(q)).mean() - q) < 0.03
            assert abs((data < tree.quantile(q)).mean() - q) < 0.03

    def test_roundtrip(self):
        sk = KLL(100)
        sk.update(np.arange(5000.0))
        sk2 = KLL.from_bytes(sk.to_bytes())
        assert sk2.n == sk.n
        assert abs(sk.quantile(0.3) - sk2.quantile(0.3)) < 1e-9


# ---------------------------------------------------------------- config
class TestConfig:
    def test_m_padded_to_shard_grid(self):
        c = SketchConfig(k=4, h=1, m=1000, shards=3)
        assert c.m % (8 * 3) == 0 and c.m >= 1000
        assert c.shard_bits * c.shards == c.m

    def test_roundtrip_and_gate(self):
        c = SketchConfig()
        c2 = SketchConfig.from_json(c.to_json())
        assert c == c2
        with pytest.raises(ValueError):
            c.validate_compatible(SketchConfig(k=9))

    def test_sizing_formula(self):
        m, h = SketchConfig.size_for(10_000, 0.01)
        assert 90_000 < m < 100_000 and h in (6, 7)
