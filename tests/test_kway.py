"""k-way sorting network tests.

Tiers (mirroring the reference's strategy, SURVEY.md §4):
  1. pure-logic: sort_type / get_rotate_distance / gen_indices geometry
     (reference tests/k-way/MaskingTest.cpp)
  2. plaintext-mock: full network on PlainContext with near-exact sign,
     all (k, M) combos (reference scripts-tier)
  3. encrypted: small networks under real CKKS, incl. the bootstrap
     trigger path via the recrypt hook (reference tests/KWaySortTest.cpp)
"""

import numpy as np
import pytest

from sorting_fhe_tpu.models.kway import (
    KWaySorter, sort_type, gen_indices, gen_mask, get_rotate_distance,
    kway_rotations, num_stages, kway_factorization)
from sorting_fhe_tpu.ops.sign import SignConfig, CompositeSignConfig
from sorting_fhe_tpu.utils.plain import PlainContext
from sorting_fhe_tpu.utils.testvec import vector_with_min_diff


# ---------------- tier 1: pure logic ----------------

def test_sort_type_first_stages():
    # first M stages of any k are the slope-0 "full k-sorter" stages
    for k in (2, 3, 5):
        m, log_dist, slope = sort_type(k, 3, 0)
        assert (m, log_dist, slope) == (0, 0, 0)


def test_sort_type_stage_count_consistency():
    # every stage index below num_stages yields a valid decomposition
    for k, M in ((2, 3), (3, 2), (5, 2)):
        for stage in range(num_stages(k, M)):
            m, log_dist, slope = sort_type(k, M, stage)
            assert 0 <= m <= M
            assert log_dist >= 0
            assert 0 <= slope <= (k + 1) // 2


def test_rotate_distance():
    assert get_rotate_distance(2, 0, 0) == 1
    assert get_rotate_distance(2, 2, 0) == 4
    assert get_rotate_distance(3, 1, 2) == 3      # slope == k//2+1 -> dist
    assert get_rotate_distance(5, 0, 1) == 4      # dist*(k-slope)
    assert get_rotate_distance(5, 1, 2) == 15


def test_gen_indices_slope0_roles():
    # k=2, M=2, stage 0: adjacent pairs, roles 1..k
    idx = gen_indices(4, 2, 2, 0, 0, 0)
    assert list(idx[0]) == [2, 2, 2, 2]
    assert list(idx[1]) == [1, 2, 1, 2]
    # mask of group-first slots
    assert list(gen_mask(idx, 2, 1)) == [1.0, 0.0, 1.0, 0.0]


def test_kway_rotations_and_factorization():
    assert kway_rotations(8) == [1, -1, 2, -2, 4, -4]
    assert kway_factorization(8) == (2, 3)
    assert kway_factorization(27) == (3, 3)
    assert kway_factorization(25) == (5, 2)
    assert kway_factorization(12) is None


# ---------------- tier 2: plaintext mock, full networks ----------------

@pytest.mark.parametrize("k,M", [(2, 2), (2, 3), (2, 4), (3, 1), (3, 2),
                                 (3, 3), (5, 1), (5, 2)])
def test_kway_network_plain(k, M):
    N = k ** M
    ctx = PlainContext(1 << 12)
    rng = np.random.default_rng(42 + N)
    vals = vector_with_min_diff(N, 0, 1, 1.0 / N, rng)
    ct = ctx.encrypt(vals, slots=1 << (N - 1).bit_length())
    sorter = KWaySorter(ctx, k, M, mult_depth=10 ** 6)
    # near-exact sign so the mock isolates the *network* logic
    out = sorter.sort(ct, SignConfig(CompositeSignConfig(3, 8, 3)))
    got = ctx.decrypt(out)[:N]
    want = np.sort(vals)
    assert np.abs(got - want).max() < 1e-3, (got, want)


# ---------------- tier 3: encrypted ----------------

@pytest.fixture(scope="module")
def ckks_ctx():
    from sorting_fhe_tpu.core.ckks import CkksContext
    from sorting_fhe_tpu.core.params import CkksConfig
    return CkksContext(CkksConfig(ring_dim=1 << 10, mult_depth=24,
                                  scale_bits=52, comp=2, dnum=6))


def test_kway_three_sorter_encrypted(ckks_ctx):
    """k=3, M=1: one slope-0 stage sorts 3 values (SorterTest-style)."""
    ctx = ckks_ctx
    vals = np.array([0.7, 0.2, 0.5])
    ct = ctx.encrypt(vals, slots=4)
    sorter = KWaySorter(ctx, 3, 1, mult_depth=24)
    out = sorter.sort(ct, SignConfig(CompositeSignConfig(3, 2, 2)))
    got = np.asarray(ctx.decrypt(out))[:3]
    want = np.sort(vals)
    assert np.abs(got - want).max() < 0.01, got


def test_kway_n4_with_recrypt_boot(ckks_ctx):
    """k=2, M=2 (3 stages) with the bootstrap-trigger path exercised via
    the recrypt hook (reference boots inside KWaySortTest)."""
    from sorting_fhe_tpu.utils.debug import recrypt_hook
    ctx = ckks_ctx
    rng = np.random.default_rng(7)
    vals = vector_with_min_diff(4, 0, 1, 0.25, rng)
    ct = ctx.encrypt(vals, slots=4)
    sorter = KWaySorter(ctx, 2, 2, mult_depth=24,
                        bootstrap_hook=recrypt_hook(ctx))
    out = sorter.sort(ct, SignConfig(CompositeSignConfig(3, 2, 2)))
    got = np.asarray(ctx.decrypt(out))[:4]
    want = np.sort(vals)
    assert np.abs(got - want).max() < 0.01, (got, want)
