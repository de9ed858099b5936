"""EvalBootstrap tests (core/bootstrap.py).

The reference consumes OpenFHE's EvalBootstrap in three places:
BitonicSort's level trigger (/root/reference/src/sort_algo.h:1436-1438),
the k-way stage budgets (k-way/EvalUtils.cpp:57-94), and compositeSign's
lazy path (sign.cpp:160-185).  These tests exercise the real capability
(mod-raise -> subring trace -> CoeffsToSlots -> sine EvalMod ->
SlotsToCoeffs) that sits behind those hooks — the recrypt_hook used by
cheap tests is only a trigger-logic mock.

Tier: cheap crypto (SURVEY.md §4.1) — ring 2^8/2^10, sparse secret.
"""

import os

import numpy as np
import pytest

from sorting_fhe_tpu.core.params import CkksConfig
from sorting_fhe_tpu.core.ckks import CkksContext
from sorting_fhe_tpu.core.bootstrap import Bootstrapper, BootstrapHook, default_K

RUN_SLOW = os.environ.get("SORTING_FHE_RUN_SLOW", "0") == "1"


@pytest.fixture(scope="module")
def boot_ctx():
    cfg = CkksConfig(ring_dim=1 << 8, mult_depth=16, scale_bits=52, comp=2,
                     dnum=3, secret_hw=16)
    return CkksContext(cfg)


def test_default_K_requires_sparse_secret():
    with pytest.raises(ValueError):
        default_K(None)
    assert default_K(16) >= 12
    assert default_K(64) > default_K(16)


def test_bootstrap_roundtrip(boot_ctx):
    """Exhausted ciphertext -> bootstrap -> same values, many levels back."""
    ctx = boot_ctx
    bs = Bootstrapper(ctx, slots=4).setup_keys()
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, 4)
    ct = ctx.encrypt(v, slots=4)
    ct = ctx.level_reduce(ct, bs.raise_limbs)   # burn to the bottom
    out = bs.bootstrap(ct)
    got = ctx.decrypt(out)[:4]
    err = np.abs(got - v).max()
    assert err < 1e-3, err
    # must return usable depth: >= 2 levels above the raise point
    assert out.limbs >= bs.raise_limbs + 2 * ctx.params.comp, out.limbs
    # the output scale is near (not exactly on) the canonical ladder —
    # FLEXIBLEAUTO-style drift; _match_add absorbs it downstream
    assert abs(out.scale / ctx.canonical_scale(out.limbs) - 1) < 0.01


def test_bootstrap_then_compute(boot_ctx):
    """Post-bootstrap ciphertext supports further homomorphic ops."""
    ctx = boot_ctx
    bs = Bootstrapper(ctx, slots=4).setup_keys()
    v = np.array([0.1, -0.4, 0.3, 0.25])
    ct = ctx.level_reduce(ctx.encrypt(v, slots=4), bs.raise_limbs)
    out = bs.bootstrap(ct)
    sq = ctx.rescale(ctx.square(out))
    got = ctx.decrypt(sq)[:4]
    assert np.abs(got - v * v).max() < 1e-3


def test_bootstrap_hook_dispatch(boot_ctx):
    """BootstrapHook lazily builds one Bootstrapper per slot width."""
    hook = BootstrapHook(boot_ctx)
    v = np.array([0.5, -0.5, 0.25, -0.25])
    ct = boot_ctx.encrypt(v, slots=4)
    ct = boot_ctx.level_reduce(ct, 4)
    out = hook(ct)
    assert list(hook._per_slots) == [4]
    out2 = hook(boot_ctx.level_reduce(boot_ctx.encrypt(v, slots=4), 4))
    assert list(hook._per_slots) == [4]     # cached, not rebuilt
    got = boot_ctx.decrypt(out)[:4]
    assert np.abs(got - v).max() < 1e-3
    del out2


@pytest.mark.skipif(not RUN_SLOW, reason="set SORTING_FHE_RUN_SLOW=1")
def test_bitonic_sort_with_real_bootstrap():
    """Encrypted BitonicSort with the real EvalBootstrap behind the level
    trigger (reference regime: sort_algo.h:1436-1438 boots at level>29;
    here a shallow chain forces mid-network boots)."""
    from sorting_fhe_tpu.models.bitonic import BitonicSort
    from sorting_fhe_tpu.ops.sign import SignConfig, CompositeSignConfig

    cfg = CkksConfig(ring_dim=1 << 9, mult_depth=26, scale_bits=52, comp=2,
                     dnum=4, secret_hw=16)
    ctx = CkksContext(cfg)
    N = 8
    bs = BitonicSort(ctx, N, bootstrap_level=8,
                     bootstrap_hook=BootstrapHook(ctx))
    rng = np.random.default_rng(7)
    v = (rng.permutation(N).astype(np.float64) + 1.0) * 255.0 / (N + 1)
    ct = ctx.encrypt(v, slots=N)
    out = bs.sort(ct, SignConfig(CompositeSignConfig(3, 2, 2),
                                 mult_depth=cfg.mult_depth))
    got = ctx.decrypt(out)[:N]
    assert np.abs(got - np.sort(v)).max() < 2.0
