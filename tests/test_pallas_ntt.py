"""Bit-equality of the Pallas NTT backend against the XLA reference path.

The Pallas kernels (core/pallas_ntt.py) must be drop-in interchangeable
with ntt.ntt_fwd_t / ntt_inv_t behind ckks.py's backend dispatch: same
element ordering, same Shoup/Montgomery arithmetic, hence bit-identical
outputs.  On CPU the kernels run in interpreter mode; the compiled path is
exercised on the TPU by bench.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sorting_fhe_tpu.core import nt
from sorting_fhe_tpu.core.ntt import NttContext, ntt_fwd_t, ntt_inv_t
from sorting_fhe_tpu.core.pallas_ntt import ntt_fwd_pallas, ntt_inv_pallas


@pytest.mark.parametrize("logn", [8, 11])
def test_pallas_bit_equality(logn):
    n = 1 << logn
    primes = nt.find_ntt_primes(28, 5, n)
    ctx = NttContext(primes, n)
    pk = ctx.pallas_tables()
    rng = np.random.default_rng(7)

    # full prefix rows
    x = jnp.asarray(np.stack([
        rng.integers(0, p, size=n, dtype=np.uint64).astype(np.uint32)
        for p in primes]))
    rows = jnp.asarray(np.arange(len(primes), dtype=np.int32))
    want = ntt_fwd_t(x, ctx.p, ctx.psi, ctx.psi_sh)
    got = ntt_fwd_pallas(x, pk, rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    winv = ntt_inv_t(want, ctx.p, ctx.ipsi, ctx.ipsi_sh,
                     ctx.n_inv, ctx.n_inv_sh)
    ginv = ntt_inv_pallas(got, pk, rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(ginv), np.asarray(winv))
    np.testing.assert_array_equal(np.asarray(ginv), np.asarray(x))


def test_pallas_row_subset():
    """Arbitrary (non-prefix) row selection must match per-row XLA calls."""
    n = 256
    primes = nt.find_ntt_primes(28, 6, n)
    ctx = NttContext(primes, n)
    pk = ctx.pallas_tables()
    rng = np.random.default_rng(3)
    sel = np.array([4, 1, 5], dtype=np.int32)
    x = jnp.asarray(np.stack([
        rng.integers(0, primes[r], size=n, dtype=np.uint64).astype(np.uint32)
        for r in sel]))
    want = ntt_fwd_t(x, ctx.p[sel], ctx.psi[sel], ctx.psi_sh[sel])
    got = ntt_fwd_pallas(x, pk, jnp.asarray(sel), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_batched_lead_dims():
    """[k, L, n] leading dims map onto the grid identically."""
    n = 256
    primes = nt.find_ntt_primes(28, 3, n)
    ctx = NttContext(primes, n)
    pk = ctx.pallas_tables()
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.stack([np.stack([
        rng.integers(0, p, size=n, dtype=np.uint64).astype(np.uint32)
        for p in primes]) for _ in range(3)]))
    rows = jnp.asarray(np.arange(len(primes), dtype=np.int32))
    want = ntt_fwd_t(x, ctx.p, ctx.psi, ctx.psi_sh)
    got = ntt_fwd_pallas(x, pk, rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_backend_equality_end_to_end():
    """A full homomorphic step is bit-identical under both backends."""
    from sorting_fhe_tpu.core.ckks import CkksContext, CkksConfig

    def build(backend):
        return CkksContext(CkksConfig(ring_dim=1 << 8, mult_depth=4,
                                      scale_bits=52, comp=2, dnum=2,
                                      seed=11, ntt_backend=backend))

    cx = build("xla")
    cp = build("pallas-interpret")
    v = np.linspace(0.1, 0.9, 4)
    w = np.linspace(0.9, 0.1, 4)

    def step(ctx):
        ctx.gen_rotation_keys([1])
        a = ctx.encrypt(v, slots=4)
        b = ctx.encrypt(w, slots=4)
        m = ctx.rescale(ctx.mult(a, b))
        r = ctx.rotate(m, 1)
        out = ctx.add(r, m)
        return np.asarray(out.data), ctx.decrypt(out)[:4]

    dx, vx = step(cx)
    dp, vp = step(cp)
    np.testing.assert_array_equal(dx, dp)
    want = np.roll(v * w, -1) + v * w
    assert np.abs(vx - want).max() < 1e-2
