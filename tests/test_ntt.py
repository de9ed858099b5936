"""NTT + modular arithmetic unit tests (pure-logic tier, no crypto).

Mirrors the reference's DecomposeTest-style logic tests (SURVEY.md §4.5) and
validates the Phase-0 numerics scaffolding: NTT round trip, negacyclic
convolution vs an O(n^2) oracle, and the uint32 Montgomery/Shoup kernels.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sorting_fhe_tpu.core import nt
from sorting_fhe_tpu.core.rns import (
    add_mod, sub_mod, mont_mul, shoup_mul, mulhi_u32, barrett_reduce_u32,
)
from sorting_fhe_tpu.core.ntt import (
    NttContext, ntt_fwd, ntt_inv, negacyclic_convolve_reference,
)

RNG = np.random.default_rng(0)


def rand_u32(shape, bound):
    return RNG.integers(0, bound, size=shape, dtype=np.uint64).astype(np.uint32)


def test_prime_generation():
    n = 1 << 12
    primes = nt.find_ntt_primes(30, 5, n)
    assert len(set(primes)) == 5
    for p in primes:
        assert nt.is_prime(p)
        assert p % (2 * n) == 1
        assert p < (1 << 31)


def test_mulhi_u32():
    a = rand_u32((1000,), 1 << 32)
    b = rand_u32((1000,), 1 << 32)
    got = np.asarray(mulhi_u32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_mont_and_shoup_mul():
    p = nt.find_ntt_primes(30, 1, 1 << 10)[0]
    mc = nt.montgomery_constants(p)
    a = rand_u32((2048,), p)
    b = rand_u32((2048,), p)
    pj = jnp.uint32(p)
    # montgomery: inputs in mont domain -> output mont domain
    am = nt.to_montgomery_host(a, p)
    bm = nt.to_montgomery_host(b, p)
    got = np.asarray(mont_mul(jnp.asarray(am), jnp.asarray(bm), pj,
                              jnp.uint32(mc["neg_p_inv"])))
    got_plain = nt.from_montgomery_host(got, p)
    want = (a.astype(object) * b.astype(object) % p).astype(np.uint64)
    np.testing.assert_array_equal(got_plain.astype(np.uint64), want)
    # shoup: mont-domain x times plain constant keeps mont domain
    w = int(b[0])
    w_sh = (w << 32) // p
    got2 = np.asarray(shoup_mul(jnp.asarray(am), jnp.uint32(w),
                                jnp.uint32(w_sh), pj))
    got2_plain = nt.from_montgomery_host(got2, p)
    want2 = (a.astype(object) * w % p).astype(np.uint64)
    np.testing.assert_array_equal(got2_plain.astype(np.uint64), want2)


def test_add_sub_barrett():
    p = nt.find_ntt_primes(29, 1, 1 << 10)[0]
    a = rand_u32((512,), p)
    b = rand_u32((512,), p)
    pj = jnp.uint32(p)
    np.testing.assert_array_equal(
        np.asarray(add_mod(jnp.asarray(a), jnp.asarray(b), pj)),
        ((a.astype(np.uint64) + b) % p).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(sub_mod(jnp.asarray(a), jnp.asarray(b), pj)),
        ((a.astype(np.uint64) + p - b) % p).astype(np.uint32))
    x = rand_u32((512,), 1 << 32)
    pb = jnp.uint32((1 << 32) // p)
    np.testing.assert_array_equal(
        np.asarray(barrett_reduce_u32(jnp.asarray(x), pj, pb)),
        (x.astype(np.uint64) % p).astype(np.uint32))


@pytest.mark.parametrize("logn", [3, 8, 11])
def test_ntt_roundtrip(logn):
    n = 1 << logn
    primes = nt.find_ntt_primes(30, 3, n)
    ctx = NttContext(primes, n)
    a = np.stack([rand_u32((n,), p) for p in primes])
    aj = jnp.asarray(a)
    back = np.asarray(ntt_inv(ntt_fwd(aj, ctx), ctx))
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize("logn", [3, 6])
def test_ntt_negacyclic_convolution(logn):
    n = 1 << logn
    p = nt.find_ntt_primes(28, 1, n)[0]
    ctx = NttContext([p], n)
    mc = nt.montgomery_constants(p)
    a = rand_u32((n,), p)
    b = rand_u32((n,), p)
    # device path in montgomery domain
    am = nt.to_montgomery_host(a, p)[None, :]
    bm = nt.to_montgomery_host(b, p)[None, :]
    fa = ntt_fwd(jnp.asarray(am), ctx)
    fb = ntt_fwd(jnp.asarray(bm), ctx)
    fc = mont_mul(fa, fb, jnp.uint32(p), jnp.uint32(mc["neg_p_inv"]))
    c = np.asarray(ntt_inv(fc, ctx))[0]
    c_plain = nt.from_montgomery_host(c, p)
    want = negacyclic_convolve_reference(a, b, p)
    np.testing.assert_array_equal(c_plain, want)


def test_ntt_batched_shapes():
    n = 1 << 5
    primes = nt.find_ntt_primes(28, 2, n)
    ctx = NttContext(primes, n)
    a = np.stack([np.stack([rand_u32((n,), p) for p in primes])
                  for _ in range(3)])  # [3, L, n]
    back = np.asarray(ntt_inv(ntt_fwd(jnp.asarray(a), ctx), ctx))
    np.testing.assert_array_equal(back, a)
