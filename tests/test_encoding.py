"""Canonical-embedding encode/decode and NTT-domain convention tests.

Covers the layer the reference delegates to OpenFHE's MakeCKKSPackedPlaintext
(/root/reference/src/encryption.cpp:5-12) plus the NTT-domain exponent
convention that `encoding.ntt_domain_exponents` documents: slot j of the
bit-reversed CT NTT output holds f(psi^{2*brv(j)+1}).
"""

import numpy as np
import pytest

from sorting_fhe_tpu.core import encoding, nt


@pytest.mark.parametrize("n", [32, 128, 1024])
def test_encode_decode_roundtrip(n):
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, n // 2)
    scale = 2.0 ** 40
    coeffs = encoding.encode_real(v, n, scale)
    assert coeffs.dtype == np.float64
    assert np.all(coeffs == np.rint(coeffs))
    got = encoding.decode_real(coeffs, n, scale)
    np.testing.assert_allclose(got, v, atol=n / scale)


def test_encode_decode_complex_roundtrip():
    n = 64
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    scale = 2.0 ** 40
    coeffs = encoding.encode_real(v, n, scale)
    got = encoding.decode_real(coeffs, n, scale, complex_out=True)
    np.testing.assert_allclose(got, v, atol=n / scale)


@pytest.mark.parametrize("slots", [4, 8, 16])
def test_encode_slots_replication(slots):
    """slots < n/2 encodes the vector replicated n/(2*slots) times: the
    SetSlots reinterpretation (sort_algo.h:429) is pure metadata."""
    n = 64
    rng = np.random.default_rng(2)
    v = rng.uniform(-1, 1, slots)
    scale = 2.0 ** 40
    coeffs = encoding.encode_real(v, n, scale, slots)
    full = encoding.decode_real(coeffs, n, scale)          # all n/2 slots
    for r in range(n // 2 // slots):
        np.testing.assert_allclose(full[r * slots:(r + 1) * slots], v,
                                   atol=n / scale)
    # the SetSlots(s) view decodes to the original vector
    view = encoding.decode_real(coeffs, n, scale, slots)
    np.testing.assert_allclose(view, v, atol=n / scale)


def test_ntt_domain_exponent_convention():
    """slot j of ntt_fwd_t's output holds f(psi^{exp_tab[j]}): the claim
    ntt_domain_exponents' docstring makes, checked against a direct
    polynomial evaluation mod p."""
    from sorting_fhe_tpu.core.ntt import NttContext
    import jax.numpy as jnp

    n = 64
    primes = nt.find_ntt_primes(30, 1, n)
    p = int(primes[0])
    ctx = NttContext(primes, n)

    rng = np.random.default_rng(3)
    a = rng.integers(0, p, size=n, dtype=np.uint64)

    R = 1 << 32
    # to Montgomery domain, transform, back to plain
    am = (a * R % p).astype(np.uint32)
    from sorting_fhe_tpu.core.ntt import ntt_fwd_t
    out = np.asarray(ntt_fwd_t(jnp.asarray(am[None]), ctx.p[:1],
                               ctx.psi[:1], ctx.psi_sh[:1]))[0]
    rinv = nt.mod_inverse(R % p, p)
    out_plain = (out.astype(np.uint64) * rinv) % p

    # psi: the primitive 2n-th root the table builder uses
    # (deterministic for a given (p, n) -- nt.make_ntt_tables:173)
    psi = nt.root_of_unity(2 * n, p)
    exps = encoding.ntt_domain_exponents(n)
    for j in rng.choice(n, size=8, replace=False):
        e = int(exps[j])
        x = pow(psi, e, p)
        val = 0
        for i in range(n):
            val = (val + int(a[i]) * pow(x, i, p)) % p
        assert val == int(out_plain[j]), (j, e)


def test_galois_element_rotation_consistency():
    """sigma_g with g = 5^k mod 2n left-rotates slots by k: decode o
    automorphism o encode == np.roll(v, -k)."""
    n = 64
    k = 3
    scale = 2.0 ** 40
    rng = np.random.default_rng(4)
    v = rng.uniform(-1, 1, n // 2)
    coeffs = encoding.encode_real(v, n, scale)
    g = encoding.galois_element_for_rotation(n, k)
    src, sign = encoding.automorphism_index_table(n, g)
    rotated = sign * coeffs[src]
    got = encoding.decode_real(rotated, n, scale)
    np.testing.assert_allclose(got, np.roll(v, -k), atol=n / scale)
