"""Client-side key generation, encryption and decryption (host numpy).

Implements the OpenFHE surface the reference consumes: KeyGen,
EvalMultKeyGen (relinearization), EvalRotateKeyGen (Galois keys), Encrypt,
Decrypt (reference test setup: /root/reference/tests/DirectSortTest.cpp:27-57).

Hybrid key-switching keys: the q-chain is split into `dnum` digits of
`alpha` primes; `alpha` special primes P extend the basis.  Key for secret
s' under s, digit j:

    ksk_j = (b_j, a_j),  b_j = -a_j s + e_j + P * W_j * s'  (mod QP)

with W_j = (Q/D_j) * [(Q/D_j)^{-1}]_{D_j} the CRT reconstruction weight of
digit j.  All key material is shipped to the device in NTT + Montgomery
form, shaped [dnum, 2, num_rows, n] with rows = q primes then special
primes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import nt
from .host_poly import (
    host_ntt, sample_ternary, sample_gaussian, rns_to_centered_bigint,
)
from .params import CkksParams


def _to_mont(x: np.ndarray, p: int) -> np.ndarray:
    r = (1 << 32) % p
    return (x.astype(np.uint64) * r % p)


def _ntt_all(coeffs_signed: np.ndarray, primes: list[int], n: int,
             mont: bool = True) -> np.ndarray:
    """Small signed poly -> [len(primes), n] u64 NTT (+Montgomery) domain."""
    out = np.empty((len(primes), n), dtype=np.uint64)
    for i, p in enumerate(primes):
        r = (coeffs_signed % p).astype(np.uint64)
        r = host_ntt(p, n).fwd(r)
        out[i] = _to_mont(r, p) if mont else r
    return out


class SecretKey:
    def __init__(self, params: CkksParams, rng: np.random.Generator):
        self.params = params
        self.s_coeffs = sample_ternary(params.n, rng)
        # NTT (plain-domain) secret residues per prime, for fast host ops
        self.s_ntt = {}
        for p in params.all_primes:
            r = (self.s_coeffs % p).astype(np.uint64)
            self.s_ntt[p] = host_ntt(p, params.n).fwd(r)


class KeyGenerator:
    """Generates all key material; holds the secret (client side only)."""

    def __init__(self, params: CkksParams, seed: int | None = None):
        self.params = params
        self.rng = np.random.default_rng(
            params.cfg.seed if seed is None else seed)
        self.sk = SecretKey(params, self.rng)
        self._pk = self._gen_public_key()

    # ---------------- public / encryption keys ----------------
    def _gen_public_key(self):
        P = self.params
        n = P.n
        qs = P.q
        e = sample_gaussian(n, P.cfg.sigma, self.rng)
        b = np.empty((len(qs), n), dtype=np.uint64)
        a = np.empty((len(qs), n), dtype=np.uint64)
        for i, p in enumerate(qs):
            ai = self.rng.integers(0, p, size=n, dtype=np.uint64)  # NTT dom
            s = self.sk.s_ntt[p]
            en = host_ntt(p, n).fwd((e % p).astype(np.uint64))
            bi = (p - ai * s % p + en) % p
            b[i] = bi
            a[i] = ai
        return b, a

    # ---------------- key switching keys ----------------
    def _digit_indices(self) -> list[list[int]]:
        P = self.params
        nq = len(P.q)
        alpha = P.alpha
        return [list(range(j * alpha, min((j + 1) * alpha, nq)))
                for j in range(-(-nq // alpha))]

    def gen_ksk(self, s_prime_coeffs: np.ndarray) -> np.ndarray:
        """Key switching key for s' -> s.  Returns u32
        [dnum, 2, nq + nsp, n] in NTT+Montgomery domain."""
        P = self.params
        n = P.n
        qs = P.q
        sp = P.p_special
        rows = qs + sp
        digits = self._digit_indices()
        dnum = len(digits)
        Pint = P.P_int
        Q = 1
        for q in qs:
            Q *= q

        out = np.empty((dnum, 2, len(rows), n), dtype=np.uint32)
        for j, dig in enumerate(digits):
            Dj = 1
            for i in dig:
                Dj *= qs[i]
            Dhat = Q // Dj
            Wj = Dhat * nt.mod_inverse(Dhat % Dj, Dj)  # mod Q reconstruction
            e = sample_gaussian(n, P.cfg.sigma, self.rng)
            for r, p in enumerate(rows):
                hp = host_ntt(p, n)
                a = self.rng.integers(0, p, size=n, dtype=np.uint64)
                s = self.sk.s_ntt[p]
                en = hp.fwd((e % p).astype(np.uint64))
                spn = hp.fwd((s_prime_coeffs % p).astype(np.uint64))
                w = (Pint % p) * (Wj % p) % p
                b = (p - a * s % p + en + np.uint64(w) * spn % p) % p
                out[j, 0, r] = _to_mont(b, p).astype(np.uint32)
                out[j, 1, r] = _to_mont(a, p).astype(np.uint32)
        return out

    def gen_relin_key(self) -> np.ndarray:
        # s^2 mod (X^n + 1) has coefficients bounded by n < p/2, so a single
        # NTT prime recovers them exactly via centered lift.
        s2 = _negacyclic_square_int(self.sk.s_coeffs, self.params.q[0],
                                    self.params.n)
        return self.gen_ksk(s2)

    def gen_rotation_key(self, g: int) -> np.ndarray:
        """Galois key for element g (sigma_g(s) -> s)."""
        from .encoding import automorphism_index_table
        src, sign = automorphism_index_table(self.params.n, g)
        s_rot = sign * self.sk.s_coeffs[src]
        return self.gen_ksk(s_rot)

    @property
    def public_key(self):
        return self._pk


def _negacyclic_square_int(s: np.ndarray, p: int, n: int) -> np.ndarray:
    """Exact s*s mod (X^n+1) for ternary s via one NTT prime + centered lift
    (coefficients are bounded by n << p/2)."""
    hp = host_ntt(p, n)
    sn = hp.fwd((s % p).astype(np.uint64))
    s2 = hp.inv(sn * sn % p).astype(np.int64)
    return np.where(s2 > p // 2, s2 - p, s2)


class Encryptor:
    """Public-key encryptor (host side)."""

    def __init__(self, params: CkksParams, public_key, rng=None):
        self.params = params
        self.pk = public_key
        self.rng = rng or np.random.default_rng(params.cfg.seed + 1)

    def encrypt_coeffs(self, coeffs: np.ndarray) -> np.ndarray:
        """Integer coefficient poly (float64 or object) -> [2, nq, n] u32
        NTT+Montgomery ciphertext data at full level."""
        P = self.params
        n = P.n
        qs = P.q
        b, a = self.pk
        u = sample_ternary(n, self.rng)
        e0 = sample_gaussian(n, P.cfg.sigma, self.rng)
        e1 = sample_gaussian(n, P.cfg.sigma, self.rng)
        out = np.empty((2, len(qs), n), dtype=np.uint32)
        for i, p in enumerate(qs):
            hp = host_ntt(p, n)
            un = hp.fwd((u % p).astype(np.uint64))
            e0n = hp.fwd((e0 % p).astype(np.uint64))
            e1n = hp.fwd((e1 % p).astype(np.uint64))
            if coeffs.dtype == object:
                mc = (coeffs % p).astype(np.uint64)
            else:
                r = np.fmod(coeffs, float(p))
                mc = np.where(r < 0, r + p, r).astype(np.uint64)
            mn = hp.fwd(mc)
            c0 = (b[i] * un + e0n + mn) % p
            c1 = (a[i] * un + e1n) % p
            out[0, i] = _to_mont(c0, p).astype(np.uint32)
            out[1, i] = _to_mont(c1, p).astype(np.uint32)
        return out


class Decryptor:
    """Secret-key decryptor (host side, client/debug only)."""

    def __init__(self, params: CkksParams, sk: SecretKey):
        self.params = params
        self.sk = sk

    def decrypt_to_coeffs(self, data: np.ndarray, num_limbs: int,
                          max_limbs: int = 3) -> np.ndarray:
        """[>=2, limbs, n] u32 NTT+Mont ciphertext -> centered big-int
        coefficient array (object dtype).  Uses only the first
        min(num_limbs, max_limbs) limbs (mod-reduction is free)."""
        P = self.params
        n = P.n
        use = min(num_limbs, max_limbs)
        limbs = np.empty((use, n), dtype=np.uint64)
        k = data.shape[0]
        for i in range(use):
            p = P.q[i]
            hp = host_ntt(p, n)
            rinv = nt.mod_inverse((1 << 32) % p, p)
            acc = data[0, i].astype(np.uint64) * rinv % p
            spow = self.sk.s_ntt[p]
            si = spow.copy()
            for comp in range(1, k):
                ci = data[comp, i].astype(np.uint64) * rinv % p
                acc = (acc + ci * si) % p
                if comp + 1 < k:
                    si = si * spow % p
            limbs[i] = hp.inv(acc)
        return rns_to_centered_bigint(limbs, P.q[:use])
