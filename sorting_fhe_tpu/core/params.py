"""CKKS crypto parameters and precomputed RNS tables.

One `CkksParams` object plays the role of OpenFHE's CryptoContext parameter
block for the reference (/root/reference/src/sort_algo.h:87-201 sets
multiplicative depth / scaling mod size / batch size; OpenFHE derives the
prime chain).  Here we generate the chain ourselves:

* q_0 .. q_L        "ciphertext" primes: q_0 is the large base prime
                    (decryption headroom), q_1..q_L are rescaling primes
                    close to 2^scale_bits.
* p_0 .. p_{k-1}    special primes for hybrid key switching.

All primes are NTT-friendly (≡ 1 mod 2n) and < 2^31 so device arithmetic
stays in uint32 (see rns.py).  The reference uses 40-60 bit primes via
OpenFHE; on TPU the uint32 RNS with more limbs is the hardware-native
choice (no 64-bit integer datapath).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from . import nt
from .ntt import NttContext


@dataclass(frozen=True)
class CkksConfig:
    """User-facing knobs, analogous to CCParams<CryptoContextCKKSRNS>."""
    ring_dim: int = 1 << 13
    mult_depth: int = 10
    scale_bits: int = 28          # rescaling prime size (~ scaling factor)
    first_mod_bits: int = 30      # q_0 size (decryption headroom)
    dnum: int = 3                 # hybrid key-switch digit count
    num_special_primes: int | None = None  # default: ceil((L+1)/dnum)
    seed: int = 2024
    sigma: float = 3.19           # error stddev
    batch_size: int | None = None  # default n/2 slots


class CkksParams:
    """Derived parameter set + device-resident tables."""

    def __init__(self, cfg: CkksConfig):
        self.cfg = cfg
        n = cfg.ring_dim
        self.n = n
        self.num_slots = cfg.batch_size or (n // 2)
        L = cfg.mult_depth          # number of rescaling primes
        self.L = L

        # prime chain: q0 (first_mod_bits), then L primes at scale_bits
        q0 = nt.find_ntt_primes(cfg.first_mod_bits, 1, n)
        qs = nt.find_ntt_primes(cfg.scale_bits, L, n, avoid=tuple(q0))
        self.q: list[int] = q0 + qs          # level i uses q[0..i]

        alpha = -(-(L + 1) // cfg.dnum)      # limbs per digit
        k = cfg.num_special_primes or alpha
        self.alpha = alpha
        self.num_special = k
        # special primes: as large as possible (< 2^31) to minimize their
        # count's noise contribution
        self.p_special: list[int] = nt.find_ntt_primes(
            30, k, n, avoid=tuple(self.q))

        self.all_primes: list[int] = self.q + self.p_special
        self.ntt = NttContext(self.all_primes, n)

        # Montgomery constants per prime, as device arrays [num_primes]
        mont = [nt.montgomery_constants(p) for p in self.all_primes]
        self.mont_neg_p_inv = jnp.asarray(
            np.array([m["neg_p_inv"] for m in mont], dtype=np.uint32))
        self.primes_dev = jnp.asarray(
            np.array(self.all_primes, dtype=np.uint32))
        self.r2 = [m["r2"] for m in mont]

        # P mod q_i and P^{-1} mod q_i for ModDown
        P = 1
        for p in self.p_special:
            P *= p
        self.P_int = P
        self.P_mod_q = [P % q for q in self.q]
        self.P_inv_mod_q = [nt.mod_inverse(P % q, q) for q in self.q]

        # canonical scaling factors per level (FLEXIBLEAUTO-style):
        # fresh ciphertexts live at level L with scale ~2^scale_bits; a
        # rescale at level l divides by q_l.  scale_at[l] = canonical scale
        # of a ciphertext whose next rescale will consume q_l.
        self.scale0 = float(self.q[L])  # fresh scale = last rescaling prime
        # Note: evaluator tracks exact scales; this is just the fresh anchor.

        self.Q_int = functools.reduce(lambda a, b: a * b, self.q, 1)

    # ---- host-side helpers ----
    def q_products(self, level: int) -> int:
        """Product of q_0..q_level."""
        out = 1
        for i in range(level + 1):
            out *= self.q[i]
        return out

    def describe(self) -> str:
        return (f"CKKS n=2^{self.n.bit_length()-1} L={self.L} "
                f"scale=2^{self.cfg.scale_bits} dnum={self.cfg.dnum} "
                f"|q|={len(self.q)} |p|={len(self.p_special)} "
                f"logQP={sum(p.bit_length() for p in self.all_primes)}")
