"""Pallas TPU kernels for the negacyclic NTT.

Why a kernel: the stage-unrolled XLA NTT makes every fused CKKS op a
multi-thousand-node HLO graph (measured: 18-80 s TPU compiles per op per
limb-count at ring 2^14) and round-trips HBM once per stage.  Here each
grid step loads one RNS limb (512 KB at n=2^17) plus its twiddles into
VMEM and runs all log2(n) butterfly stages on-chip, writing back once.

Layout strategy (Mosaic cannot reshape across the 128-lane axis): the
polynomial is a row-major [R, 128] matrix, R = n/128.
  * Stages with butterfly stride t >= 128 pair whole rows: reshape the row
    axis only — [m, 2, t/128, 128].
  * Stages with stride t < 128 pair elements within a row: transpose to
    [128, R] and the pairing becomes a leading-axis reshape [mc, 2, t, R],
    mc = 128/(2t).
Twiddles for both phases are precomputed host-side into exactly the
broadcastable layouts the kernel consumes (PallasNttTables), so the kernel
does no gathers.

Limb selection: the packs hold ALL primes of the chain ([LP, ...]); each
call passes an int32 `rows` vector (scalar-prefetch) naming which pack
rows the L limbs of the input correspond to.  The BlockSpec index_map
reads rows[l], so arbitrary row subsets (q prefix, ext basis, special
primes) cost no host-side slicing or device copies.

Element ordering is identical to ntt.ntt_fwd_t / ntt_inv_t — enforced by
tests/test_pallas_ntt.py, which asserts bit-equality against the XLA
path — so the two backends are interchangeable behind ckks.py's dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rns import add_mod, sub_mod, shoup_mul

_LANES = 128


def _build_phase_packs(tab: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """tab: [n] bit-reversed twiddle table (psi_brv or ipsi_brv) for one
    limb.  Returns (p1, p2):
      p1 [n/128, 128]: rows m..2m-1 hold the m twiddles of the stage with
          group count m (m <= n/256), broadcast across lanes (offsets are
          powers of two so sublane slices stay aligned).
      p2 [128, R]:     rows mc..2mc-1 hold within-row stage twiddles,
          p2[mc+cg, r] = tab[R*mc + r*mc + cg]  (global group count R*mc).
    """
    R = n // _LANES
    p1 = np.zeros((R, _LANES), dtype=tab.dtype)
    m = 1
    while 2 * m <= R:            # stages with t >= 128 have m <= n/256
        p1[m:2 * m, :] = tab[m:2 * m, None]
        m *= 2
    p2 = np.zeros((_LANES, R), dtype=tab.dtype)
    mc = 1
    while mc <= 64:
        mg = R * mc              # global group count at stride t = 64/mc
        rr = np.arange(R)
        cg = np.arange(mc)
        p2[mc:2 * mc, :] = tab[mg + rr[None, :] * mc + cg[:, None]]
        mc *= 2
    return p1, p2


@dataclass
class PallasNttTables:
    """Whole-chain twiddle packs for the Pallas kernels (device).

    All arrays carry the full prime chain on their leading axis; kernels
    select rows at runtime via the scalar-prefetched `rows` vector."""
    p: jnp.ndarray           # [LP] int32 (primes < 2^31)
    fwd1: jnp.ndarray        # [LP, R, 128] u32
    fwd1_sh: jnp.ndarray
    fwd2: jnp.ndarray        # [LP, 128, R] u32
    fwd2_sh: jnp.ndarray
    inv1: jnp.ndarray
    inv1_sh: jnp.ndarray
    inv2: jnp.ndarray
    inv2_sh: jnp.ndarray
    n_inv: jnp.ndarray       # [LP] int32
    n_inv_sh: jnp.ndarray    # [LP] int32


def build_pallas_tables(primes, n, psi, psi_sh, ipsi, ipsi_sh,
                        n_inv, n_inv_sh) -> PallasNttTables:
    """Build packs from host copies of the NttContext twiddle tables."""
    L = len(primes)
    R = n // _LANES
    f1 = np.zeros((L, R, _LANES), np.uint32)
    f1s = np.zeros_like(f1)
    f2 = np.zeros((L, _LANES, R), np.uint32)
    f2s = np.zeros_like(f2)
    i1 = np.zeros_like(f1)
    i1s = np.zeros_like(f1)
    i2 = np.zeros_like(f2)
    i2s = np.zeros_like(f2)
    for i in range(L):
        f1[i], f2[i] = _build_phase_packs(psi[i], n)
        f1s[i], f2s[i] = _build_phase_packs(psi_sh[i], n)
        i1[i], i2[i] = _build_phase_packs(ipsi[i], n)
        i1s[i], i2s[i] = _build_phase_packs(ipsi_sh[i], n)
    return PallasNttTables(
        p=jnp.asarray(np.asarray(primes, np.int32)),
        fwd1=jnp.asarray(f1), fwd1_sh=jnp.asarray(f1s),
        fwd2=jnp.asarray(f2), fwd2_sh=jnp.asarray(f2s),
        inv1=jnp.asarray(i1), inv1_sh=jnp.asarray(i1s),
        inv2=jnp.asarray(i2), inv2_sh=jnp.asarray(i2s),
        n_inv=jnp.asarray(np.asarray(n_inv, np.uint32).view(np.int32)),
        n_inv_sh=jnp.asarray(np.asarray(n_inv_sh, np.uint32).view(np.int32)))


def _fwd_kernel(rows_ref, p_ref, x_ref, w1_ref, w1s_ref, w2_ref, w2s_ref,
                o_ref):
    R, LN = x_ref.shape[-2], x_ref.shape[-1]
    n = R * LN
    logn = n.bit_length() - 1
    p = p_ref[rows_ref[pl.program_id(1)]].astype(jnp.uint32)
    x = x_ref[0, 0]                       # [R, 128]
    # phase 1: t >= 128
    for s in range(logn - 7):
        m = 1 << s
        a = x.reshape(m, 2, (n >> (s + 1)) // LN, LN)
        w = w1_ref[0][m:2 * m].reshape(m, 1, LN)
        ws = w1s_ref[0][m:2 * m].reshape(m, 1, LN)
        u = a[:, 0]
        v = shoup_mul(a[:, 1], w, ws, p)
        x = jnp.stack([add_mod(u, v, p), sub_mod(u, v, p)],
                      axis=1).reshape(R, LN)
    # phase 2: t < 128, operate transposed
    xt = x.T                              # [128, R]
    for s in range(logn - 7, logn):
        t = n >> (s + 1)                  # 64 .. 1
        mc = LN // (2 * t)
        a = xt.reshape(mc, 2, t, R)
        w = w2_ref[0][mc:2 * mc].reshape(mc, 1, 1, R)
        ws = w2s_ref[0][mc:2 * mc].reshape(mc, 1, 1, R)
        u = a[:, 0:1]
        v = shoup_mul(a[:, 1:2], w, ws, p)
        xt = jnp.concatenate([add_mod(u, v, p), sub_mod(u, v, p)],
                             axis=1).reshape(LN, R)
    o_ref[0, 0] = xt.T


def _inv_kernel(rows_ref, p_ref, ninv_ref, ninvs_ref, x_ref,
                w1_ref, w1s_ref, w2_ref, w2s_ref, o_ref):
    R, LN = x_ref.shape[-2], x_ref.shape[-1]
    n = R * LN
    logn = n.bit_length() - 1
    r = rows_ref[pl.program_id(1)]
    p = p_ref[r].astype(jnp.uint32)
    # phase A: t = 1..64, transposed domain
    xt = x_ref[0, 0].T                    # [128, R]
    for s in range(7):
        t = 1 << s
        mc = LN // (2 * t)
        a = xt.reshape(mc, 2, t, R)
        w = w2_ref[0][mc:2 * mc].reshape(mc, 1, 1, R)
        ws = w2s_ref[0][mc:2 * mc].reshape(mc, 1, 1, R)
        u = a[:, 0:1]
        v = a[:, 1:2]
        lo = add_mod(u, v, p)
        hi = shoup_mul(sub_mod(u, v, p), w, ws, p)
        xt = jnp.concatenate([lo, hi], axis=1).reshape(LN, R)
    x = xt.T                              # [R, 128]
    # phase B: t >= 128 (group count h = n/256 .. 1)
    for s in range(7, logn):
        h = n >> (s + 1)
        a = x.reshape(h, 2, (1 << s) // LN, LN)
        w = w1_ref[0][h:2 * h].reshape(h, 1, LN)
        ws = w1s_ref[0][h:2 * h].reshape(h, 1, LN)
        u = a[:, 0]
        v = a[:, 1]
        lo = add_mod(u, v, p)
        hi = shoup_mul(sub_mod(u, v, p), w, ws, p)
        x = jnp.stack([lo, hi], axis=1).reshape(R, LN)
    o_ref[0, 0] = shoup_mul(x, ninv_ref[r].astype(jnp.uint32),
                            ninvs_ref[r].astype(jnp.uint32), p)


def _grid_spec(n: int, B: int, L: int, nscalar: int):
    R = n // _LANES
    data = pl.BlockSpec((1, 1, R, _LANES),
                        lambda b, l, *_: (b, l, 0, 0),
                        memory_space=pltpu.VMEM)
    w1 = pl.BlockSpec((1, R, _LANES),
                      lambda b, l, rows, *_: (rows[l], 0, 0),
                      memory_space=pltpu.VMEM)
    w2 = pl.BlockSpec((1, _LANES, R),
                      lambda b, l, rows, *_: (rows[l], 0, 0),
                      memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nscalar,
        grid=(B, L),
        in_specs=[data, w1, w1, w2, w2],
        out_specs=data)


def _compiler_params(n: int):
    """Scoped-VMEM budget: the 17-stage chain at n=2^17 needs ~24 MB of
    stage temporaries (each butterfly pass materialises a handful of
    512 KB u32 intermediates before Mosaic can recycle them); the default
    16 MB scoped limit OOMs, so scale the cap with the ring size."""
    R = n // _LANES
    limb_bytes = R * _LANES * 4
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(100 * 1024 * 1024,
                             max(16, 64 * limb_bytes // (1 << 20)) << 20))


def ntt_fwd_pallas(a: jnp.ndarray, tabs: PallasNttTables, rows: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """a: [..., L, n] -> forward NTT (ordering identical to ntt.ntt_fwd_t).

    rows: int32 [L], pack-row index of each input limb."""
    lead = a.shape[:-2]
    L, n = a.shape[-2], a.shape[-1]
    R = n // _LANES
    a4 = a.reshape((-1, L, R, _LANES))
    B = a4.shape[0]
    out = pl.pallas_call(
        _fwd_kernel,
        grid_spec=_grid_spec(n, B, L, 2),
        out_shape=jax.ShapeDtypeStruct((B, L, R, _LANES), jnp.uint32),
        compiler_params=_compiler_params(n),
        interpret=interpret,
    )(rows, tabs.p, a4, tabs.fwd1, tabs.fwd1_sh, tabs.fwd2, tabs.fwd2_sh)
    return out.reshape(lead + (L, n))


def ntt_inv_pallas(a: jnp.ndarray, tabs: PallasNttTables, rows: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """Inverse negacyclic NTT; rows as in ntt_fwd_pallas."""
    lead = a.shape[:-2]
    L, n = a.shape[-2], a.shape[-1]
    R = n // _LANES
    a4 = a.reshape((-1, L, R, _LANES))
    B = a4.shape[0]
    out = pl.pallas_call(
        _inv_kernel,
        grid_spec=_grid_spec(n, B, L, 4),
        out_shape=jax.ShapeDtypeStruct((B, L, R, _LANES), jnp.uint32),
        compiler_params=_compiler_params(n),
        interpret=interpret,
    )(rows, tabs.p, tabs.n_inv, tabs.n_inv_sh,
      a4, tabs.inv1, tabs.inv1_sh, tabs.inv2, tabs.inv2_sh)
    return out.reshape(lead + (L, n))


jax.tree_util.register_pytree_node(
    PallasNttTables,
    lambda t: ((t.p, t.fwd1, t.fwd1_sh, t.fwd2, t.fwd2_sh,
                t.inv1, t.inv1_sh, t.inv2, t.inv2_sh,
                t.n_inv, t.n_inv_sh), None),
    lambda aux, c: PallasNttTables(*c))
