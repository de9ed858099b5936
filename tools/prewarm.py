"""AOT prewarm sidecar: compile the per-bucket CKKS kernels into the
shared persistent XLA cache (~/.cache/sorting_fhe_tpu_jax) concurrently
with the main bench process's setup.

    python tools/prewarm.py <algo> <N> <ring_log> <shard> <nshards>

Strategy: kernels are lowered from ShapeDtypeStructs — no key material, no
device constants, no twiddle uploads — so a sidecar costs only host table
math plus the XLA/Mosaic compile itself.  The persistent cache is keyed on
the serialized HLO, which depends only on shapes + static pytree structure,
so entries written here are exact hits for the main process (round-3
sidecar pattern, ROUND3_NOTES.md).

Buckets are processed HIGHEST-first (the sort descends the chain from nq,
so the main process needs high buckets first), round-robin across shards.
"""

import os
import sys

# launched as `python tools/prewarm.py` — sys.path[0] is tools/, so the
# package root must be added explicitly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sorting_fhe_tpu  # noqa: F401  (persistent cache config)
import jax


def sds_like(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree)


def main():
    algo, N, ring_log, shard, nshards = sys.argv[1:6]
    N, ring_log, shard, nshards = map(int, (N, ring_log, shard, nshards))

    from sorting_fhe_tpu.core import ckks as C
    from sorting_fhe_tpu.core.params import CkksParams
    from sorting_fhe_tpu.registry import get_params, full_config

    p = get_params(algo, N)
    cfg = full_config(p, ring_dim=1 << ring_log)
    # Pin table construction to the host CPU backend: the table VALUES are
    # irrelevant (lowering uses ShapeDtypeStructs) and a sidecar must not
    # push ~0.5 GB of twiddles through the TPU tunnel / into HBM.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        P = CkksParams(cfg)
    backend = "pallas" if jax.default_backend() == "tpu" else \
        C._resolve_backend(cfg.ntt_backend)
    n = P.n
    nq = P.nq
    ksp = P.num_special
    comp = P.comp
    base = P.base_limbs

    pad = max(1, cfg.limb_pad)
    buckets = sorted({min(nq, -(-l // pad) * pad)
                      for l in range(base + comp, nq + 1)}, reverse=True)
    mine = [b for i, b in enumerate(buckets) if i % nshards == shard]
    print(f"[prewarm {shard}/{nshards}] buckets {mine}", flush=True)

    u32 = np.uint32
    ksk_sds = jax.ShapeDtypeStruct((-(-nq // P.alpha), 2, nq + ksp, n), u32)
    perm_sds = jax.ShapeDtypeStruct((n,), np.int32)

    import time
    for lb in mine:
        t0 = time.time()
        with jax.default_device(cpu):
            T = C._LevelTables(P, lb, backend)
            npi_rows = np.concatenate([np.arange(lb),
                                       np.arange(nq, nq + ksp)])
            T.ext_npi = P.mont_neg_p_inv[npi_rows]
            T.q_npi = P.mont_neg_p_inv[:lb]
        Ts = sds_like(T)
        ndig = T.ndig
        d2 = jax.ShapeDtypeStruct((2, lb, n), u32)
        d1 = jax.ShapeDtypeStruct((lb, n), u32)
        pre = jax.ShapeDtypeStruct((ndig, lb + ksp, n), u32)
        row = jax.ShapeDtypeStruct((lb,), u32)
        scal = jax.ShapeDtypeStruct((), u32)
        steps = tuple(
            (jax.ShapeDtypeStruct((), np.int32), scal, scal, scal, scal,
             row, row, row) for _ in range(comp))
        jobs = [
            ("mult_relin", lambda: C._kj_mult_relin.lower(
                d2, d2, ksk_sds, Ts)),
            ("square_relin", lambda: C._kj_square_relin.lower(
                d2, ksk_sds, Ts)),
            ("decompose", lambda: C._kj_decompose.lower(d1, Ts)),
            ("fast_rotate", lambda: C._kj_fast_rotate.lower(
                d2, pre, ksk_sds, perm_sds, Ts)),
            ("rescale", lambda: C._kj_rescale.lower(d2, steps, Ts)),
            ("encode", lambda: C._kj_encode.lower(d1, row, row, Ts)),
        ]
        for name, lower in jobs:
            t1 = time.time()
            try:
                lower().compile()
                print(f"[prewarm {shard}] {name}@{lb} "
                      f"{time.time()-t1:.1f}s", flush=True)
            except Exception as e:
                print(f"[prewarm {shard}] {name}@{lb} FAILED {e!r}",
                      flush=True)
        print(f"[prewarm {shard}] bucket {lb} done {time.time()-t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
