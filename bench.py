"""TPU benchmark: encrypted sort wall-clock vs the reference baseline.

Run on the real TPU chip (driver entry: `python bench.py`).  Prints ONE
JSON line on stdout:

    {"metric": ..., "value": <seconds>, "unit": "s", "vs_baseline": <r>, ...}

vs_baseline = ours / reference  (< 1.0 means faster than the baseline).
Baseline numbers are the reference's own recorded experiments
(/root/reference/comparison/experimental_results/ours_hybrid1/total_results.txt,
summarised in BASELINE.md): hybrid1 encrypted sort, OpenFHE ring 2^17,
HEStd_128_classic, avg of 10 trials.

All diagnostics (NTT throughput, per-phase timing, memory, error) go to
stderr so the stdout contract stays one line.

Env knobs:
  BENCH_ALGO   sort pipeline (default hybrid1; hybrid/hybrid2/direct)
  BENCH_N      array size    (default 16)
  BENCH_RING   log2 ring dim (default 17 — the reference's full-fidelity ring)
  BENCH_TRIALS timed trials  (default 2; first doubles as compile warm-up)
  BENCH_SORT   set 0 to skip the sort and emit the NTT metric instead
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Reference hybrid1 averages (BASELINE.md table; seconds)
BASELINE_HYBRID1 = {4: 26.69, 8: 36.25, 16: 37.03, 32: 52.14, 64: 56.93,
                    128: 74.12, 256: 93.53, 512: 178.87, 1024: 406.93}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(arr):
    """Force a device->host round trip.  block_until_ready alone can
    return early through the remote-TPU tunnel; fetching bytes cannot."""
    arr.block_until_ready()
    np.asarray(jax.device_get(arr[(0,) * (arr.ndim - 1)][:8]))


def device_mem_gb():
    try:
        st = jax.devices()[0].memory_stats()
        return {"in_use_gb": st.get("bytes_in_use", 0) / 1e9,
                "peak_gb": st.get("peak_bytes_in_use", 0) / 1e9}
    except Exception:
        return {}


def ntt_bench(ring_log: int):
    """Pallas NTT throughput at full-fidelity ring size."""
    from sorting_fhe_tpu.core import nt
    from sorting_fhe_tpu.core.ntt import NttContext
    from sorting_fhe_tpu.core.pallas_ntt import ntt_fwd_pallas
    import jax.numpy as jnp

    n = 1 << ring_log
    L = 64
    # 30-bit primes: dense enough (≡1 mod 2n candidates) at every ring
    # size up to 2^17; 26-bit primes run out above ring 2^15.
    primes = nt.find_ntt_primes(30, L, n)
    ctx = NttContext(primes, n)
    pk = ctx.pallas_tables()
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack([
        rng.integers(0, p, size=n, dtype=np.uint64).astype(np.uint32)
        for p in primes])).reshape(1, L, n)
    rows = jnp.asarray(np.arange(L, dtype=np.int32))
    f = jax.jit(lambda y: ntt_fwd_pallas(y, pk, rows))
    t0 = time.time()
    o = f(x)
    sync(o)
    log(f"[ntt] compile+run {time.time()-t0:.1f}s")
    reps = 20
    sync(f(x))
    t0 = time.time()
    for _ in range(reps):
        o = f(x)
    sync(o)
    dt = (time.time() - t0) / reps
    rate = L / dt
    log(f"[ntt] {rate:,.0f} limb-NTTs/s at n=2^{ring_log} "
        f"({dt*1e3:.2f} ms per {L}-limb poly)")
    return {"metric": f"ntt_limb_transforms_per_s_ring2e{ring_log}",
            "value": round(rate, 1), "unit": "1/s", "vs_baseline": None}


def sort_bench(algo: str, N: int, ring_log: int, trials: int):
    from sorting_fhe_tpu.core.ckks import CkksContext
    from sorting_fhe_tpu.models.direct_sort import DirectSort
    from sorting_fhe_tpu.registry import (get_params, full_config,
                                          security_check)
    from sorting_fhe_tpu.utils.testvec import vector_with_min_diff

    p = get_params(algo, N)
    cfg = full_config(p, ring_dim=1 << ring_log)
    t0 = time.time()
    ctx = CkksContext(cfg)
    log(f"[setup] context {time.time()-t0:.1f}s: {ctx.params.describe()} "
        f"backend={ctx.backend}")
    logqp, limit, ok = security_check(cfg, ctx.params)
    log(f"[setup] security logQP={logqp} HEStd-128c-limit={limit} ok={ok}")

    t0 = time.time()
    ds = DirectSort(ctx, N, rot_indices=list(p.rotations))
    log(f"[setup] rotation keys ({len(ctx.rot_keys)}) {time.time()-t0:.1f}s "
        f"{device_mem_gb()}")

    rng = np.random.default_rng(42)
    v = vector_with_min_diff(N, 0, 1, 1.0 / N, rng)
    t0 = time.time()
    ct = ctx.encrypt(v, slots=N)
    log(f"[setup] encrypt {time.time()-t0:.1f}s")

    sort_fn = {"direct": ds.sort, "hybrid": ds.sort_hybrid,
               "hybrid1": ds.sort_hybrid1, "hybrid2": ds.sort_hybrid2}[algo]
    cfg_sign = p.sign_config()

    times = []
    max_err = None
    for t in range(trials):
        t0 = time.time()
        out = sort_fn(ct, cfg_sign)
        sync(out.data)
        dt = time.time() - t0
        times.append(dt)
        log(f"[sort] trial {t}: {dt:.2f}s  mults={ctx.mult_count} "
            f"rots={ctx.rot_count}  {device_mem_gb()}")
        if t == 0:
            got = ctx.decrypt(out)[:N]
            want = np.sort(v)
            max_err = float(np.abs(got - want).max())
            log(f"[sort] max_err={max_err:.3e} "
                f"(log2={np.log2(max(max_err, 1e-300)):.2f}; gate 0.01)")
    best = min(times)
    base = BASELINE_HYBRID1.get(N) if algo == "hybrid1" else None
    return {"metric": f"encrypted_sort_{algo}_N{N}_ring2e{ring_log}",
            "value": round(best, 3), "unit": "s",
            "vs_baseline": round(best / base, 4) if base else None,
            "baseline_s": base, "max_err": max_err,
            "trials": [round(x, 3) for x in times],
            "security_logqp": logqp, "security_ok": ok}


def main():
    algo = os.environ.get("BENCH_ALGO", "hybrid1")
    N = int(os.environ.get("BENCH_N", "16"))
    ring_log = int(os.environ.get("BENCH_RING", "17"))
    trials = int(os.environ.get("BENCH_TRIALS", "2"))
    log(f"[bench] devices={jax.devices()} algo={algo} N={N} "
        f"ring=2^{ring_log} trials={trials}")

    result = None
    try:
        ntt = ntt_bench(ring_log)
    except Exception as e:          # pragma: no cover - defensive
        log(f"[ntt] FAILED: {e!r}")
        ntt = None

    if os.environ.get("BENCH_SORT", "1") != "0":
        try:
            result = sort_bench(algo, N, ring_log, trials)
        except Exception as e:      # pragma: no cover - defensive
            import traceback
            traceback.print_exc(file=sys.stderr)
            log(f"[sort] FAILED: {e!r}")

    print(json.dumps(result or ntt))


if __name__ == "__main__":
    main()
