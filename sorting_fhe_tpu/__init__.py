"""sorting_fhe_tpu: TPU-native CKKS homomorphic sorting framework.

A from-scratch JAX/Pallas rebuild of the capabilities of oksuman/sorting-fhe
(C++/OpenFHE): an RNS-CKKS runtime (uint32 Montgomery RNS, negacyclic NTT,
hybrid key switching, Galois rotations with hoisting, Chebyshev evaluation)
plus the four encrypted-sorting pipelines built on it (direct rank sort,
bitonic, k-way networks, MEHP24 order statistics).

Layout:
  core/      CKKS crypto runtime (the layer the reference gets from OpenFHE)
  ops/       homomorphic primitives: sign, comparison, rotation, coeff gen
  models/    sorting pipelines (direct, hybrid, bitonic, k-way, mehp24)
  parallel/  multi-chip sharding (jax.sharding over ICI/DCN)
  utils/     plaintext oracle context, test vectors, profiling
"""

import os

import jax

# Persistent XLA compilation cache: the op kernels compile once per
# (operation, limb-count) pair; caching them across processes makes
# benchmark and test startup dramatically faster.
_cache_dir = os.environ.get(
    "SORTING_FHE_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "sorting_fhe_tpu_jax"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.4)
except Exception:  # older jax without these flags
    pass

__version__ = "0.1.0"
