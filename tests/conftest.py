"""Test environment: force local CPU with a virtual 8-device mesh.

The session environment pins an `axon` TPU tunnel as the default JAX
backend (sitecustomize re-registers it in every interpreter and overrides
JAX_PLATFORMS via jax.config).  Unit tests must neither use nor *touch*
the tunnel — initializing the axon backend can hang if the remote grant is
unavailable — so we re-pin jax_platforms to cpu before any backend is
instantiated.  Tests follow the reference's cheap-crypto strategy
(SURVEY.md §4): small rings, no security, CPU; bench.py runs full-fidelity
parameters on the TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# undo the axon sitecustomize override so backends() never dials the tunnel
jax.config.update("jax_platforms", "cpu")

# CPU runs must NOT use the persistent compilation cache at all: XLA:CPU
# AOT executables SEGFAULT on reload in this jaxlib even same-host (the
# loader rejects its own "+prefer-no-scatter" tuning pseudo-features;
# observed as repeated suite crashes inside
# compilation_cache.get_executable_and_time).  CPU compiles are seconds
# each — correctness over startup speed.
jax.config.update("jax_enable_compilation_cache", False)

_CPUS = jax.devices("cpu")
assert len(_CPUS) == 8, _CPUS
jax.config.update("jax_default_device", _CPUS[0])


def cpu_devices():
    return _CPUS
