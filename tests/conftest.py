"""Test environment: force local CPU with a virtual 8-device mesh.

The session environment pins an `axon` TPU tunnel as the default JAX
backend (and re-registers it in every interpreter via sitecustomize), so
merely setting JAX_PLATFORMS=cpu is not enough — we pin the default device
to the local CPU backend explicitly.  Unit tests follow the reference's
cheap-crypto strategy (SURVEY.md §4): small rings, no security, CPU.
Full-fidelity TPU runs happen in bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

_CPUS = jax.devices("cpu")
assert len(_CPUS) == 8, _CPUS
jax.config.update("jax_default_device", _CPUS[0])


def cpu_devices():
    return _CPUS
