"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; following the reference-rebuild
test strategy (SURVEY.md §4), all tests run on CPU with
``--xla_force_host_platform_device_count=8`` so mesh/sharding tests exercise
real collectives. Must run before the first jax import.
"""

import os

# Hard override: the ambient environment pins JAX_PLATFORMS=axon (one real
# TPU chip); tests must run on the virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is overridden by the preloaded axon plugin; the config
# update below is what actually pins the backend to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
