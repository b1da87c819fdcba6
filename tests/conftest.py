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

# Persistent compilation cache for the suite. utils/jax_setup deliberately
# skips XLA:CPU (an AOT executable built on one host can SIGILL on another),
# but the test suite always compiles and runs on the SAME host, so a
# host-keyed cache dir is safe and cuts repeat-suite wall time dramatically
# (identical tiny-model edit graphs recompile in every test otherwise).
# XLA logs a loud machine-feature warning for the prefer-no-scatter/gather
# tuning pseudo-features when loading; on-host reuse is unaffected.
import platform  # noqa: E402

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_test_cache", platform.node())
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
