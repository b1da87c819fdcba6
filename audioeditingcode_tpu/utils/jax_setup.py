"""Process-level JAX configuration: persistent compilation cache.

First compilation of the big editing graphs is minutes-slow on remote-compile
TPU setups; the persistent cache makes every repeat invocation (CLI reruns,
benchmark sweeps, the driver's bench) start in seconds. Enabled by every CLI
entry point and bench.py; override the location with JAX_CACHE_DIR or disable
with JAX_CACHE_DIR=off.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    cache_dir = os.environ.get("JAX_CACHE_DIR")
    if cache_dir == "off":
        return
    if not cache_dir:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "jax_comp")
    try:
        import jax

        # TPU only: XLA:CPU caches AOT executables keyed without host machine
        # features, so a cache written on one host can load (and SIGILL/hang)
        # on another. TPU executables have no such host dependency.
        if jax.default_backend() == "cpu":
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"[jax_setup] compilation cache disabled: {e}")
