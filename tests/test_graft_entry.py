"""Driver-hook regression tests for __graft_entry__.

dryrun_multichip must self-provision its virtual device mesh from a FRESH
process with no env setup (the driver invokes it under a single-chip
backend; round 1 failed exactly here). Run in a subprocess because the
provisioning config must land before any backend initialization — the
pytest process already owns an 8-device CPU backend.
"""

import os
import pytest
import subprocess
import sys


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # force a CPU-only view so the subprocess cannot see any TPU plugin:
    # the point is that dryrun provisions the 8 virtual devices ITSELF
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK: mesh=" in out.stdout, out.stdout[-500:]
    # the sequence-parallel section must run on an 8-device mesh
    assert "sp edit on mesh=" in out.stdout, out.stdout[-500:]


def test_entry_compiles_single_device():
    """entry() must return a jittable fn + example args (driver contract);
    compile-check via jax.jit(...).lower on this process's CPU backend."""
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import entry

    fn, args = entry()
    jax.jit(fn).lower(*args)  # trace+lower only: no heavy execution
