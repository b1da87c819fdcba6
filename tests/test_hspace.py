"""h-space / skip-connection semantic-editing hook tests.

(reference machinery: inversion_utils.py extract_h_space / hspace_replace /
zero_out_resconns; models.py:336-361 UNet surgery hooks.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.editing.invert import (
    inversion_forward_process,
    inversion_reverse_process,
)
from audioeditingcode_tpu.models.registry import load_model


@pytest.fixture(scope="module")
def pipe():
    return load_model("test/tiny-audioldm", num_diffusion_steps=5, latent_time=16)


@pytest.fixture(scope="module")
def conds(pipe):
    return pipe.encode_text([""], negative=True), pipe.encode_text(["a flute"])


def test_forward_collects_hspace(pipe, conds):
    uncond, cond = conds
    den = pipe.make_hooked_denoiser(uncond, cond, cfg_scalar=3.0,
                                    return_hspace=True)
    w0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 32))
    _, zs, xts, hspaces = inversion_forward_process(
        pipe.sched, den, w0, jax.random.PRNGKey(1), return_hspace=True
    )
    assert hspaces.shape[0] == 5
    assert np.isfinite(np.asarray(hspaces)).all()


def test_hspace_replace_with_own_values_is_identity(pipe, conds):
    """On the uncond-only path the collected h-space IS the stream's h, so
    replacing with it must not change the output — validates the per-step
    indexing and replacement plumbing exactly. (With CFG the collected h is
    the combined one, so replacement intentionally alters both streams,
    like the reference.)"""
    uncond, _ = conds
    w0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 32))
    den = pipe.make_hooked_denoiser(uncond, None, cfg_scalar=3.0,
                                    return_hspace=True)
    _, zs, xts, _ = inversion_forward_process(
        pipe.sched, den, w0, jax.random.PRNGKey(1), return_hspace=True
    )
    out_plain, hs_rev = inversion_reverse_process(
        pipe.sched, den, xts, zs, return_hspace=True
    )
    # hs_rev is ordered by scan iteration it (k = S-T+it); per-step hook
    # arrays are indexed at k - k0 with k0 = S - T = 0 here
    rep_den = pipe.make_hooked_denoiser(
        uncond, None, cfg_scalar=3.0, k0=0, hspace_replace=hs_rev[:, 0],
    )
    out_rep = inversion_reverse_process(pipe.sched, rep_den, xts, zs)
    np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out_plain),
                               atol=1e-5)


def test_zero_out_resconns_changes_output(pipe, conds):
    uncond, cond = conds
    w0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 32))
    den = pipe.make_denoiser(uncond, None, None)
    _, zs, xts = inversion_forward_process(pipe.sched, den, w0,
                                           jax.random.PRNGKey(1))
    plain = inversion_reverse_process(pipe.sched, den, xts, zs)
    zden = pipe.make_hooked_denoiser(uncond, None, cfg_scalar=3.0,
                                     zero_out_resconns=1)
    zeroed = inversion_reverse_process(pipe.sched, zden, xts, zs)
    assert not np.allclose(np.asarray(plain), np.asarray(zeroed))


def test_hspace_add_changes_output(pipe, conds):
    uncond, cond = conds
    w0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 32))
    den = pipe.make_hooked_denoiser(uncond, cond, cfg_scalar=3.0,
                                    return_hspace=True)
    _, zs, xts, hs = inversion_forward_process(
        pipe.sched, den, w0, jax.random.PRNGKey(1), return_hspace=True
    )
    base_den = pipe.make_hooked_denoiser(uncond, cond, cfg_scalar=3.0)
    base = inversion_reverse_process(pipe.sched, base_den, xts, zs)
    add_den = pipe.make_hooked_denoiser(uncond, cond, cfg_scalar=3.0,
                                        hspace_add=hs[:, 0] * 0.5)
    added = inversion_reverse_process(pipe.sched, add_den, xts, zs)
    assert not np.allclose(np.asarray(base), np.asarray(added))
