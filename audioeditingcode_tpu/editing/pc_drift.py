"""Unsupervised editing: posterior principal components by power iteration.

Re-design of the reference's pc_drift machinery (code/pc_drift.py):

- ``forward_directional``: one guided DDIM step from xt + a*sqrt(abar_t)*v.
- ``get_eigenvectors``: subspace power iteration on the denoiser Jacobian
  v -> (x0hat(xt + eps v) - x0hat(xt)) / eps. The n_ev eigenvector batch rides
  the UNet batch dimension (one fused forward per iteration instead of the
  reference's two sequential calls), and the whole 50-iteration loop compiles
  to one lax.scan. On a device mesh the n_ev batch shards over the data axis.
- ``apply_drift``: shift x0hat along the extracted PCs and recompute the DDIM
  step (optionally shifting the implied epsilon as well).

The model seam is ``eps_pair_fn(x_uncond_in, x_cond_in, k) -> (eps_u, eps_c)``
with both streams batched into one UNet call by the pipeline; the PC stream
choice (BOTH / TEXT / UNCOND — pc_drift.py:16-19) picks which stream sees the
perturbed input.
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..schedulers import get_sigma
from .solvers import as_solver

EpsPairFn = Callable[[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray],
                     Tuple[jnp.ndarray, jnp.ndarray]]


class PCStreamChoice(enum.Enum):
    BOTH = 1
    TEXT = 2
    UNCOND = 3


def _pc_sigma2(solver, k):
    """Eigenvalue scale sigma_t^2 (reference pc_drift.py:177: the DDIM
    posterior variance). EDM solvers use their marginal noise scale —
    a different unit convention, consistent within the family."""
    if hasattr(solver.sched, "step_variance"):
        return get_sigma(solver.sched, k) ** 2
    return solver.sched.sigmas[k] ** 2


def forward_directional(
    sched,  # DiffusionSchedule | CosineDPMSchedule | Solver
    eps_pair_fn: EpsPairFn,
    xt: jnp.ndarray,  # (N, ...)
    k: jnp.ndarray,
    latent: jnp.ndarray,  # variance noise (N, ...) or broadcastable
    cfg_tar: float,
    eta: float = 1.0,
    eigvecs: jnp.ndarray = 0.0,
    amount: float = 0.0,
    mode: PCStreamChoice = PCStreamChoice.BOTH,
    state=None,  # multistep solver history (None = fresh/first-order)
    return_state: bool = False,
):
    """One guided solver step from a (possibly PC-shifted) xt.

    Returns (x_{t-1}, x0_pred)[, state]. (reference: pc_drift.py:29-93 —
    DDIM-bound there; here any solver behind the editing seam works, which
    extends the unsupervised tools to the Stable Audio family.)
    """
    solver = as_solver(sched, eta=eta)
    if state is None:
        state = solver.init_state(xt)
    inp = xt + amount * eigvecs * solver.x0_shift_coeff(k)
    x_u = inp if mode in (PCStreamChoice.BOTH, PCStreamChoice.UNCOND) else xt
    x_c = inp if mode in (PCStreamChoice.BOTH, PCStreamChoice.TEXT) else xt
    eps_u, eps_c = eps_pair_fn(x_u, x_c, k)
    noise_pred = eps_u + cfg_tar * (eps_c - eps_u)
    state, prev, x0_pred = solver.directional_step(state, k, inp, noise_pred, latent)
    if return_state:
        return prev, x0_pred, state
    return prev, x0_pred


class EigResult(NamedTuple):
    eigvecs: jnp.ndarray  # (n_ev, ...) unit-norm, sorted by eigenvalue desc
    eigvals: jnp.ndarray  # (n_ev,)
    in_corrs: jnp.ndarray  # (iters-1, n_ev) successive-iterate correlations
    in_norms: jnp.ndarray  # (iters, n_ev) ||Ab|| per iteration
    interm_eigvecs: jnp.ndarray  # (n_snapshots, n_ev, ...)
    interm_eigvals: jnp.ndarray  # (n_snapshots, n_ev)
    snapshot_iters: Tuple[int, ...]


def snapshot_iterations(iters: int) -> Tuple[int, ...]:
    """Reference snapshot schedule: i % 10 == 0 and i > 15 (pc_drift.py:189)."""
    return tuple(i for i in range(iters) if i % 10 == 0 and i > 15)


def get_eigenvectors(
    sched,  # DiffusionSchedule | CosineDPMSchedule | Solver
    eps_pair_fn: EpsPairFn,
    xt: jnp.ndarray,  # (n_ev, ...) (already expanded across the ev batch)
    latents: jnp.ndarray,  # variance noise for the directional step
    mask: jnp.ndarray,  # (1, ...) or (n_ev, ...) 0/1 patch mask
    k: jnp.ndarray,  # step position
    x0_pred: jnp.ndarray,  # (n_ev, ...) unperturbed x0 prediction
    rng: jax.Array,
    mode: PCStreamChoice = PCStreamChoice.BOTH,
    const: float = 1e-3,
    cfg_tar: float = 3.0,
    iters: int = 50,
    eta: float = 1.0,
    n_ev: int = 1,
    state=None,  # incoming multistep history at step k (Stable Audio)
) -> EigResult:
    """Power iteration for the top-n_ev posterior PCs at one timestep.

    (reference: pc_drift.py:96-198.) The returned eigvecs are unit-norm
    (the reference's final ``eigvecs /= const`` after the last scaling).
    """
    solver = as_solver(sched, eta=eta)
    sigma2 = _pc_sigma2(solver, k)
    flat_mask = (mask.astype(bool)).astype(xt.dtype)

    v0 = jax.random.normal(rng, xt.shape, dtype=xt.dtype) * flat_mask * const

    def masked_norm(ab):
        # ||Ab|| over the masked region, per ev (pc_drift.py:158,176)
        return jnp.sqrt(jnp.sum((ab * flat_mask) ** 2, axis=tuple(range(1, ab.ndim))))

    def one_iter(carry, i):
        eigvecs_scaled, prev_ev = carry  # eigvecs_scaled = unit vecs * const
        _, x0_shift = forward_directional(
            solver, eps_pair_fn, xt, k, latents, cfg_tar, eta=eta,
            eigvecs=eigvecs_scaled, amount=1.0, mode=mode, state=state,
        )
        ab = x0_shift * flat_mask - x0_pred
        norm_ab = masked_norm(ab)  # (n_ev,)
        expand = (n_ev,) + (1,) * (xt.ndim - 1)
        vecs = (ab / norm_ab.reshape(expand)) * flat_mask

        if n_ev > 1:
            # QR orthonormalization across the ev batch (pc_drift.py:160-174)
            mat = vecs.reshape(n_ev, -1).T  # (dim, n_ev)
            q, r = jnp.linalg.qr(mat, mode="reduced")
            swap = jnp.prod(jnp.diagonal(r))
            q = jnp.where(swap < 0, -q, q)
            q = q / jnp.linalg.norm(q, axis=0)
            vecs = q.T.reshape(ab.shape)
            # stable sort by eigenvalue (norm) descending
            order = jnp.argsort(-norm_ab, stable=True)
            vecs = vecs[order]

        corr = jnp.sum(
            prev_ev.reshape(n_ev, -1) * vecs.reshape(n_ev, -1), axis=-1
        )
        return (vecs * const, vecs), (corr, norm_ab, vecs)

    (final_scaled, _), (corrs, norms, vec_hist) = jax.lax.scan(
        one_iter, (v0, v0 / const), jnp.arange(iters)
    )

    eigvecs = final_scaled / const
    eigvals = norms[-1] / const * sigma2

    snaps = snapshot_iterations(iters)
    interm_vecs = vec_hist[jnp.asarray(snaps, dtype=jnp.int32)] if snaps else vec_hist[:0]
    interm_vals = (
        norms[jnp.asarray(snaps, dtype=jnp.int32)] / const * sigma2 if snaps else norms[:0]
    )

    return EigResult(
        eigvecs=eigvecs,
        eigvals=eigvals,
        in_corrs=corrs[1:],  # corr at i=0 compares against the random init
        in_norms=norms,
        interm_eigvecs=interm_vecs,
        interm_eigvals=interm_vals,
        snapshot_iters=snaps,
    )


def apply_drift(
    sched,  # DiffusionSchedule | CosineDPMSchedule | Solver
    k: jnp.ndarray,
    xt_m1: jnp.ndarray,  # (B, ...) result of forward_directional
    x0_pred: jnp.ndarray,  # (B, ...)
    eigvecs: jnp.ndarray,  # (n_sel, ...) PCs to apply
    eigvals: jnp.ndarray,  # (n_sel,)
    latent: jnp.ndarray,  # the variance noise used in the directional step
    eta: float = 1.0,
    amount: float = 1.0,
    use_shifted_x0_for_noisepred: bool = True,
    xt: Optional[jnp.ndarray] = None,  # needed by multistep solvers
    state=None,  # incoming multistep history at step k
    return_state: bool = False,
):
    """Shift x0hat along PCs and recompute the step (pc_drift.py:201-278;
    DDIM recovers the implied epsilon from (xt_m1, x0_pred), multistep
    solvers re-run the update from the shifted data prediction)."""
    solver = as_solver(sched, eta=eta)
    if state is None:
        state = solver.init_state(x0_pred)
    expand = (eigvals.shape[0],) + (1,) * (eigvecs.ndim - 1)
    shift_by = amount * jnp.sum(
        jnp.sqrt(eigvals).reshape(expand) * eigvecs, axis=0, keepdims=True
    )
    new_state, out = solver.drift_step(
        state, k, xt, xt_m1, x0_pred, shift_by, latent,
        use_shifted_x0_for_noisepred=use_shifted_x0_for_noisepred,
    )
    if return_state:
        return out, new_state
    return out
