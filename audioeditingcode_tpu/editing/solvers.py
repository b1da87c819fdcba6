"""Solver seam: one interface the editing scans drive, two numerics behind it.

The reference dispatches per-model scheduler math through PipelineWrapper
method overrides (DDIM-family: code/models.py:67-158; Stable Audio cosine
DPM-solver++: code/models.py:1190-1329). Here the same seam is a small
functional protocol so that ``inversion_forward_process`` /
``inversion_reverse_process`` stay single ``lax.scan`` programs for every
model family:

  - ``init_state(like, history)``     scan carry for multistep history
  - ``sample_xts(x0, rng)``           independent q(x_t|x_0) trajectory
  - ``scale_input(k, xt)``            what the denoiser network consumes
  - ``forward_step(state, k, xt, xtm1, out)``  noise-map recovery (+fix)
  - ``reverse_step(state, k, xt, out, z)``     custom-noise reverse update

``DDIMSolver`` is stateless (empty carry, no history). ``CosineDPMSolver``
carries the previous converted model output — the 2nd-order multistep
history the reference threads via ``extra_info``
(inversion_utils.py:123-129,219).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..schedulers.ddim import (
    DiffusionSchedule,
    get_zs_from_xts,
    reverse_step_with_custom_noise,
    sample_xts_from_x0,
)
from ..schedulers.cosine_dpm import (
    CosineDPMSchedule,
    convert_model_output,
    init_solver_state,
    recover_noise,
    sample_xts_from_x0_sigma,
    scale_model_input,
    solver_step,
    solver_step_from_x0,
)


class DDIMSolver(struct.PyTreeNode):
    """Eta-DDIM numerics (AudioLDM/AudioLDM2/TANGO/SD/CelebA-HQ families).

    A pytree (schedule arrays are leaves) so solvers can travel as jit
    ARGUMENTS rather than closure constants."""

    sched: DiffusionSchedule
    eta: float = struct.field(pytree_node=False, default=1.0)
    numerical_fix: bool = struct.field(pytree_node=False, default=True)
    carries_history: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_inference_steps(self) -> int:
        return self.sched.num_inference_steps

    def init_state(self, like: jnp.ndarray, history: Optional[jnp.ndarray] = None):
        return ()

    def sample_xts(self, x0: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        return sample_xts_from_x0(self.sched, x0, rng)

    def scale_input(self, k, xt: jnp.ndarray) -> jnp.ndarray:
        return xt

    def forward_step(self, state, k, xt, xtm1_raw, model_output):
        z, xtm1_fix = get_zs_from_xts(
            self.sched, k, xt, xtm1_raw, model_output,
            eta=self.eta, numerical_fix=self.numerical_fix,
        )
        return state, z, xtm1_fix, None

    def reverse_step(self, state, k, xt, model_output, z):
        xtm1 = reverse_step_with_custom_noise(
            self.sched, k, model_output, xt, variance_noise=z, eta=self.eta
        )
        return state, xtm1

    # ---- posterior-PC surface (editing/pc_drift.py) ----
    def x0_shift_coeff(self, k) -> jnp.ndarray:
        """d(x_t)/d(x_0) at step k — the scale that maps an x0-space
        direction into x_t-space (reference pc_drift.py:40:
        xt + a*sqrt(abar_t)*v)."""
        return jnp.sqrt(self.sched.step_alpha_prod[k])

    def directional_step(self, state, k, inp, noise_pred, z):
        """One guided step from a (possibly shifted) input; returns
        (state, x_{t-1}, x0_pred)."""
        from ..schedulers import ddim_step

        prev, x0_pred = ddim_step(
            self.sched, k, noise_pred, inp, eta=self.eta, variance_noise=z
        )
        return state, prev, x0_pred

    def drift_step(self, state, k, xt, xt_m1, x0_pred, shift, z,
                   use_shifted_x0_for_noisepred: bool = True):
        """Recompute the step with x0_pred shifted along the PCs
        (reference pc_drift.py:239-276 — no model call needed)."""
        sched, eta = self.sched, self.eta
        a_prev = sched.step_alpha_prod_prev[k]
        a_t = sched.step_alpha_prod[k]
        std_dev_t = eta * jnp.sqrt(sched.step_variance[k])
        if eta > 0:
            xt_m1 = xt_m1 - std_dev_t * z
        pred_dir = xt_m1 - jnp.sqrt(a_prev) * x0_pred
        pred_epsilon = pred_dir / jnp.sqrt(1.0 - a_prev - std_dev_t ** 2)
        if use_shifted_x0_for_noisepred:
            pred_epsilon = pred_epsilon - jnp.sqrt(a_t) / jnp.sqrt(1.0 - a_t) * shift
        pred_dir = jnp.sqrt(1.0 - a_prev - std_dev_t ** 2) * pred_epsilon
        xt_m1 = jnp.sqrt(a_prev) * (x0_pred + shift) + pred_dir
        if eta > 0:
            xt_m1 = xt_m1 + std_dev_t * z
        return state, xt_m1


class CosineDPMSolver(struct.PyTreeNode):
    """SDE-DPM-Solver++ (order 2) numerics — the Stable Audio family."""

    sched: CosineDPMSchedule
    numerical_fix: bool = struct.field(pytree_node=False, default=True)
    # force order 1 (reference --first_order flag)
    first_order: bool = struct.field(pytree_node=False, default=False)
    carries_history: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_inference_steps(self) -> int:
        return self.sched.num_inference_steps

    def _force_first(self, sched: CosineDPMSchedule) -> CosineDPMSchedule:
        return sched.replace(step_first_order=jnp.ones_like(sched.step_first_order))

    @property
    def _sched(self) -> CosineDPMSchedule:
        return self._force_first(self.sched) if self.first_order else self.sched

    def init_state(self, like: jnp.ndarray, history: Optional[jnp.ndarray] = None):
        return init_solver_state(like, history)

    def sample_xts(self, x0: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        return sample_xts_from_x0_sigma(self.sched, x0, rng)

    def scale_input(self, k, xt: jnp.ndarray) -> jnp.ndarray:
        return scale_model_input(self.sched, k, xt)

    def forward_step(self, state, k, xt, xtm1_raw, model_output):
        state, z, xtm1_fix, extra = recover_noise(
            self._sched, state, k, xt, xtm1_raw, model_output,
            numerical_fix=self.numerical_fix,
        )
        return state, z, xtm1_fix, extra

    def reverse_step(self, state, k, xt, model_output, z):
        return solver_step(self._sched, state, k, model_output, xt, z)

    # ---- posterior-PC surface (editing/pc_drift.py; beyond the reference,
    # whose forward_directional is DDIM-bound — pc_drift.py:29-93) ----
    def x0_shift_coeff(self, k) -> jnp.ndarray:
        """EDM parameterization: x_sigma = x0 + sigma*eps, so d(x_t)/d(x_0)=1."""
        return jnp.ones(())

    def directional_step(self, state, k, inp, noise_pred, z):
        """One guided solver step from a (possibly shifted) UNSCALED input;
        returns (state, x_prev, x0_pred) with x0_pred = the converted
        data prediction (diffusers precondition_outputs)."""
        x0_pred = convert_model_output(self._sched, k, inp, noise_pred)
        state, prev = solver_step_from_x0(self._sched, state, k, x0_pred, inp, z)
        return state, prev, x0_pred

    def drift_step(self, state, k, xt, xt_m1, x0_pred, shift, z,
                   use_shifted_x0_for_noisepred: bool = True):
        """Re-run the solver update with the data prediction shifted along
        the PCs. The solver consumes x0 directly, so the DDIM option of
        also shifting the implied epsilon has no separate analogue here."""
        del xt_m1, use_shifted_x0_for_noisepred
        return solver_step_from_x0(self._sched, state, k, x0_pred + shift,
                                   xt, z)


Solver = Any  # DDIMSolver | CosineDPMSolver


def as_solver(sched_or_solver, eta: float = 1.0, numerical_fix: bool = True) -> Solver:
    """Accept a raw schedule (DiffusionSchedule / CosineDPMSchedule) or an
    already-constructed Solver.

    NOTE: when a Solver INSTANCE is passed, its own eta/numerical_fix win
    and this function's keyword arguments are ignored — the instance is
    the caller's explicit configuration (e.g. run.py's --first_order
    replaces fields on the solver directly). Pass a raw schedule if you
    want the keywords applied."""
    if isinstance(sched_or_solver, DiffusionSchedule):
        return DDIMSolver(sched_or_solver, eta=eta, numerical_fix=numerical_fix)
    if isinstance(sched_or_solver, CosineDPMSchedule):
        return CosineDPMSolver(sched_or_solver, numerical_fix=numerical_fix)
    return sched_or_solver
