"""LatentAudioPipeline — the JAX analogue of the reference PipelineWrapper.

Bundles schedule + UNet + VAE + vocoder + text encoder and exposes the model
seam the editing algorithms consume (reference contract:
code/models.py:14-175). Differences by design (TPU-first):

- the denoiser is exposed as pure closures (``make_denoiser`` /
  ``make_eps_pair``) over frozen params, so editing loops jit/scan cleanly;
- cond/uncond (and multi-prompt, and n_ev) batches are fused into ONE UNet
  forward per step;
- latents keep the reference's NCHW layout at the API boundary (checkpoints
  and CLI artifacts stay interchangeable) while modules run NHWC internally.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Tuple

import jax.numpy as jnp

from ..editing.invert import make_cfg_denoiser
from ..ops.stft import MelConfig
from ..schedulers import DiffusionSchedule
from .hifigan import HifiGanGenerator
from .text_encoders import TextCond, concat_conds, repeat_cond
from .unet2d import UNet2DConditionModel
from .vae import AutoencoderKL


@dataclasses.dataclass
class LatentAudioPipeline:
    model_id: str
    sched: DiffusionSchedule
    unet: UNet2DConditionModel
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    vocoder: Optional[HifiGanGenerator]
    vocoder_params: Any
    text_encoder: Callable[..., TextCond]
    mel_config: MelConfig
    sample_rate: int = 16000
    vae_pad_multiple: int = 4
    max_mel_frames: Optional[int] = None  # TANGO: 1700 (models.py:444-445)

    # ----------------------------------------------------------- text
    def encode_text(self, prompts: List[str], negative: bool = False) -> TextCond:
        return self.text_encoder(prompts, negative=negative)

    # ----------------------------------------------------------- unet
    def unet_eps(self, x: jnp.ndarray, t: jnp.ndarray, cond: TextCond) -> jnp.ndarray:
        """One denoiser forward: NCHW latent batch -> NCHW model output."""
        x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
        ts = jnp.broadcast_to(jnp.asarray(t)[None], (x.shape[0],))
        out, _, _ = self.unet.apply(
            self.unet_params,
            x_nhwc,
            ts,
            cond.hidden_states,
            cond.class_labels,
            cond.attention_mask,
            cond.hidden_states_1,
            cond.attention_mask_1,
        )
        return jnp.transpose(out, (0, 3, 1, 2))

    def unet_forward_with_hooks(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        cond: TextCond,
        replace_h_space=None,
        replace_skip_conns=None,
        zero_out_resconns=None,
        mid_block_additional_residual=None,
    ):
        """Full hook surface (h-space / skip-conn surgery), NCHW in/out.

        (reference: models.py:160-393 — returns (sample, h_space, res_conns).)
        """
        x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
        ts = jnp.broadcast_to(jnp.asarray(t)[None], (x.shape[0],))
        out, h_space, res_conns = self.unet.apply(
            self.unet_params,
            x_nhwc,
            ts,
            cond.hidden_states,
            cond.class_labels,
            cond.attention_mask,
            cond.hidden_states_1,
            cond.attention_mask_1,
            mid_block_additional_residual=mid_block_additional_residual,
            replace_h_space=replace_h_space,
            replace_skip_conns=replace_skip_conns,
            zero_out_resconns=zero_out_resconns,
        )
        return jnp.transpose(out, (0, 3, 1, 2)), h_space, res_conns

    # ------------------------------------------------- denoiser closures
    def make_eps_pair(self, uncond: TextCond, cond: Optional[TextCond]):
        """eps_pair_fn(x_u, x_c, k) with both streams in one UNet call."""

        def pair(x_u, x_c, k):
            t = self.sched.timesteps[k]
            if cond is None or x_c is None:
                return self.unet_eps(x_u, t, repeat_cond(uncond, x_u.shape[0])), None
            # multi-prompt: broadcast the latent to the P cond prompts
            # (reference expands xt for the cond call, inversion_utils.py:88-89)
            P = max(cond.batch, x_c.shape[0])
            if x_c.shape[0] == 1 and P > 1:
                x_c = jnp.broadcast_to(x_c, (P,) + x_c.shape[1:])
            cu = repeat_cond(uncond, x_u.shape[0])
            cc = repeat_cond(cond, P)
            x = jnp.concatenate([x_u, x_c], axis=0)
            eps = self.unet_eps(x, t, concat_conds(cu, cc))
            return eps[: x_u.shape[0]], eps[x_u.shape[0]:]

        return pair

    def make_denoiser(
        self,
        uncond: TextCond,
        cond: Optional[TextCond],
        cfg_tensor: Optional[jnp.ndarray],
    ):
        """CFG denoiser(xt, k) for the inversion/editing scans."""
        return make_cfg_denoiser(
            self.make_eps_pair(uncond, cond),
            cfg_tensor if cond is not None else None,
        )

    def make_hooked_denoiser(
        self,
        uncond: TextCond,
        cond: Optional[TextCond],
        cfg_scalar: float,
        k0: int = 0,
        hspace_add: Optional[jnp.ndarray] = None,  # (T, ...) or (1, ...)
        hspace_replace: Optional[jnp.ndarray] = None,  # (T, ...) or (1, ...)
        zero_out_resconns=None,
        return_hspace: bool = False,
    ):
        """Denoiser with the reference's semantic-editing hooks
        (inversion_utils.py:230-246, 251-269): per-step h-space addition /
        replacement and residual-connection zeroing, CFG split across the
        mid-block residual as (1/(cfg+1), cfg/(cfg+1)). Per-step hook arrays
        are indexed at ``k - k0``; single-entry arrays broadcast.

        Returns denoise(xt, k) -> eps  (or (eps, h_space) with
        ``return_hspace`` — h-space CFG-combined like inversion_utils:104).
        Scalar-CFG only, like the reference's h-space path (:21-22)."""

        def step_slice(arr, k):
            if arr is None:
                return None
            if arr.shape[0] == 1:
                return arr[0]
            return arr[k - k0]

        def denoise(xt, k):
            t = self.sched.timesteps[k]
            h_rep = step_slice(hspace_replace, k)
            h_add = step_slice(hspace_add, k)
            if cond is None:
                out, h, _ = self.unet_forward_with_hooks(
                    xt, t, repeat_cond(uncond, xt.shape[0]),
                    replace_h_space=None if h_rep is None else h_rep[None],
                    zero_out_resconns=zero_out_resconns,
                    mid_block_additional_residual=None if h_add is None
                    else h_add[None],
                )
                return (out, h) if return_hspace else out

            cu = repeat_cond(uncond, xt.shape[0])
            cc = repeat_cond(cond, xt.shape[0])
            x2 = jnp.concatenate([xt, xt], axis=0)
            mid = None
            if h_add is not None:
                mid = jnp.concatenate(
                    [h_add[None] * (1.0 / (cfg_scalar + 1.0)),
                     h_add[None] * (cfg_scalar / (cfg_scalar + 1.0))], axis=0,
                )
            rep = None if h_rep is None else jnp.concatenate(
                [h_rep[None], h_rep[None]], axis=0
            )
            out, h, _ = self.unet_forward_with_hooks(
                x2, t, concat_conds(cu, cc),
                replace_h_space=rep,
                zero_out_resconns=zero_out_resconns,
                mid_block_additional_residual=mid,
            )
            eps_u, eps_c = out[:1], out[1:]
            eps = eps_u + cfg_scalar * (eps_c - eps_u)
            if return_hspace:
                h_u, h_c = h[:1], h[1:]
                return eps, h_u + cfg_scalar * (h_c - h_u)
            return eps

        return denoise

    # ----------------------------------------------------------- vae
    def vae_encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """mel 'image' (B, 1, T, n_mels) NCHW -> latent (B, C, T/4, n_mels/4).

        Pads the time axis at the start to a multiple of 4, like the
        reference (models.py:495-499: F.pad(x, (0, 0, 4 - H%4, 0)))."""
        h = x.shape[2]
        if self.max_mel_frames is not None and h > self.max_mel_frames:
            raise ValueError(
                f"Audio too long: {h} mel frames > model maximum "
                f"{self.max_mel_frames} (reference models.py:444-445)."
            )
        m = self.vae_pad_multiple
        if h % m:
            x = jnp.pad(x, [(0, 0), (0, 0), (m - h % m, 0), (0, 0)])
        x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
        z = self.vae.apply(self.vae_params, x_nhwc, method=self.vae.encode)
        return jnp.transpose(z, (0, 3, 1, 2))

    def vae_decode(self, z: jnp.ndarray) -> jnp.ndarray:
        z_nhwc = jnp.transpose(z, (0, 2, 3, 1))
        x = self.vae.apply(self.vae_params, z_nhwc, method=self.vae.decode)
        return jnp.transpose(x, (0, 3, 1, 2))

    # ----------------------------------------------------------- vocoder
    def decode_to_mel(self, x_dec: jnp.ndarray) -> jnp.ndarray:
        """decoded mel image (B, 1, T, n_mels) -> waveform (B, T*hop).

        (reference: models.py:505-509 via SpeechT5HifiGan.)"""
        if self.vocoder is None:
            raise ValueError(f"{self.model_id} has no vocoder")
        mel = x_dec[:, 0, :, :]  # (B, T, n_mels)
        return self.vocoder.apply(self.vocoder_params, mel)

    def decode_latent_to_waveform(self, z: jnp.ndarray) -> jnp.ndarray:
        """Fused VAE-decode + vocoder (one jitted graph on device)."""
        return self.decode_to_mel(self.vae_decode(z))

    # ----------------------------------------------------------- misc
    def get_sr(self) -> int:
        return self.sample_rate

    def latent_shape_for(self, x0: jnp.ndarray) -> Tuple[int, ...]:
        return tuple(x0.shape)

    # ------------------------------------------------- param threading
    def params_dict(self):
        """All param pytrees, for passing as jit ARGUMENTS rather than
        closure constants (weights as constants get serialized into the
        compiled program — megabytes-to-gigabytes of HLO)."""
        return {
            "unet_params": self.unet_params,
            "vae_params": self.vae_params,
            "vocoder_params": self.vocoder_params,
        }

    def bind(self, params) -> "LatentAudioPipeline":
        """Rebind param pytrees (use inside jitted functions)."""
        return dataclasses.replace(self, **params)
