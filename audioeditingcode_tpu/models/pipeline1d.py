"""Stable Audio pipeline: DiT + Oobleck VAE + T5/duration conditioning.

The 1-D counterpart of :class:`LatentAudioPipeline` implementing the same
model seam the editing scans consume (reference contract:
code/models.py:1051-1354 — StableAudWrapper). Differences by design:

- the solver is a :class:`CosineDPMSolver` (2nd-order SDE-DPM-Solver++) and
  input preconditioning (scale_model_input, models.py:79/226 call sites)
  happens inside the denoiser closure, so editing loops stay generic;
- duration conditioning (seconds_start/seconds_end hidden states + global
  token, models.py:1142-1172) and the 1-D rotary tables are precomputed once
  per run via :meth:`setup_duration` — nothing but the DiT runs in the scan;
- latents keep the reference's (B, C, L) layout at the API boundary; modules
  run (B, L, C) internally.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp

from ..editing.invert import make_cfg_denoiser
from ..editing.solvers import CosineDPMSolver
from .dit1d import StableAudioDiT, rotary_tables
from .oobleck import AutoencoderOobleck
from .projection import StableAudioProjectionModel
from .text_encoders import TextCond, concat_conds, repeat_cond


@dataclasses.dataclass
class StableAudioPipeline:
    model_id: str
    sched: CosineDPMSolver  # solver object (consumed via editing.solvers.as_solver)
    dit: StableAudioDiT
    dit_params: Any
    vae: AutoencoderOobleck
    vae_params: Any
    projection: StableAudioProjectionModel
    projection_params: Any
    text_encoder: Callable[..., TextCond]
    sample_rate: int = 44100
    sample_size: int = 1024  # latent length (DiT sample_size)

    # set by setup_duration:
    _duration_embeds: Optional[jnp.ndarray] = None  # (1, 2, D) start/end
    _global_states: Optional[jnp.ndarray] = None  # (1, 1, 2D)
    _rotary: Any = None
    _waveform_start: int = 0
    _waveform_end: Optional[int] = None

    # mel config compatibility (unused on the waveform path)
    mel_config: Any = None

    @property
    def hop_length(self) -> int:
        return self.vae.config.hop_length

    @property
    def audio_vae_length(self) -> int:
        return self.sample_size * self.hop_length

    # ----------------------------------------------------- duration setup
    def setup_duration(self, audio_start_in_s: float = 0.0,
                       audio_end_in_s: Optional[float] = None) -> None:
        """Precompute duration embeds, global token and rotary tables
        (reference: models.py:1142-1172 setup_extra_inputs)."""
        max_s = self.audio_vae_length / self.sample_rate
        if audio_end_in_s is None:
            audio_end_in_s = max_s
        if audio_end_in_s - audio_start_in_s > max_s:
            raise ValueError(
                f"The total audio length requested "
                f"({audio_end_in_s - audio_start_in_s}s) is longer than the model "
                f"maximum possible length ({max_s})."
            )
        self._waveform_start = int(audio_start_in_s * self.sample_rate)
        self._waveform_end = int(audio_end_in_s * self.sample_rate)

        start, end = self.projection.apply(
            self.projection_params,
            jnp.asarray([audio_start_in_s], jnp.float32),
            jnp.asarray([audio_end_in_s], jnp.float32),
            method=self.projection.encode_duration,
        )
        self._duration_embeds = jnp.concatenate([start, end], axis=1)  # (1, 2, D)
        self._global_states = jnp.concatenate([start, end], axis=2)  # (1, 1, 2D)
        rot_dim = self.dit.config.rotary_embed_dim
        self._rotary = rotary_tables(rot_dim, self.sample_size + 1)

    def _require_setup(self):
        if self._duration_embeds is None:
            self.setup_duration()

    # ----------------------------------------------------------- text
    def encode_text(self, prompts: List[str], negative: bool = False) -> TextCond:
        """Projected text embeds; [""] maps to all-zero conditioning with an
        all-zero mask — the marker the denoiser uses to zero the WHOLE
        stream including duration embeds (reference: models.py:1099-1104,
        1342-1343)."""
        cond = self.text_encoder(prompts, negative=negative)
        hs = cond.hidden_states
        mask = cond.attention_mask
        if mask is None:
            mask = jnp.ones(hs.shape[:2], dtype=jnp.int32)
        if all(p == "" for p in prompts):
            return TextCond(
                hidden_states=jnp.zeros_like(hs),
                attention_mask=jnp.zeros_like(mask),
            )
        hs = hs * mask[..., None].astype(hs.dtype)
        return TextCond(hidden_states=hs, attention_mask=mask)

    # ----------------------------------------------------------- denoiser
    def dit_forward(self, x: jnp.ndarray, t: jnp.ndarray, cond: TextCond) -> jnp.ndarray:
        """One DiT forward: (B, C, L) scaled latent -> raw v-pred (B, C, L).

        Appends duration embeds to the text stream and zeroes the whole
        stream for the unconditional branch (reference: models.py:1339-1349)."""
        self._require_setup()
        B = x.shape[0]
        dur = jnp.broadcast_to(
            self._duration_embeds, (B,) + self._duration_embeds.shape[1:]
        )
        embeds = jnp.concatenate([cond.hidden_states, dur], axis=1)
        if cond.attention_mask is not None:
            # all-zero mask == unconditional branch: zero the whole stream,
            # duration embeds included (reference: models.py:1342-1343)
            valid = (jnp.sum(cond.attention_mask, axis=1) > 0).astype(embeds.dtype)
            embeds = embeds * valid[:, None, None]
        glob = jnp.broadcast_to(self._global_states, (B,) + self._global_states.shape[1:])
        ts = jnp.broadcast_to(jnp.asarray(t)[None], (B,))
        x_nlc = jnp.transpose(x, (0, 2, 1))
        out = self.dit.apply(
            self.dit_params, x_nlc, ts, embeds, glob, self._rotary
        )
        return jnp.transpose(out, (0, 2, 1))

    def make_eps_pair(self, uncond: TextCond, cond: Optional[TextCond]):
        """pair(x_u, x_c, k) — both CFG streams in ONE DiT call, with the
        solver's input preconditioning applied inside."""
        solver = self.sched

        def pair(x_u, x_c, k):
            t = solver.sched.timesteps[k]
            if cond is None or x_c is None:
                x_in = solver.scale_input(k, x_u)
                return self.dit_forward(x_in, t, repeat_cond(uncond, x_u.shape[0])), None
            # multi-prompt: broadcast the latent to the P cond prompts
            P = max(cond.batch, x_c.shape[0])
            if x_c.shape[0] == 1 and P > 1:
                x_c = jnp.broadcast_to(x_c, (P,) + x_c.shape[1:])
            cu = repeat_cond(uncond, x_u.shape[0])
            cc = repeat_cond(cond, P)
            x = jnp.concatenate([x_u, x_c], axis=0)
            x_in = solver.scale_input(k, x)
            eps = self.dit_forward(x_in, t, concat_conds(cu, cc))
            return eps[: x_u.shape[0]], eps[x_u.shape[0]:]

        return pair

    def make_denoiser(self, uncond: TextCond, cond: Optional[TextCond],
                      cfg_tensor: Optional[jnp.ndarray]):
        return make_cfg_denoiser(
            self.make_eps_pair(uncond, cond),
            cfg_tensor if cond is not None else None,
        )

    # ----------------------------------------------------------- vae
    def vae_encode(self, x: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """waveform (C, T) or (B, C, T) -> latent (B, 64, L).

        Pads/trims to the fixed audio_vae_length and repeats mono to stereo
        (reference: models.py:1118-1134)."""
        if x.ndim == 2:
            x = x[None]
        if x.shape[1] == 1 and self.vae.config.audio_channels == 2:
            x = jnp.repeat(x, 2, axis=1)
        T = self.audio_vae_length
        audio = jnp.zeros((x.shape[0], self.vae.config.audio_channels, T), x.dtype)
        n = min(x.shape[-1], T)
        audio = audio.at[:, :, :n].set(x[:, :, :n])
        if rng is None:
            rng = jax.random.PRNGKey(0)
        z = self.vae.apply(
            self.vae_params, jnp.transpose(audio, (0, 2, 1)), rng,
            method=self.vae.encode_sample,
        )
        return jnp.transpose(z, (0, 2, 1))

    def vae_decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """latent (B, 64, L) -> waveform (B, 2, T) cropped to the requested
        duration (reference: models.py:1136-1140)."""
        self._require_setup()
        aud = self.vae.apply(
            self.vae_params, jnp.transpose(z, (0, 2, 1)), method=self.vae.decode
        )
        aud = jnp.transpose(aud, (0, 2, 1))
        return aud[:, :, self._waveform_start: self._waveform_end]

    def decode_to_mel(self, x_dec: jnp.ndarray) -> jnp.ndarray:
        """Waveform passthrough — Stable Audio decodes straight to audio."""
        return x_dec

    def decode_latent_to_waveform(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.vae_decode(z)

    # ----------------------------------------------------------- misc
    def get_sr(self) -> int:
        return self.sample_rate

    # ------------------------------------------------- param threading
    def params_dict(self):
        """Param pytrees for jit-argument threading (see LatentAudioPipeline).

        Includes the duration-conditioning state (duration embeds, global
        token, rotary tables) so jitted programs carry NO host-built closure
        constants at all."""
        return {
            "dit_params": self.dit_params,
            "vae_params": self.vae_params,
            "_duration_embeds": self._duration_embeds,
            "_global_states": self._global_states,
            "_rotary": self._rotary,
        }

    def bind(self, params) -> "StableAudioPipeline":
        return dataclasses.replace(self, **params)
