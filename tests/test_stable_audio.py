"""Stable Audio family tests: DiT, Oobleck VAE, pipeline, CLI smoke.

Covers the 1-D waveform path of the framework (reference:
code/models.py:1051-1354 StableAudWrapper; BASELINE config #5).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.models.configs import MODEL_SPECS
from audioeditingcode_tpu.models.dit1d import (
    DiT1DConfig,
    StableAudioDiT,
    rotary_tables,
)
from audioeditingcode_tpu.models.oobleck import AutoencoderOobleck, OobleckConfig
from audioeditingcode_tpu.models.registry import load_model
from audioeditingcode_tpu.editing.invert import (
    inversion_forward_process,
    inversion_reverse_process,
)
from audioeditingcode_tpu.editing.cfg import build_cfg_tensors

TINY = "test/tiny-stable-audio"


class TestDiT:
    def test_forward_shapes(self):
        cfg = MODEL_SPECS[TINY].dit
        model = StableAudioDiT(cfg)
        L, K = cfg.sample_size, 6
        x = jnp.ones((2, L, cfg.in_channels))
        t = jnp.full((2,), 0.5)
        ctx = jnp.ones((2, K, cfg.cross_attention_input_dim))
        glob = jnp.ones((2, 1, cfg.global_states_input_dim))
        rot = rotary_tables(cfg.rotary_embed_dim, L + 1)
        params = model.init(jax.random.PRNGKey(0), x, t, ctx, glob, rot)
        out = model.apply(params, x, t, ctx, glob, rot)
        assert out.shape == (2, L, cfg.out_channels)
        assert np.isfinite(np.asarray(out)).all()

    def test_rotary_tables(self):
        cos, sin = rotary_tables(8, 17)
        assert cos.shape == (17, 8) and sin.shape == (17, 8)
        np.testing.assert_allclose(np.asarray(cos[0]), 1.0)
        np.testing.assert_allclose(np.asarray(sin[0]), 0.0)
        # rotate-half tiling: first and second half carry the same freqs
        np.testing.assert_allclose(np.asarray(cos[:, :4]), np.asarray(cos[:, 4:]))

    def test_timestep_changes_output(self):
        cfg = MODEL_SPECS[TINY].dit
        model = StableAudioDiT(cfg)
        L = cfg.sample_size
        x = jnp.ones((1, L, cfg.in_channels))
        ctx = jnp.zeros((1, 4, cfg.cross_attention_input_dim))
        glob = jnp.ones((1, 1, cfg.global_states_input_dim))
        rot = rotary_tables(cfg.rotary_embed_dim, L + 1)
        params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)), ctx, glob, rot)
        o1 = model.apply(params, x, jnp.full((1,), 0.1), ctx, glob, rot)
        o2 = model.apply(params, x, jnp.full((1,), 0.9), ctx, glob, rot)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestOobleck:
    def test_encode_decode_shapes(self):
        cfg = MODEL_SPECS[TINY].oobleck
        vae = AutoencoderOobleck(cfg)
        hop = cfg.hop_length
        W = 16 * hop
        audio = jax.random.normal(jax.random.PRNGKey(0), (1, W, cfg.audio_channels))
        params = vae.init(jax.random.PRNGKey(1), audio, jax.random.PRNGKey(2))
        mean, std = vae.apply(params, audio, method=vae.encode)
        assert mean.shape == (1, W // hop, cfg.decoder_input_channels)
        assert (np.asarray(std) > 0).all()
        rec = vae.apply(params, mean, method=vae.decode)
        assert rec.shape == (1, W, cfg.audio_channels)

    def test_hop_length(self):
        assert OobleckConfig().hop_length == 2048
        assert MODEL_SPECS[TINY].oobleck.hop_length == 4


class TestPipeline:
    @pytest.fixture(scope="class")
    def pipe(self):
        return load_model(TINY, num_diffusion_steps=6)

    def test_vae_roundtrip_shapes(self, pipe):
        T = pipe.audio_vae_length
        wave = jnp.asarray(np.random.RandomState(0).randn(2, T // 2), jnp.float32)
        w0 = pipe.vae_encode(wave, rng=jax.random.PRNGKey(0))
        assert w0.shape == (1, 4, pipe.sample_size)
        pipe.setup_duration(0.0, (T // 2) / pipe.sample_rate)
        aud = pipe.vae_decode(w0)
        assert aud.shape[1] == 2 and aud.shape[2] == T // 2

    def test_duration_too_long_raises(self, pipe):
        with pytest.raises(ValueError, match="longer than the model maximum"):
            pipe.setup_duration(0.0, 1e9)

    def test_edit_roundtrip(self, pipe):
        """Full inversion -> warm-start reverse with the tiny DiT: must
        reproduce the fixed trajectory end exactly."""
        shape = (1, 4, pipe.sample_size)
        w0 = jax.random.normal(jax.random.PRNGKey(0), shape)
        uncond = pipe.encode_text([""])
        src = None
        cfg_t, _ = build_cfg_tensors(shape, ["tiny prompt"], [3.0])
        fwd = pipe.make_denoiser(uncond, src, None)

        _, zs, xts, extras = inversion_forward_process(
            pipe.sched, fwd, w0, jax.random.PRNGKey(1), return_extras=True
        )
        S = pipe.sched.num_inference_steps
        assert zs.shape == (S,) + shape and xts.shape == (S + 1,) + shape

        rec = inversion_reverse_process(pipe.sched, fwd, xts, zs)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(xts[0]), atol=2e-4
        )

    def test_uncond_vs_cond_differ(self, pipe):
        shape = (1, 4, pipe.sample_size)
        w0 = jax.random.normal(jax.random.PRNGKey(0), shape)
        uncond = pipe.encode_text([""], negative=True)
        tgt = pipe.encode_text(["a violin"])
        cfg_t, _ = build_cfg_tensors(shape, ["a violin"], [6.0])
        den_c = pipe.make_denoiser(uncond, tgt, cfg_t)
        den_u = pipe.make_denoiser(uncond, None, None)
        e_c = den_c(w0, jnp.asarray(0))
        e_u = den_u(w0, jnp.asarray(0))
        assert e_c.shape == shape and e_u.shape == shape
        assert not np.allclose(np.asarray(e_c), np.asarray(e_u))


class TestCLI:
    def test_main_run_stable_audio(self, tmp_path):
        import scipy.io.wavfile as wavfile

        sr = 4000
        t = np.arange(sr, dtype=np.float32) / sr
        wav = (0.4 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16)
        p = tmp_path / "clip.wav"
        wavfile.write(p, sr, np.stack([wav, wav], axis=1))

        from audioeditingcode_tpu.cli import run

        out = run.main([
            "--model_id", TINY, "--init_aud", str(p),
            "--target_prompt", "a cello",
            "--num_diffusion_steps", "6", "--tstart", "4",
            "--results_path", str(tmp_path / "results"), "--seed", "0",
        ])
        assert os.path.exists(out)
        assert os.path.exists(os.path.join(os.path.dirname(out), "orig.wav"))

    def test_main_run_stable_audio_bf16_with_source(self, tmp_path):
        """Regression: --dtype bfloat16 with a source prompt crashed at
        trace time (scan carry desync: the Oobleck vae_encode emits bf16
        latents but the solver history lives in f32 — cosine_dpm
        init_solver_state). The exact failing CLI config, tiny-sized."""
        import scipy.io.wavfile as wavfile

        sr = 4000
        t = np.arange(sr, dtype=np.float32) / sr
        wav = (0.4 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16)
        p = tmp_path / "clip.wav"
        wavfile.write(p, sr, np.stack([wav, wav], axis=1))

        from audioeditingcode_tpu.cli import run

        out = run.main([
            "--model_id", TINY, "--init_aud", str(p),
            "--source_prompt", "a recording of music",
            "--target_prompt", "a cello",
            "--num_diffusion_steps", "6", "--tstart", "4",
            "--dtype", "bfloat16",
            "--results_path", str(tmp_path / "results_bf16"), "--seed", "0",
        ])
        assert os.path.exists(out)


class TestSDEdit:
    def test_sdedit_cli_stable_audio(self, tmp_path):
        import scipy.io.wavfile as wavfile

        sr = 4000
        t = np.arange(sr, dtype=np.float32) / sr
        wav = (0.4 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16)
        p = tmp_path / "clip.wav"
        wavfile.write(p, sr, np.stack([wav, wav], axis=1))

        from audioeditingcode_tpu.cli import sdedit

        out = sdedit.main([
            "--model_id", TINY, "--init_aud", str(p),
            "--target_prompt", "a cello", "--num_diffusion_steps", "6",
            "--tstart", "4", "--results_path", str(tmp_path / "sd"),
            "--seed", "0",
        ])
        assert os.path.exists(out)

    def test_sdedit_loop_cosine_shapes(self):
        from audioeditingcode_tpu.editing.sdedit import sdedit_loop_cosine
        from audioeditingcode_tpu.models.registry import load_model

        pipe = load_model(TINY, num_diffusion_steps=6)
        w0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, pipe.sample_size))
        uncond = pipe.encode_text([""], negative=True)
        tgt = pipe.encode_text(["a drum"])
        eps_pair = pipe.make_eps_pair(uncond, tgt)
        out = sdedit_loop_cosine(pipe.sched, eps_pair, w0,
                                 jax.random.PRNGKey(1), skip=2, cfg_tar=6.0)
        assert out.shape == w0.shape
        assert np.isfinite(np.asarray(out)).all()
