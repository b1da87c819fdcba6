"""Generation primitives + CLI tests (text-to-audio, transfer, inpaint).

(reference surface: code/audioldm/pipeline.py:107-301.)
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.editing.generate import (
    generation_loop,
    inpaint_latents,
    style_transfer_latents,
)
from audioeditingcode_tpu.models.registry import load_model


@pytest.fixture(scope="module")
def pipe():
    return load_model("test/tiny-audioldm", num_diffusion_steps=6, latent_time=16)


def _denoiser(pipe):
    uncond = pipe.encode_text([""], negative=True)
    return pipe.make_denoiser(uncond, None, None)


class TestGenerationLoops:
    def test_generation_shape_finite(self, pipe):
        den = _denoiser(pipe)
        w = generation_loop(pipe.sched, den, (1, 4, 16, 32), jax.random.PRNGKey(0))
        assert w.shape == (1, 4, 16, 32)
        assert np.isfinite(np.asarray(w)).all()

    def test_transfer_strength_zero_keeps_input(self, pipe):
        den = _denoiser(pipe)
        w0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 32))
        w = style_transfer_latents(pipe.sched, den, w0, jax.random.PRNGKey(2), 0.0)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w0))

    def test_transfer_full_strength_is_generation(self, pipe):
        den = _denoiser(pipe)
        w0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 32))
        w = style_transfer_latents(pipe.sched, den, w0, jax.random.PRNGKey(2), 1.0)
        assert not np.allclose(np.asarray(w), np.asarray(w0))

    def test_inpaint_keeps_unmasked_region(self, pipe):
        den = _denoiser(pipe)
        w0 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 32))
        mask = jnp.zeros_like(w0).at[:, :, 8:, :].set(1.0)
        w = inpaint_latents(pipe.sched, den, w0, mask, jax.random.PRNGKey(4))
        np.testing.assert_allclose(np.asarray(w[:, :, :8]), np.asarray(w0[:, :, :8]))
        assert not np.allclose(np.asarray(w[:, :, 8:]), np.asarray(w0[:, :, 8:]))


class TestGenerateCLI:
    def test_text_to_audio(self, tmp_path):
        from audioeditingcode_tpu.cli.generate import main

        outs = main([
            "-t", "a drum loop", "--model_id", "test/tiny-audioldm",
            "--ddim_steps", "5", "--duration", "1.0",
            "--save_path", str(tmp_path), "-n", "2",
        ])
        assert len(outs) == 2
        for o in outs:
            assert os.path.exists(o)

    def test_style_transfer(self, tmp_path):
        from scipy.io import wavfile

        from audioeditingcode_tpu.cli.generate import main

        t = np.arange(16000, dtype=np.float32) / 16000
        p = tmp_path / "src.wav"
        wavfile.write(p, 16000, (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))
        outs = main([
            "-t", "a violin melody", "-f", str(p),
            "--model_id", "test/tiny-audioldm", "--ddim_steps", "5",
            "--transfer_strength", "0.6", "--save_path", str(tmp_path / "o"),
        ])
        assert os.path.exists(outs[0])

    def test_super_resolution(self, tmp_path):
        """--mode sr regenerates the upper mel band (reference
        pipeline.py:249-301, freq_mask_ratio default (0.75, 1.0))."""
        from scipy.io import wavfile

        from audioeditingcode_tpu.cli.generate import main

        t = np.arange(16000, dtype=np.float32) / 16000
        p = tmp_path / "src.wav"
        wavfile.write(p, 16000, (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))
        outs = main([
            "-t", "a violin melody", "-f", str(p), "--mode", "sr",
            "--model_id", "test/tiny-audioldm", "--ddim_steps", "5",
            "--save_path", str(tmp_path / "sr"),
        ])
        assert os.path.exists(outs[0])


class TestStableAudioGeneration:
    def test_text_to_audio(self, tmp_path):
        from audioeditingcode_tpu.cli.generate import main

        outs = main([
            "-t", "a drum loop", "--model_id", "test/tiny-stable-audio",
            "--ddim_steps", "4", "--duration", "0.3",
            "--save_path", str(tmp_path), "-n", "2",
        ])
        assert len(outs) == 2
        for o in outs:
            assert os.path.exists(o)

    def test_style_transfer(self, tmp_path):
        from scipy.io import wavfile

        from audioeditingcode_tpu.cli.generate import main

        sr = 44100
        t = np.arange(int(sr * 0.3), dtype=np.float32) / sr
        p = tmp_path / "src.wav"
        wavfile.write(p, sr, (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))
        outs = main([
            "-t", "a violin melody", "-f", str(p),
            "--model_id", "test/tiny-stable-audio", "--ddim_steps", "4",
            "--transfer_strength", "0.5", "--save_path", str(tmp_path / "o"),
        ])
        assert os.path.exists(outs[0])

    def test_inpaint_time_window(self, tmp_path):
        """Sigma-space masked regeneration of a time window."""
        from scipy.io import wavfile

        from audioeditingcode_tpu.cli.generate import main

        sr = 44100
        t = np.arange(int(sr * 0.3), dtype=np.float32) / sr
        p = tmp_path / "src.wav"
        wavfile.write(p, sr, (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))
        outs = main([
            "-t", "a violin", "-f", str(p), "--mode", "inpaint",
            "--model_id", "test/tiny-stable-audio", "--ddim_steps", "4",
            "--time_mask_ratio", "0.25", "0.75",
            "--save_path", str(tmp_path / "inp"),
        ])
        assert os.path.exists(outs[0])

        # an out-of-range window is rejected instead of silently returning
        # the source (tiny model covers ~16 ms; 5 s is far past it)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="selects nothing"):
            main([
                "-t", "a violin", "-f", str(p), "--mode", "inpaint",
                "--model_id", "test/tiny-stable-audio", "--ddim_steps", "4",
                "--inpaint_window", "5.0", "6.0",
                "--save_path", str(tmp_path / "inp2"),
            ])

    def test_sr_rejected(self, tmp_path):
        import pytest as _pytest

        from audioeditingcode_tpu.cli.generate import main

        with _pytest.raises(NotImplementedError):
            main(["-t", "x", "--model_id", "test/tiny-stable-audio",
                  "--mode", "sr", "--ddim_steps", "3",
                  "--save_path", str(tmp_path)])

    def test_transfer_strength_zero_is_passthrough(self, tmp_path):
        """strength 0 -> skip == S -> zero-length solver loop, exact input
        (sigmas[S] == 0), matching the mel path's semantics."""
        import jax.numpy as jnp

        from audioeditingcode_tpu.editing.sdedit import sdedit_loop_cosine
        from audioeditingcode_tpu.editing.solvers import as_solver
        from audioeditingcode_tpu.models.registry import load_model
        import jax

        pipe = load_model("test/tiny-stable-audio", num_diffusion_steps=4)
        pipe.setup_duration()  # full window (tiny model is ~16 ms)
        w0 = jax.random.normal(jax.random.PRNGKey(0),
                               (1, pipe.dit.config.in_channels, pipe.sample_size))
        eps = pipe.make_eps_pair(pipe.encode_text([""], negative=True),
                                 pipe.encode_text(["x"]))
        out = sdedit_loop_cosine(as_solver(pipe.sched), eps, w0,
                                 jax.random.PRNGKey(1), skip=4, cfg_tar=3.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(w0), atol=1e-6)
