"""End-to-end slice test on the tiny model: wav -> mel -> VAE -> inversion ->
edit -> VAE decode -> vocoder -> wav. Exercises every layer of SURVEY.md §1
on CPU with random weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.models.registry import load_model
from audioeditingcode_tpu.editing.invert import (
    inversion_forward_process,
    inversion_reverse_process,
)
from audioeditingcode_tpu.editing.cfg import build_cfg_tensors
from audioeditingcode_tpu.utils.audio_io import load_audio, write_wav


@pytest.fixture(scope="module")
def tiny_pipe():
    return load_model("test/tiny-audioldm", num_diffusion_steps=8)


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    wave = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 440 * t)
    p = str(tmp_path_factory.mktemp("aud") / "in.wav")
    write_wav(p, wave[None].astype(np.float32), sr)
    return p


@pytest.mark.slow
def test_full_text_edit_slice(tiny_pipe, wav_file):
    pipe = tiny_pipe
    x0, sr, duration = load_audio(wav_file, pipe.mel_config, model_sr=pipe.get_sr())
    assert x0.shape[0] == 1 and x0.shape[1] == 1 and x0.shape[3] == 64
    assert abs(duration - 1.0) < 1e-3

    w0 = pipe.vae_encode(jnp.asarray(x0))
    assert w0.shape[1] == 4  # tiny latent channels

    uncond = pipe.encode_text([""])
    src = pipe.encode_text(["a recording"])
    tgt = pipe.encode_text(["a louder recording"])

    cfg_src, _ = build_cfg_tensors(w0.shape, ["a recording"], [3.0])
    cfg_tar, _ = build_cfg_tensors(w0.shape, ["a louder recording"], [12.0])

    fwd_denoise = pipe.make_denoiser(uncond, src, cfg_src)
    xT, zs, xts = inversion_forward_process(
        pipe.sched, fwd_denoise, w0, jax.random.PRNGKey(0), eta=1.0, numerical_fix=True
    )
    assert zs.shape[0] == 8 and xts.shape[0] == 9

    tstart = 6
    rev_denoise = pipe.make_denoiser(uncond, tgt, cfg_tar)
    w_edit = inversion_reverse_process(pipe.sched, rev_denoise, xts, zs[:tstart], eta=1.0)
    assert w_edit.shape == w0.shape

    x_dec = pipe.vae_decode(w_edit)
    assert x_dec.shape[2:] == (x0.shape[2] + x0.shape[2] % 2, 64)

    wave = pipe.decode_to_mel(x_dec)
    assert wave.shape[0] == 1
    # torch ConvTranspose length composition: ~160x upsampling (+ edge taps)
    T = x_dec.shape[2]
    for u, k in zip((5, 4, 2, 2, 2), (16, 16, 8, 4, 4)):
        T = (T - 1) * u - 2 * ((k - u) // 2) + k
    assert wave.shape[1] == T
    assert np.isfinite(np.asarray(wave)).all()


def test_edit_is_jittable_and_deterministic(tiny_pipe):
    """The whole forward+reverse edit compiles to one jitted program."""
    pipe = tiny_pipe
    w0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 32))
    uncond = pipe.encode_text([""])
    tgt = pipe.encode_text(["target"])
    cfg_t, _ = build_cfg_tensors(w0.shape, ["target"], [5.0])
    denoise = pipe.make_denoiser(uncond, tgt, cfg_t)

    @jax.jit
    def edit(w0, rng):
        _, zs, xts = inversion_forward_process(pipe.sched, denoise, w0, rng)
        return inversion_reverse_process(pipe.sched, denoise, xts, zs[:6])

    a = edit(w0, jax.random.PRNGKey(2))
    b = edit(w0, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert a.shape == w0.shape


def test_reconstruction_with_source_prompt(tiny_pipe):
    """Invert + reverse with the SAME prompt and cfg reconstructs w0 (the
    reference's implicit self-check, inversion_utils.py:127,305)."""
    pipe = tiny_pipe
    w0 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 32)) * 0.3
    uncond = pipe.encode_text([""])
    src = pipe.encode_text(["same prompt"])
    cfg, _ = build_cfg_tensors(w0.shape, ["same prompt"], [3.0])
    denoise = pipe.make_denoiser(uncond, src, cfg)

    _, zs, xts = inversion_forward_process(
        pipe.sched, denoise, w0, jax.random.PRNGKey(4), zero_first=False
    )
    out = inversion_reverse_process(pipe.sched, denoise, xts, zs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(w0), atol=2e-3)
