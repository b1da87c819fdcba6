"""Image-editing path tests: load_image semantics, SD/CelebA-HQ pipelines,
and the three image CLIs end-to-end on tiny specs.

(reference surface: code/images_run_sdedit.py, images_pc_extract_inv.py,
images_pc_apply_drift.py, utils.py:16-46 load_image.)
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.models.registry import load_model
from audioeditingcode_tpu.utils.image_io import load_image, save_image


@pytest.fixture(scope="module")
def png(tmp_path_factory):
    from PIL import Image

    p = tmp_path_factory.mktemp("imgs") / "face.png"
    rng = np.random.RandomState(0)
    arr = (rng.rand(40, 60, 3) * 255).astype(np.uint8)  # wider than tall
    Image.fromarray(arr).save(p)
    return str(p)


class TestImageIO:
    def test_load_image_center_square_resize(self, png):
        x = load_image(png, resize=(32, 32))
        assert x.shape == (1, 3, 32, 32)
        assert x.min() >= -1.0 and x.max() <= 1.0

    def test_roundtrip_save(self, png, tmp_path):
        x = load_image(png, resize=(16, 16))
        out = str(tmp_path / "o.png")
        save_image(out, x)
        y = load_image(out, resize=(16, 16))
        np.testing.assert_allclose(x, y, atol=2 / 127.5)

    def test_crop_args(self, png):
        x = load_image(png, left=5, right=5, resize=(16, 16))
        assert x.shape == (1, 3, 16, 16)


class TestImagePipelines:
    def test_tiny_sd_edit_roundtrip(self):
        from audioeditingcode_tpu.editing.invert import (
            inversion_forward_process,
            inversion_reverse_process,
        )

        pipe = load_model("test/tiny-sd", num_diffusion_steps=5, latent_time=16)
        x0 = jnp.asarray(np.random.RandomState(0).rand(1, 3, 32, 32) * 2 - 1,
                         jnp.float32)
        w0 = pipe.vae_encode(x0)
        assert w0.shape == (1, 4, 16, 16)
        uncond = pipe.encode_text([""], negative=True)
        den = pipe.make_denoiser(uncond, None, None)
        _, zs, xts = inversion_forward_process(pipe.sched, den, w0,
                                               jax.random.PRNGKey(0),
                                               zero_first=False)
        rec = inversion_reverse_process(pipe.sched, den, xts, zs)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(xts[0]), atol=1e-3)

    def test_tiny_celebahq_uncond(self):
        pipe = load_model("test/tiny-celebahq", num_diffusion_steps=4, latent_time=16)
        x0 = jnp.asarray(np.random.RandomState(1).rand(1, 3, 64, 64) * 2 - 1,
                         jnp.float32)
        w0 = pipe.vae_encode(x0)
        assert w0.shape == (1, 3, 32, 32)
        cond = pipe.encode_text([""])
        assert cond.hidden_states is None and cond.class_labels is None
        eps = pipe.unet_eps(w0, jnp.asarray(1), cond)
        assert eps.shape == w0.shape
        dec = pipe.vae_decode(w0)
        assert dec.shape == x0.shape


class TestImageCLIs:
    def test_images_sdedit(self, png, tmp_path):
        from audioeditingcode_tpu.cli.images import sdedit_main

        out = sdedit_main([
            "--model_id", "test/tiny-sd", "--init_im", png,
            "--target_prompt", "a cat", "--num_diffusion_steps", "5",
            "--tstart", "3", "--resize", "32", "32",
            "--results_path", str(tmp_path / "r"), "--seed", "0",
        ])
        assert os.path.exists(out)

    @pytest.mark.slow
    def test_images_pc_extract_and_apply(self, png, tmp_path):
        from audioeditingcode_tpu.cli.images import pc_apply_main, pc_extract_main

        ckpt = pc_extract_main([
            "--model_id", "test/tiny-sd", "--init_im", png,
            "--num_diffusion_steps", "4", "--drift_start", "3",
            "--drift_end", "1", "--iters", "3", "--n_evs", "2",
            "--resize", "32", "32",
            "--results_path", str(tmp_path / "pc"), "--seed", "0",
        ])
        assert os.path.exists(ckpt)

        outs = pc_apply_main([
            "--extraction_path", ckpt, "--drift_start", "3",
            "--drift_end", "1", "--amount", "1.5", "--evs", "1", "--seed", "0",
        ])
        for o in outs:
            assert os.path.exists(o)

    def test_images_sdedit_celebahq(self, png, tmp_path):
        from audioeditingcode_tpu.cli.images import sdedit_main

        out = sdedit_main([
            "--model_id", "test/tiny-celebahq", "--init_im", png,
            "--num_diffusion_steps", "4", "--tstart", "2",
            "--resize", "32", "32",
            "--results_path", str(tmp_path / "r2"), "--seed", "1",
        ])
        assert os.path.exists(out)


class TestVQ:
    @pytest.mark.slow
    def test_vq_quantize_maps_to_codebook(self):
        from audioeditingcode_tpu.models.configs import MODEL_SPECS
        from audioeditingcode_tpu.models.vae import VQModel

        cfg = MODEL_SPECS["test/tiny-celebahq"].vae
        vq = VQModel(cfg)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 16, 16) * 2 - 1,
                        jnp.float32).transpose(0, 2, 3, 1)
        params = vq.init(jax.random.PRNGKey(0), x)
        z = vq.apply(params, x, method=vq.encode)
        assert z.shape[-1] == 3
        q = vq.apply(params, z, method=vq.quantize)
        cb = np.asarray(params["params"]["codebook"])
        flat = np.asarray(q).reshape(-1, 3)
        # every quantized vector must be an exact codebook row
        d = np.abs(flat[:, None, :] - cb[None]).sum(-1).min(1)
        assert d.max() < 1e-6

    def test_vq_decode_quantizes_by_default(self):
        from audioeditingcode_tpu.models.configs import MODEL_SPECS
        from audioeditingcode_tpu.models.vae import VQModel

        cfg = MODEL_SPECS["test/tiny-celebahq"].vae
        vq = VQModel(cfg)
        x = jnp.ones((1, 16, 16, 3))
        params = vq.init(jax.random.PRNGKey(0), x)
        z = vq.apply(params, x, method=vq.encode)
        d1 = vq.apply(params, z, method=vq.decode)
        d2 = vq.apply(params, z, True, method=vq.decode)  # force_not_quantize
        assert d1.shape == x.shape
        assert not np.allclose(np.asarray(d1), np.asarray(d2))
