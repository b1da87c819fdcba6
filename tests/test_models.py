"""Model zoo tests: shapes, hooks, and torch->flax conversion parity.

HiFi-GAN parity is tested end-to-end against a torch mirror of the
reference generator (code/audioldm/hifigan/models.py) through the weight
converter — this pins both the architecture and every layout rule in
models/convert.py.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from audioeditingcode_tpu.models.unet2d import UNet2DConditionConfig, UNet2DConditionModel
from audioeditingcode_tpu.models.vae import AutoencoderKLConfig, AutoencoderKL
from audioeditingcode_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator
from audioeditingcode_tpu.models.convert import torch_to_flax_params

TINY_UNET = UNet2DConditionConfig(
    in_channels=4,
    out_channels=4,
    block_out_channels=(8, 16),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    cross_attention_dim=16,
    num_attention_heads=2,
)


def test_unet_shapes_and_hooks():
    model = UNet2DConditionModel(TINY_UNET)
    x = jnp.ones((2, 16, 8, 4))
    t = jnp.array([5, 5])
    ctx = jnp.ones((2, 3, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out, h_space, res_conns = model.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 8, 4)
    assert h_space.shape == (2, 8, 4, 16)  # bottleneck: H/2, W/2, C=16
    assert set(res_conns.keys()) == {0, 1}

    # h-space replacement flows through deterministically
    out2, h2, _ = model.apply(params, x, t, ctx, replace_h_space=h_space * 0.0)
    assert np.allclose(np.asarray(h2), 0.0)
    assert not np.allclose(np.asarray(out2), np.asarray(out))

    # replacing skip conns with themselves is a no-op
    out3, _, _ = model.apply(params, x, t, ctx, replace_skip_conns={0: res_conns[0], 1: res_conns[1]})
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out), atol=1e-6)

    # zeroing all res conns changes the output
    out4, _, _ = model.apply(params, x, t, ctx, zero_out_resconns=1)
    assert not np.allclose(np.asarray(out4), np.asarray(out))


def test_unet_class_conditioning_film():
    cfg = UNet2DConditionConfig(
        in_channels=4, out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, norm_num_groups=4,
        cross_attention_dim=None, num_attention_heads=2,
        class_embed_type="simple_projection",
        projection_class_embeddings_input_dim=12,
        class_embeddings_concat=True,
    )
    model = UNet2DConditionModel(cfg)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([3])
    cls = jnp.ones((1, 12))
    params = model.init(jax.random.PRNGKey(0), x, t, None, cls)
    out, _, _ = model.apply(params, x, t, None, cls)
    assert out.shape == (1, 8, 8, 4)
    out_b, _, _ = model.apply(params, x, t, None, cls * -1.0)
    assert not np.allclose(np.asarray(out_b), np.asarray(out))


def test_unet_odd_height_upsample():
    """Non-multiple-of-2^k heights must round-trip (reference: models.py:181-189)."""
    model = UNet2DConditionModel(TINY_UNET)
    x = jnp.ones((1, 10, 8, 4))  # H=10 -> down 5 -> up 10
    t = jnp.array([7])
    ctx = jnp.ones((1, 3, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out, _, _ = model.apply(params, x, t, ctx)
    assert out.shape == (1, 10, 8, 4)


TINY_VAE = AutoencoderKLConfig(
    in_channels=1, out_channels=1, latent_channels=4,
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    scaling_factor=0.5,
)


def test_vae_encode_decode_shapes():
    model = AutoencoderKL(TINY_VAE)
    x = jnp.ones((1, 16, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)  # full encode+decode path
    z = model.apply(params, x, method=model.encode)
    assert z.shape == (1, 8, 4, 4)  # one downsample
    y = model.apply(params, z, method=model.decode)
    assert y.shape == (1, 16, 8, 1)
    # scaling factor round-trips
    z2 = model.apply(params, x, method=model.encode)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2))


# ---------------------------------------------------------------------------
# HiFi-GAN: full parity vs a torch mirror of the reference generator
# ---------------------------------------------------------------------------

TINY_HIFI = HifiGanConfig(
    model_in_dim=8,
    upsample_initial_channel=16,
    upsample_rates=(2, 2),
    upsample_kernel_sizes=(4, 4),
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


class TorchResBlock(tnn.Module):
    def __init__(self, ch, k, dils):
        super().__init__()
        self.convs1 = tnn.ModuleList(
            [tnn.Conv1d(ch, ch, k, 1, dilation=d, padding=(k * d - d) // 2) for d in dils]
        )
        self.convs2 = tnn.ModuleList(
            [tnn.Conv1d(ch, ch, k, 1, dilation=1, padding=(k - 1) // 2) for _ in dils]
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = tF.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = tF.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x


class TorchHifiGan(tnn.Module):
    def __init__(self, cfg: HifiGanConfig):
        super().__init__()
        self.cfg = cfg
        self.conv_pre = tnn.Conv1d(cfg.model_in_dim, cfg.upsample_initial_channel, 7, 1, padding=3)
        self.ups = tnn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            self.ups.append(
                tnn.ConvTranspose1d(
                    cfg.upsample_initial_channel // (2 ** i),
                    cfg.upsample_initial_channel // (2 ** (i + 1)),
                    k, u, padding=(k - u) // 2,
                )
            )
        self.resblocks = tnn.ModuleList()
        for i in range(len(self.ups)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock(ch, k, d))
        self.conv_post = tnn.Conv1d(ch, 1, 7, 1, padding=3)

    def forward(self, x):  # (B, C, T)
        nk = len(self.cfg.resblock_kernel_sizes)
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = tF.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            xs = None
            for j in range(nk):
                r = self.resblocks[i * nk + j](x)
                xs = r if xs is None else xs + r
            x = xs / nk
        x = tF.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x)


def test_hifigan_parity_with_torch_reference():
    torch.manual_seed(0)
    tmodel = TorchHifiGan(TINY_HIFI).eval()
    mel = np.random.default_rng(0).standard_normal((2, 8, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(mel)).numpy()[:, 0, :]

    fmodel = HifiGanGenerator(TINY_HIFI)
    mel_nlc = jnp.asarray(mel.transpose(0, 2, 1))
    params = fmodel.init(jax.random.PRNGKey(0), mel_nlc)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": torch_to_flax_params(sd, params["params"])}
    ours = np.asarray(fmodel.apply(params, mel_nlc))

    assert ours.shape == ref.shape == (2, 20 * 4)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_converter_layer_rules():
    """Dense / Conv2d / GroupNorm layout rules vs torch layers."""
    import flax.linen as nn

    tconv = tnn.Conv2d(3, 5, 3, padding=1)
    x = np.random.default_rng(1).standard_normal((1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    fconv = nn.Conv(5, (3, 3), padding=1)
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = fconv.init(jax.random.PRNGKey(0), xn)
    sd = {k: v.detach().numpy() for k, v in tconv.state_dict().items()}
    params = {"params": torch_to_flax_params(sd, params["params"])}
    ours = np.asarray(fconv.apply(params, xn)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    tgn = tnn.GroupNorm(2, 6)
    with torch.no_grad():
        tgn.weight.mul_(1.3)
        tgn.bias.add_(0.1)
    x = np.random.default_rng(2).standard_normal((2, 6, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tgn(torch.from_numpy(x)).numpy()
    fgn = nn.GroupNorm(num_groups=2, epsilon=1e-5)
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = fgn.init(jax.random.PRNGKey(0), xn)
    sd = {k: v.detach().numpy() for k, v in tgn.state_dict().items()}
    params = {"params": torch_to_flax_params(sd, params["params"])}
    ours = np.asarray(fgn.apply(params, xn)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fast_init_matches_module_init_structure():
    """_fast_init must produce exactly module.init's tree structure,
    shapes and dtypes — serialization.from_bytes restores checkpoints into
    this template, so any drift silently breaks weight loading."""
    import jax
    import jax.numpy as jnp

    from audioeditingcode_tpu.models.registry import (
        _dummy_cond_args,
        _fast_init,
        resolve_spec,
    )
    from audioeditingcode_tpu.models.unet2d import UNet2DConditionModel

    spec = resolve_spec("test/tiny-audioldm")
    unet = UNet2DConditionModel(spec.unet, dtype=jnp.float32)
    lat_w = spec.mel.n_mel_channels // spec.vae.downscale_factor
    x_lat = jnp.ones((1, 16, lat_w, spec.unet.in_channels))
    hs, cls, hs1 = _dummy_cond_args(spec)
    args = (x_lat, jnp.array([1]), hs, cls, None, hs1)
    rng = jax.random.PRNGKey(0)

    real = unet.init(rng, *args)
    fast = _fast_init(unet, rng, args)

    assert (jax.tree_util.tree_structure(real)
            == jax.tree_util.tree_structure(fast))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(real),
        jax.tree_util.tree_leaves_with_path(fast),
    ):
        assert pa == pb and a.shape == b.shape and a.dtype == b.dtype, (pa, pb)
    # name-aware fill: norm scales are ones, biases zeros
    import numpy as np

    for p, leaf in jax.tree_util.tree_leaves_with_path(fast):
        name = getattr(p[-1], "key", "")
        if name == "scale":
            assert (np.asarray(leaf) == 1).all()
        elif name == "bias":
            assert (np.asarray(leaf) == 0).all()
