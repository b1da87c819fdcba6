"""Numerical parity of the Flax AutoencoderKL vs a torch reference built with
diffusers' exact architecture and state-dict naming.

A tiny VAE is constructed in torch with diffusers semantics (asymmetric
downsample padding, nearest-x2 upsampling, GN(eps=1e-6)-SiLU-conv resnets,
single-head mid attention), its weights converted through
models.convert.torch_to_flax_params, and encode/decode outputs compared.
This pins both the architecture and every converter layout rule for the VAE
(the HiFi-GAN equivalent lives in tests/test_models.py).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from audioeditingcode_tpu.models.convert import torch_to_flax_params
from audioeditingcode_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig

CFG = AutoencoderKLConfig(
    in_channels=3, out_channels=3, latent_channels=4,
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    scaling_factor=0.5,
)

# the AudioLDM checkpoint VAE topology at tiny width: 3 levels,
# layers_per_block=2, 1 mel channel, 8 latent channels
# (models/configs.py _AUDIOLDM_VAE mirrors diffusers vae/config.json)
CFG3 = AutoencoderKLConfig(
    in_channels=1, out_channels=1, latent_channels=8,
    block_out_channels=(8, 16, 32), layers_per_block=2, norm_num_groups=4,
    scaling_factor=0.9,
)


class TResnet(tnn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        r = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return r + h


class TAttn(tnn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(q @ k.transpose(1, 2) * (c ** -0.5), dim=-1)
        y = self.to_out[0](attn @ v)
        return x + y.transpose(1, 2).reshape(b, c, h, w)


class TDown(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Level(tnn.Module):
    def __init__(self, resnets, samplers=None):
        super().__init__()
        self.resnets = tnn.ModuleList(resnets)
        if samplers is not None:
            name = "downsamplers" if isinstance(samplers[0], TDown) else "upsamplers"
            setattr(self, name, tnn.ModuleList(samplers))


class _Mid(tnn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.resnets = tnn.ModuleList([TResnet(c, c, groups), TResnet(c, c, groups)])
        self.attentions = tnn.ModuleList([TAttn(c, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TEncoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        g = cfg.norm_num_groups
        chans = cfg.block_out_channels
        self.conv_in = tnn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        blocks = []
        cin = chans[0]
        for i, c in enumerate(chans):
            res = [TResnet(cin if j == 0 else c, c, g)
                   for j in range(cfg.layers_per_block)]
            samp = [TDown(c)] if i < len(chans) - 1 else None
            blocks.append(_Level(res, samp))
            cin = c
        self.down_blocks = tnn.ModuleList(blocks)
        self.mid_block = _Mid(chans[-1], g)
        self.conv_norm_out = tnn.GroupNorm(g, chans[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(chans[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TDecoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        g = cfg.norm_num_groups
        rev = tuple(reversed(cfg.block_out_channels))
        self.conv_in = tnn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = _Mid(rev[0], g)
        blocks = []
        cin = rev[0]
        for i, c in enumerate(rev):
            res = [TResnet(cin if j == 0 else c, c, g)
                   for j in range(cfg.layers_per_block + 1)]
            samp = [TUp(c)] if i < len(rev) - 1 else None
            blocks.append(_Level(res, samp))
            cin = c
        self.up_blocks = tnn.ModuleList(blocks)
        self.conv_norm_out = tnn.GroupNorm(g, rev[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(rev[-1], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TVAE(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        self.quant_conv = tnn.Conv2d(2 * cfg.latent_channels,
                                     2 * cfg.latent_channels, 1)
        self.post_quant_conv = tnn.Conv2d(cfg.latent_channels,
                                          cfg.latent_channels, 1)

    def encode_mode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, _ = torch.chunk(moments, 2, dim=1)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


@pytest.fixture(scope="module", params=["lvl2", "lvl3"])
def converted(request):
    cfg = CFG if request.param == "lvl2" else CFG3
    torch.manual_seed(0)
    tvae = TVAE(cfg).eval()
    fvae = AutoencoderKL(cfg)
    x = np.random.default_rng(0).standard_normal(
        (1, 8, 8, cfg.in_channels)).astype(np.float32)
    params = fvae.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in tvae.state_dict().items()}
    params = {"params": torch_to_flax_params(sd, params["params"])}
    return tvae, fvae, params, cfg


def test_encode_parity(converted):
    tvae, fvae, params, cfg = converted
    x = np.random.default_rng(1).standard_normal(
        (2, cfg.in_channels, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tvae.encode_mode(torch.from_numpy(x)).numpy() * cfg.scaling_factor
    ours = np.asarray(fvae.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), method=fvae.encode
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_decode_parity(converted):
    tvae, fvae, params, cfg = converted
    z = np.random.default_rng(2).standard_normal(
        (2, cfg.latent_channels, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tvae.decode(torch.from_numpy(z / cfg.scaling_factor)).numpy()
    ours = np.asarray(fvae.apply(
        params, jnp.asarray(z.transpose(0, 2, 3, 1)), method=fvae.decode
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_odd_size_downsample_parity(converted):
    """Asymmetric (0,1,0,1) padding matters for odd inputs — check parity."""
    tvae, fvae, params, cfg = converted
    x = np.random.default_rng(3).standard_normal(
        (1, cfg.in_channels, 12, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tvae.encode_mode(torch.from_numpy(x)).numpy() * cfg.scaling_factor
    ours = np.asarray(fvae.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), method=fvae.encode
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)
