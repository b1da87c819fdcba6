"""Numerical parity of the Flax Oobleck VAE vs a torch reference with
diffusers' exact architecture (Snake activations, weight-normed convs,
strided/transposed conv geometry) and state-dict naming, converted through
tools.convert_checkpoint.convert_oobleck.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from audioeditingcode_tpu.models.oobleck import AutoencoderOobleck, OobleckConfig
from tools.convert_checkpoint import convert_oobleck

CFG = OobleckConfig(
    encoder_hidden_size=4, downsampling_ratios=(2, 4), channel_multiples=(1, 2),
    decoder_channels=4, decoder_input_channels=3, audio_channels=2,
    sampling_rate=4000,
)

wn = tnn.utils.weight_norm


class TSnake(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.alpha = tnn.Parameter(torch.randn(1, c, 1) * 0.1)
        self.beta = tnn.Parameter(torch.randn(1, c, 1) * 0.1)

    def forward(self, x):
        a, b = torch.exp(self.alpha), torch.exp(self.beta)
        return x + (1.0 / (b + 1e-9)) * torch.sin(a * x) ** 2


class TResUnit(tnn.Module):
    def __init__(self, c, dil):
        super().__init__()
        pad = ((7 - 1) * dil) // 2
        self.snake1 = TSnake(c)
        self.conv1 = wn(tnn.Conv1d(c, c, 7, dilation=dil, padding=pad))
        self.snake2 = TSnake(c)
        self.conv2 = wn(tnn.Conv1d(c, c, 1))

    def forward(self, x):
        return x + self.conv2(self.snake2(self.conv1(self.snake1(x))))


class TEncBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.res_unit1 = TResUnit(cin, 1)
        self.res_unit2 = TResUnit(cin, 3)
        self.res_unit3 = TResUnit(cin, 9)
        self.snake1 = TSnake(cin)
        self.conv1 = wn(tnn.Conv1d(cin, cout, 2 * stride, stride=stride,
                                   padding=math.ceil(stride / 2)))

    def forward(self, x):
        x = self.res_unit3(self.res_unit2(self.res_unit1(x)))
        return self.conv1(self.snake1(x))


class TDecBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.snake1 = TSnake(cin)
        self.conv_t1 = wn(tnn.ConvTranspose1d(cin, cout, 2 * stride,
                                              stride=stride,
                                              padding=math.ceil(stride / 2)))
        self.res_unit1 = TResUnit(cout, 1)
        self.res_unit2 = TResUnit(cout, 3)
        self.res_unit3 = TResUnit(cout, 9)

    def forward(self, x):
        x = self.conv_t1(self.snake1(x))
        return self.res_unit3(self.res_unit2(self.res_unit1(x)))


class TOobleck(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.encoder_hidden_size
        enc = tnn.Module()
        enc.conv1 = wn(tnn.Conv1d(cfg.audio_channels, c, 7, padding=3))
        blocks, mult = [], 1
        for i, s in enumerate(cfg.downsampling_ratios):
            out = cfg.channel_multiples[i]
            blocks.append(TEncBlock(c * mult, c * out, s))
            mult = out
        enc.block = tnn.ModuleList(blocks)
        enc.snake1 = TSnake(c * mult)
        enc.conv2 = wn(tnn.Conv1d(c * mult, 2 * cfg.decoder_input_channels, 3,
                                  padding=1))
        self.encoder = enc

        d = cfg.decoder_channels
        mults = cfg.channel_multiples
        dec = tnn.Module()
        dec.conv1 = wn(tnn.Conv1d(cfg.decoder_input_channels, d * mults[-1], 7,
                                  padding=3))
        strides = cfg.downsampling_ratios[::-1]
        rev = (1,) + tuple(mults)
        dblocks = []
        for i, s in enumerate(strides):
            dblocks.append(TDecBlock(d * rev[len(strides) - i],
                                     d * rev[len(strides) - i - 1], s))
        dec.block = tnn.ModuleList(dblocks)
        dec.snake1 = TSnake(d)
        dec.conv2 = wn(tnn.Conv1d(d, cfg.audio_channels, 7, padding=3, bias=False))
        self.decoder = dec

    def encode_mean(self, x):
        h = self.encoder.conv1(x)
        for b in self.encoder.block:
            h = b(h)
        h = self.encoder.conv2(self.encoder.snake1(h))
        mean, _ = torch.chunk(h, 2, dim=1)
        return mean

    def decode(self, z):
        h = self.decoder.conv1(z)
        for b in self.decoder.block:
            h = b(h)
        return self.decoder.conv2(self.decoder.snake1(h))


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    tm = TOobleck(CFG).eval()
    fm = AutoencoderOobleck(CFG)
    W = 64
    init = fm.init(jax.random.PRNGKey(0),
                   jnp.ones((1, W, CFG.audio_channels)), jax.random.PRNGKey(1))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_oobleck(sd, init)
    return tm, fm, params


def test_encode_parity(converted):
    tm, fm, params = converted
    x = np.random.default_rng(0).standard_normal((1, 2, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm.encode_mean(torch.from_numpy(x)).numpy()
    mean, _ = fm.apply(params, jnp.asarray(x.transpose(0, 2, 1)),
                       method=fm.encode)
    np.testing.assert_allclose(np.asarray(mean).transpose(0, 2, 1), ref,
                               atol=3e-5, rtol=1e-3)


def test_decode_parity(converted):
    tm, fm, params = converted
    z = np.random.default_rng(1).standard_normal((1, 3, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tm.decode(torch.from_numpy(z)).numpy()
    out = fm.apply(params, jnp.asarray(z.transpose(0, 2, 1)), method=fm.decode)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=3e-5, rtol=1e-3)
