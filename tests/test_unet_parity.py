"""Numerical parity of the Flax UNet2DConditionModel vs a torch reference
with diffusers' exact architecture and state-dict naming.

Three configurations are checked end-to-end through the weight converter:
- SD-style: cross-attention conditioning (conv proj_in, GEGLU FF);
- AudioLDM-style: FiLM class conditioning (class_embeddings_concat) with
  attn2 degraded to self-attention;
- AudioLDM2-style: dual conditioning streams — one FULL Transformer2DModel
  per stream interleaved in each block's ``attentions`` list with linear
  proj_in/out, diffusers' AudioLDM2UNet2DConditionModel layout (the
  reference drives those blocks with encoder_hidden_states +
  encoder_hidden_states_1, code/models.py:810-899).

Oracle-module provenance (diffusers v0.27 source):
- TRes      = diffusers.models.resnet.ResnetBlock2D (default config)
- TAttention= diffusers.models.attention_processor.Attention
- TBlock    = diffusers.models.attention.BasicTransformerBlock (geglu)
- TTransformer = diffusers.models.transformers.transformer_2d
  .Transformer2DModel (conv or linear projection)
- TUNet     = diffusers.models.unets.unet_2d_condition.UNet2DConditionModel
  topology for a 2-level layers_per_block=1 config
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from audioeditingcode_tpu.models.convert import torch_to_flax_params
from audioeditingcode_tpu.models.unet2d import (
    UNet2DConditionConfig,
    UNet2DConditionModel,
)

SD_CFG = UNet2DConditionConfig(
    in_channels=4, out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    cross_attention_dim=12, num_attention_heads=2,
)

FILM_CFG = UNet2DConditionConfig(
    in_channels=4, out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    cross_attention_dim=None, num_attention_heads=2,
    class_embed_type="simple_projection",
    projection_class_embeddings_input_dim=6,
    class_embeddings_concat=True,
)

DUAL_CFG = UNet2DConditionConfig(
    in_channels=4, out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    cross_attention_dim=12, double_cross_attention=True,
    cross_attention_dim_1=20, num_attention_heads=2,
    use_linear_projection=True,
)


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    emb = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TRes(tnn.Module):
    def __init__(self, cin, cout, temb, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(groups, cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        r = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return r + h


class TAttention(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_v = tnn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, q, d = x.shape
        h = self.heads
        qq = self.to_q(x).reshape(b, q, h, d // h).transpose(1, 2)
        kk = self.to_k(ctx).reshape(b, ctx.shape[1], h, d // h).transpose(1, 2)
        vv = self.to_v(ctx).reshape(b, ctx.shape[1], h, d // h).transpose(1, 2)
        attn = torch.softmax(qq @ kk.transpose(-1, -2) * ((d // h) ** -0.5), dim=-1)
        out = (attn @ vv).transpose(1, 2).reshape(b, q, d)
        return self.to_out[0](out)


class TBlock(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, None, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttention(dim, ctx_dim, heads)
        self.norm3 = tnn.LayerNorm(dim)

        class FFNet(tnn.Module):
            def __init__(self):
                super().__init__()
                proj_holder = tnn.Module()
                proj_holder.proj = tnn.Linear(dim, 8 * dim)
                self.net = tnn.ModuleList(
                    [proj_holder, tnn.Identity(), tnn.Linear(4 * dim, dim)]
                )

            def forward(self, x):
                h, gate = self.net[0].proj(x).chunk(2, dim=-1)
                return self.net[2](h * F.gelu(gate))

        self.ff = FFNet()

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TTransformer(tnn.Module):
    def __init__(self, c, ctx_dim, heads, groups, linear=False):
        super().__init__()
        self.linear = linear
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = tnn.Linear(c, c) if linear else tnn.Conv2d(c, c, 1)
        self.transformer_blocks = tnn.ModuleList([TBlock(c, ctx_dim, heads)])
        self.proj_out = tnn.Linear(c, c) if linear else tnn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        r = x
        if self.linear:
            x = self.norm(x).reshape(b, c, h * w).transpose(1, 2)
            x = self.transformer_blocks[0](self.proj_in(x), ctx)
            x = self.proj_out(x).transpose(1, 2).reshape(b, c, h, w)
            return x + r
        x = self.proj_in(self.norm(x))
        x = x.reshape(b, c, h * w).transpose(1, 2)
        x = self.transformer_blocks[0](x, ctx)
        x = x.transpose(1, 2).reshape(b, c, h, w)
        return self.proj_out(x) + r


class _Level(tnn.Module):
    pass


class TUNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        g = cfg.norm_num_groups
        chans = cfg.block_out_channels
        temb = chans[0] * 4
        res_temb = temb * 2 if cfg.class_embeddings_concat else temb
        heads = cfg.num_attention_heads
        lin = cfg.use_linear_projection
        self.conv_in = tnn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        te = tnn.Module()
        te.linear_1 = tnn.Linear(chans[0], temb)
        te.linear_2 = tnn.Linear(temb, temb)
        self.time_embedding = te
        if cfg.class_embed_type == "simple_projection":
            self.class_embedding = tnn.Linear(
                cfg.projection_class_embeddings_input_dim, temb
            )

        def attn_list(c):
            # diffusers AudioLDM2 layout: one FULL Transformer2DModel per
            # conditioning stream, interleaved per attention position
            if cfg.double_cross_attention:
                return [TTransformer(c, cfg.cross_attention_dim, heads, g, lin),
                        TTransformer(c, cfg.cross_attention_dim_1, heads, g, lin)]
            return [TTransformer(c, cfg.cross_attention_dim, heads, g, lin)]

        down0 = _Level()
        down0.resnets = tnn.ModuleList([TRes(chans[0], chans[0], res_temb, g)])
        down0.attentions = tnn.ModuleList(attn_list(chans[0]))
        down0.downsamplers = tnn.ModuleList([_conv_holder(chans[0])])
        down1 = _Level()
        down1.resnets = tnn.ModuleList([TRes(chans[0], chans[1], res_temb, g)])
        self.down_blocks = tnn.ModuleList([down0, down1])

        mid = _Level()
        mid.resnets = tnn.ModuleList(
            [TRes(chans[1], chans[1], res_temb, g), TRes(chans[1], chans[1], res_temb, g)]
        )
        mid.attentions = tnn.ModuleList(attn_list(chans[1]))
        self.mid_block = mid

        up0 = _Level()
        up0.resnets = tnn.ModuleList(
            [TRes(chans[1] + chans[1], chans[1], res_temb, g),
             TRes(chans[1] + chans[0], chans[1], res_temb, g)]
        )
        up0.upsamplers = tnn.ModuleList([_conv_holder(chans[1], k=3, p=1)])
        up1 = _Level()
        up1.resnets = tnn.ModuleList(
            [TRes(chans[1] + chans[0], chans[0], res_temb, g),
             TRes(chans[0] + chans[0], chans[0], res_temb, g)]
        )
        up1.attentions = tnn.ModuleList(attn_list(chans[0]) + attn_list(chans[0]))
        self.up_blocks = tnn.ModuleList([up0, up1])

        self.conv_norm_out = tnn.GroupNorm(g, chans[0])
        self.conv_out = tnn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)
        self.cfg = cfg

    def apply_attns(self, level, pos, h, ctx0, ctx1=None):
        """Apply the attention stack at one position: stream-interleaved for
        the dual layout (diffusers modeling_audioldm2 CrossAttnDownBlock2D
        forward: attentions[pos*npl + idx] with idx 0 -> encoder_hidden_states,
        idx 1 -> encoder_hidden_states_1)."""
        if self.cfg.double_cross_attention:
            h = level.attentions[2 * pos](h, ctx0)
            return level.attentions[2 * pos + 1](h, ctx1)
        return level.attentions[pos](h, ctx0)



def _conv_holder(c, k=3, p=0):
    m = tnn.Module()
    m.conv = tnn.Conv2d(c, c, k, stride=2 if p == 0 else 1, padding=p)
    return m


@pytest.mark.parametrize("cfg_name", ["sd", "film", "dual"])
def test_unet_parity(cfg_name):
    cfg = {"sd": SD_CFG, "film": FILM_CFG, "dual": DUAL_CFG}[cfg_name]
    torch.manual_seed(0)
    tun = TUNet(cfg).eval()
    fun = UNet2DConditionModel(cfg)

    x = np.random.default_rng(0).standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([3, 7], np.int64)
    ctx = (np.random.default_rng(1).standard_normal((2, 5, 12)).astype(np.float32)
           if cfg.cross_attention_dim else None)
    cls = (np.random.default_rng(2).standard_normal((2, 6)).astype(np.float32)
           if cfg.class_embed_type else None)
    ctx1 = (np.random.default_rng(3).standard_normal((2, 3, 20)).astype(np.float32)
            if cfg.double_cross_attention else None)

    xn = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = fun.init(
        jax.random.PRNGKey(0), xn, jnp.asarray(t),
        None if ctx is None else jnp.asarray(ctx),
        None if cls is None else jnp.asarray(cls),
        None,
        None if ctx1 is None else jnp.asarray(ctx1),
    )
    sd = {k: v.detach().numpy() for k, v in tun.state_dict().items()}
    params = {"params": torch_to_flax_params(sd, params["params"])}

    # full-forward parity: replicate the torch forward with our attention
    # placement (attention after every resnet in cross-attn blocks — both
    # implementations share it for layers_per_block=1 topologies)
    with torch.no_grad():
        tx = torch.from_numpy(x)
        tctx = None if ctx is None else torch.from_numpy(ctx)
        tcls = None if cls is None else torch.from_numpy(cls)
        tctx1 = None if ctx1 is None else torch.from_numpy(ctx1)
        temb = timestep_embedding(torch.from_numpy(t), cfg.block_out_channels[0])
        emb = tun.time_embedding.linear_2(F.silu(tun.time_embedding.linear_1(temb)))
        if tcls is not None:
            emb = torch.cat([emb, tun.class_embedding(tcls)], dim=-1)

        h = tun.conv_in(tx)
        res = [h]
        h = tun.down_blocks[0].resnets[0](h, emb)
        h = tun.apply_attns(tun.down_blocks[0], 0, h, tctx, tctx1)
        res.append(h)
        h = tun.down_blocks[0].downsamplers[0].conv(F.pad(h, (1, 1, 1, 1)))
        res.append(h)
        h = tun.down_blocks[1].resnets[0](h, emb)
        res.append(h)
        h = tun.mid_block.resnets[0](h, emb)
        h = tun.apply_attns(tun.mid_block, 0, h, tctx, tctx1)
        h = tun.mid_block.resnets[1](h, emb)
        for j in range(2):
            h = tun.up_blocks[0].resnets[j](torch.cat([h, res.pop()], 1), emb)
        h = tun.up_blocks[0].upsamplers[0].conv(
            F.interpolate(h, scale_factor=2.0, mode="nearest"))
        for j in range(2):
            h = tun.up_blocks[1].resnets[j](torch.cat([h, res.pop()], 1), emb)
            h = tun.apply_attns(tun.up_blocks[1], j, h, tctx, tctx1)
        ref = tun.conv_out(F.silu(tun.conv_norm_out(h))).numpy()

    ours, _, _ = fun.apply(
        params, xn, jnp.asarray(t),
        None if ctx is None else jnp.asarray(ctx),
        None if cls is None else jnp.asarray(cls),
        None,
        None if ctx1 is None else jnp.asarray(ctx1),
    )
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-3)
