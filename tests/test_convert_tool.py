"""Checkpoint-conversion tool tests.

Numerical parity against torch for the tricky layout rules (GPT-2 Conv1D,
ConvTranspose with flax transpose_kernel, weight-norm folding, Snake), and
structural mapping tests for the dedicated per-family converters.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audioeditingcode_tpu.models.convert import fold_weight_norm
from tools.convert_checkpoint import (
    convert_dit,
    convert_gpt2,
    convert_projection_lm,
    convert_projection_sa,
)


class TestWeightNormFolding:
    def test_matches_torch_weight_norm(self):
        conv = torch.nn.Conv1d(4, 6, 5)
        wn = torch.nn.utils.weight_norm(conv)
        sd = {k: v.detach().numpy() for k, v in wn.state_dict().items()}
        folded = fold_weight_norm(sd)
        assert "weight" in folded
        np.testing.assert_allclose(folded["weight"], wn.weight.detach().numpy(),
                                   rtol=1e-6)

    def test_parametrizations_layout(self):
        conv = torch.nn.Conv1d(3, 4, 3)
        w = conv.weight.detach().numpy()
        g = np.linalg.norm(w.reshape(4, -1), axis=1).reshape(4, 1, 1)
        sd = {
            "c.parametrizations.weight.original0": g,
            "c.parametrizations.weight.original1": w,
            "c.bias": conv.bias.detach().numpy(),
        }
        folded = fold_weight_norm(sd)
        np.testing.assert_allclose(folded["c.weight"], w, rtol=1e-6)


class TestConvTransposeRule:
    def test_flax_transpose_kernel_parity(self):
        """torch ConvT1d (in,out,k) -> flax transpose_kernel (k,out,in)."""
        import flax.linen as nn

        tin, tout, k, s, p = 3, 5, 4, 2, 1
        tc = torch.nn.ConvTranspose1d(tin, tout, k, stride=s, padding=p)
        x = torch.randn(1, tin, 8)
        y_t = tc(x).detach().numpy()

        class F(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.ConvTranspose(tout, (k,), strides=(s,), padding="VALID",
                                     transpose_kernel=True, name="c")(x)
                return x[:, p: x.shape[1] - p, :]

        m = F()
        kern = tc.weight.detach().numpy().transpose(2, 1, 0)
        params = {"params": {"c": {"kernel": jnp.asarray(kern.copy()),
                                   "bias": jnp.asarray(tc.bias.detach().numpy())}}}
        y_j = np.asarray(m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1))))
        np.testing.assert_allclose(y_j.transpose(0, 2, 1), y_t, atol=1e-5)


class TestGPT2Conversion:
    def test_parity_with_torch_gpt2(self):
        """Our Flax GPT-2 with converted weights == torch GPT2Model on
        inputs_embeds (the exact mode AudioLDM2 uses)."""
        from transformers import GPT2Config as TorchGPT2Config, GPT2Model as TorchGPT2

        tcfg = TorchGPT2Config(n_embd=32, n_layer=2, n_head=2, vocab_size=50,
                               n_positions=64)
        tm = TorchGPT2(tcfg).eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        from audioeditingcode_tpu.models.audioldm2_cond import GPT2Config, GPT2Model

        fm = GPT2Model(GPT2Config(n_embd=32, n_layer=2, n_head=2, n_positions=64))
        init = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 32)), jnp.ones((1, 4)))
        params = convert_gpt2(sd, init)

        x = np.random.RandomState(0).randn(2, 6, 32).astype(np.float32)
        mask = np.ones((2, 6), np.float32)
        with torch.no_grad():
            y_t = tm(inputs_embeds=torch.tensor(x),
                     attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
        y_j = np.asarray(fm.apply(params, jnp.asarray(x), jnp.asarray(mask)))
        np.testing.assert_allclose(y_j, y_t, atol=2e-4)


class TestProjectionConversions:
    def test_projection_lm_mapping(self):
        from audioeditingcode_tpu.models.audioldm2_cond import (
            AudioLDM2ProjectionConfig,
            AudioLDM2ProjectionModel,
        )

        cfg = AudioLDM2ProjectionConfig(8, 12, 16)
        m = AudioLDM2ProjectionModel(cfg)
        init = m.init(jax.random.PRNGKey(0), jnp.ones((1, 1, 8)), jnp.ones((1, 3, 12)))
        rng = np.random.RandomState(0)
        sd = {
            "projection.weight": rng.randn(16, 8).astype(np.float32),
            "projection.bias": rng.randn(16).astype(np.float32),
            "projection_1.weight": rng.randn(16, 12).astype(np.float32),
            "projection_1.bias": rng.randn(16).astype(np.float32),
            "sos_embed": rng.randn(16).astype(np.float32),
            "eos_embed": rng.randn(16).astype(np.float32),
            "sos_embed_1": rng.randn(16).astype(np.float32),
            "eos_embed_1": rng.randn(16).astype(np.float32),
        }
        params = convert_projection_lm(sd, init)
        np.testing.assert_allclose(
            np.asarray(params["params"]["projection"]["kernel"]),
            sd["projection.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(params["params"]["sos_embed_1"]), sd["sos_embed_1"]
        )

    def test_projection_sa_mapping(self):
        from audioeditingcode_tpu.models.projection import (
            ProjectionConfig,
            StableAudioProjectionModel,
        )
        from audioeditingcode_tpu.models.registry import _projection_init_helper

        cfg = ProjectionConfig(text_encoder_dim=8, conditioning_dim=8, internal_dim=4)
        m = StableAudioProjectionModel(cfg)
        init = m.init(jax.random.PRNGKey(0), jnp.ones((1, 1, 8)), jnp.ones((1,)),
                      method=_projection_init_helper)
        rng = np.random.RandomState(1)
        sd = {
            "text_projection.0.weight": rng.randn(8, 8).astype(np.float32),
            "text_projection.2.weight": rng.randn(8, 8).astype(np.float32),
            "start_number_conditioner.time_positional_embedding.0.weights":
                rng.randn(2).astype(np.float32),
            "start_number_conditioner.time_positional_embedding.1.weight":
                rng.randn(8, 5).astype(np.float32),
            "start_number_conditioner.time_positional_embedding.1.bias":
                rng.randn(8).astype(np.float32),
            "end_number_conditioner.time_positional_embedding.0.weights":
                rng.randn(2).astype(np.float32),
            "end_number_conditioner.time_positional_embedding.1.weight":
                rng.randn(8, 5).astype(np.float32),
            "end_number_conditioner.time_positional_embedding.1.bias":
                rng.randn(8).astype(np.float32),
        }
        params = convert_projection_sa(sd, init)
        p = params["params"]
        np.testing.assert_allclose(
            np.asarray(p["text_projection"]["0"]["kernel"]),
            sd["text_projection.0.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(p["start_number_conditioner"]["time_positional_embedding_0"]["weights"]),
            sd["start_number_conditioner.time_positional_embedding.0.weights"],
        )


def make_dit_state_dict(cfg, rng) -> dict:
    """Diffusers-style StableAudioDiTModel state dict with correct shapes
    (shared with tests/test_convert_integration.py's fake checkpoints)."""
    E, C = cfg.inner_dim, cfg.in_channels

    def lin(o, i):
        return rng.randn(o, i).astype(np.float32)

    sd = {
        "time_proj.weight": rng.randn(cfg.time_proj_dim // 2).astype(np.float32),
        "timestep_proj.0.weight": lin(E, cfg.time_proj_dim),
        "timestep_proj.0.bias": rng.randn(E).astype(np.float32),
        "timestep_proj.2.weight": lin(E, E),
        "timestep_proj.2.bias": rng.randn(E).astype(np.float32),
        "global_proj.0.weight": lin(E, cfg.global_states_input_dim),
        "global_proj.2.weight": lin(E, E),
        "cross_attention_proj.0.weight": lin(cfg.cross_attention_dim,
                                             cfg.cross_attention_input_dim),
        "cross_attention_proj.2.weight": lin(cfg.cross_attention_dim,
                                             cfg.cross_attention_dim),
        "preprocess_conv.weight": rng.randn(C, C, 1).astype(np.float32),
        "proj_in.weight": lin(E, C),
        "proj_out.weight": lin(cfg.out_channels, E),
        "postprocess_conv.weight": rng.randn(C, C, 1).astype(np.float32),
    }
    kv = cfg.num_key_value_attention_heads * cfg.attention_head_dim
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}."
        sd |= {
            b + "norm1.weight": rng.randn(E).astype(np.float32),
            b + "norm1.bias": rng.randn(E).astype(np.float32),
            b + "attn1.to_q.weight": lin(E, E),
            b + "attn1.to_k.weight": lin(kv, E),
            b + "attn1.to_v.weight": lin(kv, E),
            b + "attn1.to_out.0.weight": lin(E, E),
            b + "norm2.weight": rng.randn(E).astype(np.float32),
            b + "norm2.bias": rng.randn(E).astype(np.float32),
            b + "attn2.to_q.weight": lin(E, E),
            b + "attn2.to_k.weight": lin(kv, cfg.cross_attention_dim),
            b + "attn2.to_v.weight": lin(kv, cfg.cross_attention_dim),
            b + "attn2.to_out.0.weight": lin(E, E),
            b + "norm3.weight": rng.randn(E).astype(np.float32),
            b + "norm3.bias": rng.randn(E).astype(np.float32),
            b + "ff.net.0.proj.weight": lin(2 * 4 * E, E),
            b + "ff.net.0.proj.bias": rng.randn(2 * 4 * E).astype(np.float32),
            b + "ff.net.2.weight": lin(E, 4 * E),
            b + "ff.net.2.bias": rng.randn(E).astype(np.float32),
        }
    return sd


class TestDiTConversion:
    def test_synthetic_state_dict_roundtrip(self):
        """Build a diffusers-style DiT state dict with correct shapes and
        check every tensor lands in the right Flax leaf."""
        from audioeditingcode_tpu.models.configs import MODEL_SPECS
        from audioeditingcode_tpu.models.dit1d import StableAudioDiT, rotary_tables

        cfg = MODEL_SPECS["test/tiny-stable-audio"].dit
        m = StableAudioDiT(cfg)
        L = cfg.sample_size
        init = m.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, L, cfg.in_channels)), jnp.ones((1,)) * 0.5,
            jnp.ones((1, 6, cfg.cross_attention_input_dim)),
            jnp.ones((1, 1, cfg.global_states_input_dim)),
            rotary_tables(cfg.rotary_embed_dim, L + 1),
        )

        sd = make_dit_state_dict(cfg, np.random.RandomState(0))
        params = convert_dit(sd, init)
        p = params["params"]
        np.testing.assert_allclose(np.asarray(p["time_proj"]["weight"]),
                                   sd["time_proj.weight"])
        np.testing.assert_allclose(np.asarray(p["preprocess_conv"]["kernel"]),
                                   sd["preprocess_conv.weight"][:, :, 0].T)
        np.testing.assert_allclose(
            np.asarray(p["transformer_blocks_0"]["attn1"]["to_k"]["kernel"]),
            sd["transformer_blocks.0.attn1.to_k.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(p["transformer_blocks_0"]["ff"]["net_0_proj"]["kernel"]),
            sd["transformer_blocks.0.ff.net.0.proj.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(p["timestep_proj"]["linear_1"]["kernel"]),
            sd["timestep_proj.0.weight"].T,
        )
