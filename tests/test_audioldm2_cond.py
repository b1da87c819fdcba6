"""AudioLDM2 conditioning-chain tests: GPT-2 embed generation, projection
SOS/EOS framing, and the full chain driving the dual-cross-attention UNet.

(reference: code/models.py:599-677 encode_text; :691-899 dual-stream UNet.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioeditingcode_tpu.models.audioldm2_cond import (
    AudioLDM2ProjectionConfig,
    AudioLDM2ProjectionModel,
    AudioLDM2TextEncoder,
    GPT2Config,
    GPT2Model,
    generate_language_model,
)

TINY_GPT = GPT2Config(n_embd=24, n_layer=2, n_head=2, n_positions=64)


@pytest.fixture(scope="module")
def gpt2():
    model = GPT2Model(TINY_GPT)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 24)), jnp.ones((1, 4)))
    return model, params


class TestGPT2:
    def test_causality(self, gpt2):
        """Changing a future token must not change past hidden states."""
        model, params = gpt2
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 24))
        y1 = model.apply(params, x)
        x2 = x.at[0, 5].set(99.0)
        y2 = model.apply(params, x2)
        np.testing.assert_allclose(np.asarray(y1[:, :5]), np.asarray(y2[:, :5]),
                                   atol=1e-5)
        assert not np.allclose(np.asarray(y1[:, 5]), np.asarray(y2[:, 5]))

    def test_padding_mask(self, gpt2):
        model, params = gpt2
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 24))
        m_full = jnp.ones((1, 6))
        m_pad = m_full.at[0, 4:].set(0)
        y1 = model.apply(params, x, m_pad)
        # padded positions masked out of attention: position 3 must differ
        # from the unmasked run only if it attends to 4/5 (it can't, causal).
        y2 = model.apply(params, x, m_full)
        np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]),
                                   atol=1e-5)

    def test_generate_shapes_and_autoregression(self, gpt2):
        model, params = gpt2
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 24))
        gen = generate_language_model(model, params, x, None, max_new_tokens=8)
        assert gen.shape == (2, 8, 24)
        # prompt-dependent
        gen2 = generate_language_model(model, params, x + 1.0, None, 8)
        assert not np.allclose(np.asarray(gen), np.asarray(gen2))


class TestProjection:
    def test_sos_eos_framing(self):
        cfg = AudioLDM2ProjectionConfig(text_encoder_dim=8, text_encoder_1_dim=12,
                                        langauge_model_dim=16)
        model = AudioLDM2ProjectionModel(cfg)
        hs = jnp.ones((2, 1, 8))
        hs1 = jnp.ones((2, 5, 12))
        mask1 = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
        params = model.init(jax.random.PRNGKey(0), hs, hs1, None, mask1)
        out, mask = model.apply(params, hs, hs1, None, mask1)
        # (1+2) clap tokens + (5+2) t5 tokens
        assert out.shape == (2, 10, 16)
        assert mask.shape == (2, 10)
        # clap stream: batch row masks all-visible (len 1 -> sos+tok+eos = 3)
        np.testing.assert_array_equal(np.asarray(mask[:, :3]), 1)
        # t5 row 0 (len 3): visible sos + 3 tokens + eos = 5 of 7
        np.testing.assert_array_equal(np.asarray(mask[0, 3:]), [1, 1, 1, 1, 1, 0, 0])
        np.testing.assert_array_equal(np.asarray(mask[1, 3:]), 1)
        # padded embeds are zeroed
        assert np.abs(np.asarray(out[0, 8:])).max() == 0.0

    def test_eos_at_length_position(self):
        cfg = AudioLDM2ProjectionConfig(8, 12, 16)
        model = AudioLDM2ProjectionModel(cfg)
        hs = jnp.zeros((1, 1, 8))
        hs1 = jnp.zeros((1, 4, 12))
        mask1 = jnp.asarray([[1, 1, 0, 0]])
        params = model.init(jax.random.PRNGKey(0), hs, hs1, None, mask1)
        out, mask = model.apply(params, hs, hs1, None, mask1)
        eos1 = np.asarray(params["params"]["eos_embed_1"])
        # row length 2 -> eos at index 3 of the t5 block (offset 3 for clap)
        np.testing.assert_allclose(np.asarray(out[0, 3 + 3]), eos1, atol=1e-6)


class TestFullChain:
    def test_chain_to_textcond_and_unet(self):
        cfg = AudioLDM2ProjectionConfig(text_encoder_dim=8, text_encoder_1_dim=40,
                                        langauge_model_dim=24)
        proj = AudioLDM2ProjectionModel(cfg)
        pp = proj.init(jax.random.PRNGKey(0), jnp.ones((1, 1, 8)),
                       jnp.ones((1, 6, 40)))
        gpt2 = GPT2Model(TINY_GPT)
        gp = gpt2.init(jax.random.PRNGKey(1), jnp.ones((1, 4, 24)), jnp.ones((1, 4)))

        def clap_feats(prompts):
            return jnp.ones((len(prompts), 8)), jnp.ones((len(prompts), 3), jnp.int32)

        def t5_feats(prompts):
            B = len(prompts)
            return (jnp.full((B, 6, 40), 0.5),
                    jnp.ones((B, 6), jnp.int32))

        enc = AudioLDM2TextEncoder(clap_feats, t5_feats, proj, pp, gpt2, gp)
        cond = enc(["a prompt"])
        assert cond.hidden_states.shape == (1, 8, 24)
        assert cond.hidden_states_1.shape == (1, 6, 40)
        assert cond.attention_mask_1.shape == (1, 6)

        # drive the dual-cross-attention UNet with the chain's output
        from audioeditingcode_tpu.models.registry import load_model

        pipe = load_model("test/tiny-audioldm2", num_diffusion_steps=4,
                          latent_time=16)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16, 32))
        eps = pipe.unet_eps(x, jnp.asarray(1), cond)
        assert eps.shape == x.shape
        assert np.isfinite(np.asarray(eps)).all()
