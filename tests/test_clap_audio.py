"""Torch-reference parity for the Flax CLAP-HTSAT audio tower.

Mirrors the repo's UNet/VAE parity-test pattern: build a tiny random-weight
torch ``transformers.ClapAudioModel``, convert with
``params_from_torch_clap``, and require stage features / pooled output /
projected embedding to match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audioeditingcode_tpu.models.clap_audio import (  # noqa: E402
    clap_audio_embed,
    clap_audio_forward,
    cubic_resize_matrix,
    params_from_torch_clap,
)


def tiny_audio_config():
    from transformers import ClapAudioConfig

    return ClapAudioConfig(
        spec_size=64,
        num_mel_bins=16,
        patch_size=4,
        patch_stride=[4, 4],
        window_size=4,
        depths=[2, 2],
        num_attention_heads=[2, 4],
        patch_embeds_hidden_size=8,
        hidden_size=16,  # = patch_embeds_hidden_size * 2**(len(depths)-1)
        projection_dim=12,
        drop_path_rate=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )


@pytest.fixture(scope="module")
def torch_model():
    from transformers import ClapAudioModel

    torch.manual_seed(0)
    model = ClapAudioModel(tiny_audio_config()).eval()
    # non-trivial BatchNorm running stats
    bn = model.audio_encoder.batch_norm
    bn.running_mean.copy_(torch.randn(16) * 0.1)
    bn.running_var.copy_(torch.rand(16) + 0.5)
    return model


class _Wrapper:
    """Duck-typed 'ClapModel' for params_from_torch_clap."""

    def __init__(self, audio_model, projection=None):
        self.audio_model = audio_model
        self.config = audio_model.config
        if projection is not None:
            self.audio_projection = projection


def test_cubic_resize_matches_torch_bicubic():
    torch.manual_seed(11)
    x = torch.randn(1, 1, 50, 16)
    ref = torch.nn.functional.interpolate(
        x, (256, 16), mode="bicubic", align_corners=True
    ).numpy()
    W = cubic_resize_matrix(50, 256)
    out = np.einsum("ot,bctm->bcom", W, x.numpy())
    # f32 weight-accumulation order differs from torch's kernel: ~2e-5 noise
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-5)


def test_stages_and_pooled_parity(torch_model):
    params, cfg = params_from_torch_clap(_Wrapper(torch_model))

    x = torch.randn(2, 1, 50, 16)  # T=50 < spec_width -> exercises bicubic
    with torch.no_grad():
        out = torch_model(x, output_hidden_states=True)
    ref_stages = [h.numpy() for h in out.hidden_states]
    ref_pooled = out.pooler_output.numpy()

    stages, pooled = clap_audio_forward(params, x.numpy(), cfg)
    assert len(stages) == len(ref_stages)
    for mine, ref in zip(stages, ref_stages):
        assert mine.shape == ref.shape
        np.testing.assert_allclose(np.asarray(mine), ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=2e-4, atol=2e-4)


def test_projection_parity(torch_model):
    from transformers.models.clap.modeling_clap import ClapProjectionLayer

    torch.manual_seed(1)
    proj = ClapProjectionLayer(torch_model.config).eval()
    params, cfg = params_from_torch_clap(_Wrapper(torch_model, proj))

    x = torch.randn(1, 1, 64, 16)
    with torch.no_grad():
        pooled_t = torch_model(x).pooler_output
        ref = proj(pooled_t).numpy()
    _, pooled = clap_audio_forward(params, x.numpy(), cfg)
    emb = clap_audio_embed(params, pooled)
    np.testing.assert_allclose(np.asarray(emb), ref, rtol=2e-4, atol=2e-4)


class TestFlaxExtractorMatchesOracle:
    """FlaxClapExtractor must reproduce the torch oracle's outputs through
    the full extractor protocol (processor prep, stage selection,
    normalization) on a shared tiny random ClapModel."""

    @pytest.fixture(scope="class")
    def pair(self):
        import warnings

        warnings.filterwarnings("ignore")
        from transformers import ClapConfig, ClapFeatureExtractor, ClapModel
        from transformers.models.clap.configuration_clap import (
            ClapAudioConfig,
            ClapTextConfig,
        )

        from audioeditingcode_tpu.evals.features import (
            FlaxClapExtractor,
            TransformersClapExtractor,
        )

        tc = ClapTextConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            vocab_size=100)
        ac = ClapAudioConfig(hidden_size=32, depths=[1, 1],
                             num_attention_heads=[2, 2], num_mel_bins=64,
                             spec_size=256, patch_embeds_hidden_size=16,
                             window_size=4)
        cfg = ClapConfig(text_config=tc.to_dict(), audio_config=ac.to_dict(),
                         projection_dim=16)

        class Proc:
            fe = ClapFeatureExtractor()

            def __call__(self, audios=None, sampling_rate=None, **kw):
                return self.fe(audios, sampling_rate=sampling_rate,
                               return_tensors="pt", truncation="rand_trunc")

        torch.manual_seed(3)
        model = ClapModel(cfg).eval()
        return (FlaxClapExtractor.from_components(model, Proc()),
                TransformersClapExtractor.from_components(model, Proc()))

    def test_stages_match(self, pair):
        jx, tx = pair
        t = np.arange(48000, dtype=np.float32) / 48000
        aud = (0.4 * np.sin(2 * np.pi * 440 * t))[None]
        s_j = jx.stages(aud, 48000)
        s_t = tx.stages(aud, 48000)
        assert len(s_j) == len(s_t)
        for a, b in zip(s_j, s_t):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)

    def test_embed_audio_matches(self, pair):
        jx, tx = pair
        t = np.arange(48000, dtype=np.float32) / 48000
        aud = (0.3 * np.sin(2 * np.pi * 220 * t))[None]
        np.testing.assert_allclose(jx.embed_audio(aud, 48000),
                                   tx.embed_audio(aud, 48000),
                                   rtol=2e-3, atol=2e-4)


def test_flax_extractor_drives_metrics(pair_metrics=None):
    """LPAPS + CLAP-consistency run end-to-end on the JAX extractor."""
    import warnings

    warnings.filterwarnings("ignore")
    from transformers import ClapConfig, ClapFeatureExtractor, ClapModel
    from transformers.models.clap.configuration_clap import (
        ClapAudioConfig,
        ClapTextConfig,
    )

    from audioeditingcode_tpu.evals.clap_consistency import (
        CLAPTextConsistencyMetric,
    )
    from audioeditingcode_tpu.evals.features import FlaxClapExtractor
    from audioeditingcode_tpu.evals.lpaps import LPAPS

    tc = ClapTextConfig(hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        vocab_size=100)
    ac = ClapAudioConfig(hidden_size=32, depths=[1, 1],
                         num_attention_heads=[2, 2], num_mel_bins=64,
                         spec_size=256, patch_embeds_hidden_size=16,
                         window_size=4)
    cfg = ClapConfig(text_config=tc.to_dict(), audio_config=ac.to_dict(),
                     projection_dim=16)

    class Proc:
        fe = ClapFeatureExtractor()

        def __call__(self, audios=None, sampling_rate=None, text=None, **kw):
            if text is not None:
                import torch as _t

                ids = _t.tensor([[min(7 + i, 99) for i in range(8)]
                                 for _ in text])
                return {"input_ids": ids, "attention_mask": _t.ones_like(ids)}
            return self.fe(audios, sampling_rate=sampling_rate,
                           return_tensors="pt", truncation="rand_trunc")

    torch.manual_seed(5)
    ext = FlaxClapExtractor.from_components(ClapModel(cfg).eval(), Proc())

    t = np.arange(48000, dtype=np.float32) / 48000
    a = (0.4 * np.sin(2 * np.pi * 440 * t))[None]
    b = (0.4 * np.sin(2 * np.pi * 880 * t))[None]

    m = LPAPS(ext)
    assert m(a, a, 48000, 48000) == pytest.approx(0.0, abs=1e-8)
    assert m(a, b, 48000, 48000) > 0

    c = CLAPTextConsistencyMetric(ext)
    c.update(a, ["a sine tone"], 48000)
    score = c.compute()
    assert -1.0 <= score <= 1.0


def test_text_tower_parity():
    """JAX text tower vs torch ClapModel.get_text_features on a tiny model."""
    import warnings

    warnings.filterwarnings("ignore")
    from transformers import ClapConfig, ClapModel
    from transformers.models.clap.configuration_clap import (
        ClapAudioConfig,
        ClapTextConfig,
    )

    from audioeditingcode_tpu.models.clap_text import (
        clap_text_embed,
        clap_text_forward,
        text_params_from_torch_clap,
    )

    tc = ClapTextConfig(hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        vocab_size=100)
    ac = ClapAudioConfig(hidden_size=32, depths=[1, 1],
                         num_attention_heads=[2, 2], num_mel_bins=64,
                         spec_size=256, patch_embeds_hidden_size=16,
                         window_size=4)
    cfg = ClapConfig(text_config=tc.to_dict(), audio_config=ac.to_dict(),
                     projection_dim=16)
    torch.manual_seed(7)
    model = ClapModel(cfg).eval()
    params, tcfg = text_params_from_torch_clap(model)

    ids = torch.tensor([[0, 5, 9, 12, 2, 1, 1, 1],  # right-padded
                        [0, 7, 3, 4, 8, 11, 6, 2]])
    mask = (ids != 1).long()
    with torch.no_grad():
        ref = model.get_text_features(input_ids=ids, attention_mask=mask).numpy()

    pooled = clap_text_forward(params, ids.numpy(), mask.numpy(), tcfg)
    emb = np.asarray(clap_text_embed(params, pooled))
    np.testing.assert_allclose(emb, ref, rtol=2e-4, atol=2e-4)


def test_full_geometry_synthetic_checkpoint_parity():
    """Full-size de-risk for the real eval checkpoint path (never runnable
    online here): params_from_torch_clap + forward parity on the DEFAULT
    transformers ClapAudioConfig — the real HTSAT-base geometry
    (depths [2,2,6,2], heads [4,8,16,32], hidden 768, 64 mels) that the
    laion music/speech checkpoints use (reference binding:
    evals/pretrained_networks.py:12-30). Random full-size weights stand in
    for the checkpoint; ~1 min on CPU."""
    from transformers import ClapAudioModel
    from transformers.models.clap.configuration_clap import ClapAudioConfig
    from transformers.models.clap.modeling_clap import ClapProjectionLayer

    torch.manual_seed(7)
    cfg_t = ClapAudioConfig()  # the real checkpoint geometry
    model = ClapAudioModel(cfg_t).eval()
    bn = model.audio_encoder.batch_norm
    bn.running_mean.copy_(torch.randn(bn.running_mean.shape) * 0.1)
    bn.running_var.copy_(torch.rand(bn.running_var.shape) + 0.5)
    proj = ClapProjectionLayer(cfg_t).eval()

    params, cfg = params_from_torch_clap(_Wrapper(model, proj))

    x = torch.randn(1, 1, 1001, 64)  # one 10 s / 48 kHz processor frame
    with torch.no_grad():
        out = model(x, output_hidden_states=True)
        ref_pooled = out.pooler_output.numpy()
        ref_emb = proj(out.pooler_output).numpy()

    stages, pooled = clap_audio_forward(params, x.numpy(), cfg)
    assert len(stages) == len(out.hidden_states)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=5e-4, atol=5e-4)
    emb = clap_audio_embed(params, pooled)
    np.testing.assert_allclose(np.asarray(emb), ref_emb, rtol=5e-4, atol=5e-4)


def test_full_geometry_text_tower_parity():
    """Text-tower counterpart of the full-geometry audio test: the default
    ClapTextConfig is the real RoBERTa-base geometry of the laion
    checkpoints; random full-size weights through text_params_from_torch_clap
    must match torch get_text_features. ~40 s on CPU."""
    import warnings

    warnings.filterwarnings("ignore")
    from transformers import ClapConfig, ClapModel
    from transformers.models.clap.configuration_clap import (
        ClapAudioConfig,
        ClapTextConfig,
    )

    from audioeditingcode_tpu.models.clap_text import (
        clap_text_embed,
        clap_text_forward,
        text_params_from_torch_clap,
    )

    # tiny audio tower (not under test) + DEFAULT full-size text tower
    ac = ClapAudioConfig(hidden_size=32, depths=[1, 1],
                         num_attention_heads=[2, 2], num_mel_bins=64,
                         spec_size=256, patch_embeds_hidden_size=16,
                         window_size=4)
    cfg = ClapConfig(text_config=ClapTextConfig().to_dict(),
                     audio_config=ac.to_dict(), projection_dim=512)
    torch.manual_seed(9)
    model = ClapModel(cfg).eval()
    params, tcfg = text_params_from_torch_clap(model)

    ids = torch.tensor([[0, 50, 900, 1200, 2, 1, 1, 1],
                        [0, 70, 31, 42, 81, 110, 65, 2]])
    mask = (ids != 1).long()
    with torch.no_grad():
        ref = model.get_text_features(input_ids=ids, attention_mask=mask).numpy()
    pooled = clap_text_forward(params, ids.numpy(), mask.numpy(), tcfg)
    emb = np.asarray(clap_text_embed(params, pooled))
    np.testing.assert_allclose(emb, ref, rtol=5e-4, atol=5e-4)
