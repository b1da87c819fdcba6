"""Eval tower tests: windowing, LPAPS, CLAP consistency, FAD, orchestration.

(reference semantics: evals/lpaps.py, evals/meta_clap_consistency.py,
evals/fadtk_utils.py, evals/utils.py.)
"""

import os

import numpy as np
import pytest

from audioeditingcode_tpu.evals import (
    CLAPTextConsistencyMetric,
    FADScorer,
    LPAPS,
    MelStageExtractor,
    ScoreState,
    calc_scores,
    combine_scores,
    frechet_distance,
    lpaps_distance,
    split_to_overlapping_windows,
)


def tone(freq, seconds=2.0, sr=16000):
    t = np.arange(int(seconds * sr), dtype=np.float32) / sr
    return (0.4 * np.sin(2 * np.pi * freq * t))[None, :]


@pytest.fixture(scope="module")
def ext():
    return MelStageExtractor()


class TestWindows:
    def test_split_counts_and_stride(self):
        aud = np.zeros((1, 16000 * 25))
        wins = split_to_overlapping_windows(aud, 16000, 10.0, 0.1)
        # stride = 9 s -> starts at 0, 9, 18 s
        assert len(wins) == 3
        assert wins[0].shape[-1] == 160000
        assert wins[-1].shape[-1] == 16000 * 25 - 2 * 144000

    def test_short_audio_single_window(self):
        wins = split_to_overlapping_windows(np.zeros((1, 8000)), 16000)
        assert len(wins) == 1


class TestLPAPS:
    def test_identity_is_zero(self, ext):
        a = tone(440)
        m = LPAPS(ext)
        assert m(a, a, 16000, 16000) == pytest.approx(0.0, abs=1e-9)

    def test_symmetry_and_positive(self, ext):
        a, b = tone(440), tone(1760)
        m = LPAPS(ext)
        d_ab = m(a, b, 16000, 16000)
        d_ba = m(b, a, 16000, 16000)
        assert d_ab > 0
        assert d_ab == pytest.approx(d_ba, rel=1e-6)

    def test_normalization_invariance(self):
        # scaling a stage's features uniformly must not change the distance
        s1 = [np.random.RandomState(0).rand(1, 4, 8, 8)]
        s2 = [np.random.RandomState(1).rand(1, 4, 8, 8)]
        d1 = lpaps_distance(s1, s2, channel_axis=1)
        d2 = lpaps_distance([s1[0] * 7.0], [s2[0] * 0.3], channel_axis=1)
        assert d1 == pytest.approx(d2, rel=1e-6)

    def test_windowed(self, ext):
        a, b = tone(440, 12.0), tone(880, 12.0)
        m = LPAPS(ext)
        assert m.windowed(a[0], b[0], 16000, 16000) > 0


class TestClapConsistency:
    def test_update_compute_reset(self, ext):
        m = CLAPTextConsistencyMetric(ext)
        m.update(tone(440), ["a sine tone"], 16000)
        v1 = m.compute()
        assert -1.0 <= v1 <= 1.0
        m.reset()
        with pytest.raises(RuntimeError):
            m.compute()

    def test_windowed_deterministic(self, ext):
        m = CLAPTextConsistencyMetric(ext)
        s1 = m.windowed(tone(440, 12.0)[0], 16000, "a tone")
        s2 = m.windowed(tone(440, 12.0)[0], 16000, "a tone")
        assert s1 == pytest.approx(s2)


class TestFAD:
    def test_identical_sets_zero(self):
        e = np.random.RandomState(0).randn(64, 8)
        assert frechet_distance(e, e.copy()) == pytest.approx(0.0, abs=1e-6)

    def test_closed_form_diagonal_gaussians(self):
        """Exact FAD for diagonal-covariance sets: with empirical moments
        (mu_a, diag(va)) and (mu_b, diag(vb)),
        FAD = |mu_a-mu_b|^2 + sum(va + vb - 2 sqrt(va vb))."""
        d = 6
        rng = np.random.RandomState(1)
        mu_a, mu_b = rng.randn(d), rng.randn(d)
        sa, sb = rng.uniform(0.5, 2.0, d), rng.uniform(0.5, 2.0, d)
        # construct sets whose EMPIRICAL mean/cov are exactly (mu, diag(s^2)):
        # symmetric +/- unit vectors scaled by s*sqrt(d) around mu
        eye = np.eye(d)
        a = np.concatenate([mu_a + eye * (sa * np.sqrt(d)),
                            mu_a - eye * (sa * np.sqrt(d))])
        b = np.concatenate([mu_b + eye * (sb * np.sqrt(d)),
                            mu_b - eye * (sb * np.sqrt(d))])
        # np.cov divides by N-1: rescale to make empirical cov exact
        n = 2 * d
        va = sa ** 2 * n / (n - 1)
        vb = sb ** 2 * n / (n - 1)
        expected = (np.sum((mu_a - mu_b) ** 2)
                    + np.sum(va + vb - 2 * np.sqrt(va * vb)))
        got = frechet_distance(a, b, eps=0.0)
        assert got == pytest.approx(expected, rel=1e-6)

    def test_matches_scipy_sqrtm_formula(self):
        """General (non-diagonal) case vs a direct scipy.linalg.sqrtm
        evaluation of the same empirical-moment formula."""
        import scipy.linalg

        rng = np.random.RandomState(2)
        a, b = rng.randn(100, 5), rng.randn(80, 5) @ rng.randn(5, 5) * 0.3 + 1.0
        mu_a, mu_b = a.mean(0), b.mean(0)
        ca, cb = np.cov(a, rowvar=False), np.cov(b, rowvar=False)
        covmean = scipy.linalg.sqrtm(ca @ cb).real
        expected = ((mu_a - mu_b) @ (mu_a - mu_b)
                    + np.trace(ca + cb - 2 * covmean))
        assert frechet_distance(a, b, eps=0.0) == pytest.approx(expected, rel=1e-5)

    def test_shifted_sets_positive(self):
        rng = np.random.RandomState(0)
        a = rng.randn(128, 8)
        b = rng.randn(128, 8) + 3.0
        d = frechet_distance(a, b)
        assert d == pytest.approx(8 * 9.0, rel=0.2)  # |mu diff|^2 dominates

    def test_scorer_caching(self, ext, tmp_path):
        from scipy.io import wavfile

        gen, ref = tmp_path / "gen", tmp_path / "ref"
        gen.mkdir(), ref.mkdir()
        for d, freq in ((gen, 440), (ref, 450)):
            for i in range(2):
                wavfile.write(d / f"{i}.wav", 16000,
                              (tone(freq + i, 11.0)[0] * 32767).astype(np.int16))
        scorer = FADScorer(ext)
        d1 = scorer.score_dirs(str(gen), str(ref))
        assert os.path.exists(gen / "0.wav.emb.npy")  # cache written
        d2 = scorer.score_dirs(str(gen), str(ref))  # from cache
        assert d1 == pytest.approx(d2)
        assert d1 >= 0


class TestOrchestration:
    def _make_results(self, root):
        from scipy.io import wavfile

        inner = root / "model" / "clip" / "src_piano" / "dec_a_trumpet__neg__"
        inner.mkdir(parents=True)
        wavfile.write(inner / "cfg_e_3.0_cfg_d_12.0_skip_100_123.wav", 16000,
                      (tone(440, 11.0)[0] * 32767).astype(np.int16))
        wavfile.write(inner / "orig.wav", 16000,
                      (tone(445, 11.0)[0] * 32767).astype(np.int16))
        return root / "model"

    def test_calc_and_combine(self, ext, tmp_path):
        ours_root = self._make_results(tmp_path)
        ckpt = str(tmp_path / "scores.json")
        state = calc_scores(ext, ours_dirs=[str(ours_root)], prev_pt=ckpt,
                            verbose=False)
        assert len(state.records) == 1
        rec = next(iter(state.records.values()))
        assert rec.skip == 100 and rec.tarcfg == 12.0 and rec.srccfg == 3.0
        assert rec.target_prompt == "a trumpet"
        assert rec.clap is not None and rec.lpaps is not None

        # resume path: no recompute, same records
        state2 = calc_scores(ext, ours_dirs=[str(ours_root)], prev_pt=ckpt,
                             verbose=False)
        assert state2.records.keys() == state.records.keys()

        dfs = combine_scores(state)
        assert "ours" in dfs and len(dfs["ours"]) == 1

    def test_musicgen_lanes(self, ext, tmp_path):
        """MusicGen / MusicGen-large baseline lanes (reference
        evals/utils.py:211-216, 340-361): flat <root>/<input>/
        prompt_<target>.wav per prompt; scored with CLAP vs target and
        LPAPS vs the original input, and emitted as their own tables."""
        from scipy.io import wavfile

        ours_root = self._make_results(tmp_path)
        orig_dir = tmp_path / "inputs"
        orig_dir.mkdir()
        wavfile.write(orig_dir / "clip.wav", 16000,
                      (tone(445, 11.0)[0] * 32767).astype(np.int16))
        for name, freq in (("musicgen", 440), ("musicgen_large", 442)):
            mg = tmp_path / name / "clip"
            mg.mkdir(parents=True)
            wavfile.write(mg / "prompt_a trumpet.wav", 16000,
                          (tone(freq, 11.0)[0] * 32767).astype(np.int16))
        state = calc_scores(
            ext, ours_dirs=[str(ours_root)],
            musicgen_dirs=[str(tmp_path / "musicgen")],
            musicgen_large_dirs=[str(tmp_path / "musicgen_large")],
            inputs_orig=str(orig_dir), verbose=False)
        dfs = combine_scores(state)
        assert set(dfs) == {"ours", "musicgen", "musicgen_large"}
        for lane in ("musicgen", "musicgen_large"):
            row = dfs[lane].iloc[0]
            # the reference keys musicgen files by filename[7:-4] — prompt
            # kept verbatim — and scores once per (input, prompt)
            assert row["target_prompt"] == "a trumpet"
            assert row["audio_input"] == "clip"
            assert row["clap"] is not None and row["lpaps"] is not None
            assert np.isnan(row["skip"])  # no skip/cfg dims on baselines

    def test_eval_cli_has_musicgen_flags(self):
        from audioeditingcode_tpu.cli.evals_run import build_parser

        args = build_parser().parse_args(
            ["--musicgen_dirs", "/a", "--musicgen_large_dirs", "/b"])
        assert args.musicgen_dirs == ["/a"]
        assert args.musicgen_large_dirs == ["/b"]


class TestTradeoffTables:
    def test_supervised_table(self):
        import pandas as pd

        from audioeditingcode_tpu.evals.scores import supervised_tradeoff_table

        df = pd.DataFrame([
            {"skip": 100, "tarcfg": 12.0, "srccfg": 3.0, "clap": 0.3, "lpaps": 0.2},
            {"skip": 100, "tarcfg": 12.0, "srccfg": 3.0, "clap": 0.5, "lpaps": 0.4},
            {"skip": 120, "tarcfg": 12.0, "srccfg": 3.0, "clap": 0.6, "lpaps": 0.5},
        ])
        t = supervised_tradeoff_table(df)
        assert len(t) == 2
        row = t[t["skip"] == 100].iloc[0]
        assert row["clap_mean"] == pytest.approx(0.4)
        assert row["clap_count"] == 2

    def test_method_comparison_table(self):
        """Side-by-side method lanes: sweep dims for ours, NaN-dim flat rows
        for the MusicGen baselines (the paper's comparison columns)."""
        import numpy as np
        import pandas as pd

        from audioeditingcode_tpu.evals.scores import method_comparison_table

        ours = pd.DataFrame([
            {"skip": 100, "tarcfg": 12.0, "srccfg": 3.0, "clap": 0.3, "lpaps": 0.2},
            {"skip": 120, "tarcfg": 12.0, "srccfg": 3.0, "clap": 0.6, "lpaps": 0.5},
        ])
        mg = pd.DataFrame([
            {"skip": np.nan, "tarcfg": np.nan, "srccfg": np.nan,
             "clap": 0.45, "lpaps": 0.9},
        ])
        t = method_comparison_table({"ours": ours, "musicgen": mg})
        assert set(t["method"]) == {"ours", "musicgen"}
        assert len(t[t["method"] == "ours"]) == 2
        row = t[t["method"] == "musicgen"].iloc[0]
        assert row["clap_mean"] == pytest.approx(0.45)
        assert np.isnan(row["skip"])

    def test_unsupervised_table(self):
        from audioeditingcode_tpu.evals.scores import unsupervised_fad_table

        t = unsupervised_fad_table({150: {"orig": 1.2, "fma_pop": 4.0},
                                    100: {"orig": 2.0, "fma_pop": 3.1}})
        assert list(t["skip"]) == [100, 150]
        assert "fma_pop" in t.columns


class TestFigures:
    """Figure rendering from the tidy score tables (VERDICT r3 #7 — the
    reference renders these inside SupEval.ipynb cells 10-14 and
    UnsupEval.ipynb cell 16; here they're plain functions over the CSVs)."""

    def _dfs(self):
        import numpy as np
        import pandas as pd

        ours = pd.DataFrame([
            {"skip": s, "tarcfg": t, "srccfg": 3.0,
             "clap": 0.3 + 0.001 * s + 0.01 * t,
             "lpaps": 2.0 - 0.005 * s}
            for s in (100, 120, 140, 160) for t in (8.0, 12.0)
        ])
        sdedit = pd.DataFrame([
            {"skip": s, "tarcfg": 12.0, "clap": 0.25 + 0.001 * s,
             "lpaps": 2.5 - 0.004 * s} for s in (100, 130, 160)
        ])
        musicgen = pd.DataFrame([
            {"skip": np.nan, "tarcfg": np.nan, "srccfg": np.nan,
             "clap": 0.5, "lpaps": 3.0},
        ])
        return {"ours": ours, "sdedit": sdedit, "musicgen": musicgen}

    def test_tradeoff_figure_curves_and_points(self):
        from audioeditingcode_tpu.evals.figures import tradeoff_figure

        fig = tradeoff_figure(self._dfs(), sweep="skip")
        assert fig is not None
        ax = fig.axes[0]
        labels = [ln.get_label() for ln in ax.get_lines()]
        # curves for the sweeping lanes, a point for the flat baseline
        assert {"ours", "sdedit", "musicgen"} <= set(labels)
        ours_line = next(ln for ln in ax.get_lines()
                         if ln.get_label() == "ours")
        # the ours curve has one point per skip at the dominant cfgs
        assert len(ours_line.get_xdata()) == 4
        # tstart annotations (200 - skip), notebook-style
        texts = {t.get_text() for t in ax.texts}
        assert {"100", "80", "60", "40"} <= texts
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_save_eval_figures_writes_per_sweep_pngs(self, tmp_path):
        from audioeditingcode_tpu.evals.figures import save_eval_figures

        written = save_eval_figures(self._dfs(), str(tmp_path))
        names = {os.path.basename(p) for p in written}
        # skip always; tarcfg varies in ours; srccfg is constant -> absent
        assert names == {"tradeoff_skip.png", "tradeoff_tarcfg.png"}
        for p in written:
            assert os.path.getsize(p) > 1000

    def test_fad_scatter(self, tmp_path):
        from audioeditingcode_tpu.evals.figures import fad_scatter_figure
        from audioeditingcode_tpu.evals.scores import unsupervised_fad_table

        t = unsupervised_fad_table({150: {"orig": 1.2, "fma_pop": 4.0},
                                    100: {"orig": 2.0, "fma_pop": 3.1},
                                    85: {"orig": 2.4, "fma_pop": 3.0}})
        fig = fad_scatter_figure(t)
        assert fig is not None
        ax = fig.axes[0]
        xs = list(ax.get_lines()[0].get_xdata())
        # plotted in ascending-skip order; orig-FAD shrinks as skip grows
        assert xs == sorted(xs, reverse=True)
        texts = {t_.get_text() for t_ in ax.texts}
        assert {"115", "100", "50"} <= texts  # tstart = 200 - skip
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_eval_cli_has_plot_flags(self):
        from audioeditingcode_tpu.cli.evals_run import build_parser

        args = build_parser().parse_args(
            ["--plots", "--fad_gen_dirs", "150=/g150", "100=/g100",
             "--fad_ref_dirs", "/orig", "/fma_pop", "--total_steps", "200"])
        assert args.plots and args.total_steps == 200
        assert args.fad_gen_dirs == ["150=/g150", "100=/g100"]


class TestClapOracle:
    """The torch-CLAP oracle extractor's plumbing, on a tiny RANDOM-weight
    CLAP (no checkpoint downloads — validates shapes/axes, not semantics)."""

    @pytest.fixture(scope="class")
    def clap_ext(self):
        import warnings

        warnings.filterwarnings("ignore")
        from transformers import ClapConfig, ClapFeatureExtractor, ClapModel
        from transformers.models.clap.configuration_clap import (
            ClapAudioConfig,
            ClapTextConfig,
        )

        from audioeditingcode_tpu.evals.features import TransformersClapExtractor

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

        return TransformersClapExtractor.from_components(ClapModel(cfg), Proc())

    def test_embed_audio_shape_and_norm(self, clap_ext):
        v = clap_ext.embed_audio(tone(440, 3.0), 16000)
        assert v.shape == (16,)
        assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-4)

    def test_fad_embedding_layout_matches_fadtk(self, clap_ext, tmp_path):
        """fadtk protocol cross-check on the transformers-CLAP tower: a file
        embeds to (n_windows, projection_dim) L2-normalized rows — one row
        per 10 s window with the reference's int-second stride
        (fadtk_utils.py:17) — and the per-file cache is reused."""
        from scipy.io import wavfile

        p = tmp_path / "a.wav"
        wavfile.write(str(p), 16000,
                      (tone(440, 21.0)[0] * 32767).astype(np.int16))
        scorer = FADScorer(clap_ext)  # default 10 s / 10% overlap
        embs = scorer.embed_file(str(p))
        # 21 s / 9 s stride -> windows at 0, 9, 18 s; the 3 s tail window
        # passes the >=1 s cutoff -> 3 rows
        assert embs.shape == (3, clap_ext.embed_dim)
        np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-4)
        assert os.path.exists(str(p) + ".emb.npy")

    def test_fad_default_binds_music_checkpoint(self, monkeypatch):
        """features.fad_extractor defaults to fadtk's clap-laion-music
        convention (transformers id laion/larger_clap_music)."""
        from audioeditingcode_tpu.evals import features

        seen = {}

        def fake_default(model_name_or_path=None, backend="jax",
                         allow_mel_fallback=False):
            seen["id"] = model_name_or_path
            return features.MelStageExtractor()

        monkeypatch.setattr(features, "default_extractor", fake_default)
        features.fad_extractor()
        assert seen["id"] == "laion/larger_clap_music"

    def test_default_extractor_binds_reference_protocol(self, monkeypatch):
        """VERDICT r2 #2: without --clap_model the eval stack must target
        the reference LPAPS/consistency checkpoint (transformers port of
        music_speech_epoch_15_esc_89.25.pt, reference evals/lpaps.py:27-29)
        and HARD-ERROR if it is unreachable, naming the protocol id."""
        import inspect

        import pytest

        from audioeditingcode_tpu.evals import features

        assert (features.LPAPS_CLAP_MUSIC_SPEECH
                == "laion/larger_clap_music_and_speech")
        # both extractor classes default to the protocol checkpoint
        for cls in (features.TransformersClapExtractor,
                    features.FlaxClapExtractor):
            sig = inspect.signature(cls.__init__)
            assert (sig.parameters["model_name_or_path"].default
                    == features.LPAPS_CLAP_MUSIC_SPEECH)

        seen = {}

        def boom(model_name_or_path, *a, **k):
            seen["id"] = model_name_or_path
            raise OSError("offline")

        monkeypatch.setattr(features, "FlaxClapExtractor", boom)
        with pytest.raises(RuntimeError, match="larger_clap_music_and_speech"):
            features.default_extractor()
        assert seen["id"] == features.LPAPS_CLAP_MUSIC_SPEECH
        # the fallback is an explicit opt-in and warns loudly
        with pytest.warns(UserWarning, match="NOT protocol-comparable"):
            ext = features.default_extractor(allow_mel_fallback=True)
        assert isinstance(ext, features.MelStageExtractor)

    def test_eval_cli_pins_protocol_defaults(self):
        """The eval CLI's parser defaults match the reference protocol:
        no silent mel fallback, clap_model resolved to the reference
        checkpoint inside default_extractor."""
        from audioeditingcode_tpu.cli.evals_run import build_parser

        args = build_parser().parse_args([])
        assert args.clap_model is None  # resolved to protocol id downstream
        assert args.allow_mel_fallback is False

    def test_stages_for_lpaps(self, clap_ext):
        stages = clap_ext.stages(tone(440, 3.0), 16000)
        assert 1 <= len(stages) <= 4
        m = LPAPS(clap_ext)
        d = m(tone(440, 3.0), tone(880, 3.0), 16000, 16000)
        assert d > 0
        assert m(tone(440, 3.0), tone(440, 3.0), 16000, 16000) == pytest.approx(
            0.0, abs=1e-8)
