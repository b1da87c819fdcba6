"""wandb logging parity, exercised offline with a fake wandb module.

The reference logs config + audio + spectrogram images on every CLI run and
PC-correlation line plots during extraction (reference:
code/main_run.py:96-102,226-231; main_pc_extract_inv.py:85-92,222-231).
These tests inject a recording fake `wandb` into sys.modules and run the
real CLIs with logging ENABLED to pin that surface.
"""

import sys
import types

import numpy as np
import pytest
from scipy.io import wavfile


class _FakeRun:
    def finish(self):
        pass


class _Recorder(types.ModuleType):
    """Duck-typed wandb: records every init/config/log call."""

    def __init__(self):
        super().__init__("wandb")
        self.inits = []
        self.logs = []
        self.config = types.SimpleNamespace(
            update=lambda d, **k: self.inits.append(("config", dict(d))))
        self.plot = types.SimpleNamespace(
            line=lambda table, x, y, title=None: ("line", title))

    def init(self, **kwargs):
        self.inits.append(("init", kwargs))
        return _FakeRun()

    def log(self, d, **kwargs):
        self.logs.append(dict(d))

    def finish(self):
        pass

    def Audio(self, data, caption=None, sample_rate=None):
        assert np.asarray(data).size > 0
        assert sample_rate
        return ("audio", caption)

    def Image(self, data, caption=None):
        return ("image", caption)

    def Table(self, data=None, columns=None):
        return ("table", len(data or []))


@pytest.fixture
def fake_wandb(monkeypatch):
    rec = _Recorder()
    monkeypatch.setitem(sys.modules, "wandb", rec)
    return rec


@pytest.fixture
def clip(tmp_path):
    t = np.arange(16000, dtype=np.float32) / 16000
    p = tmp_path / "clip.wav"
    wavfile.write(str(p), 16000, (0.4 * np.sin(2 * np.pi * 330 * t) * 32767)
                  .astype(np.int16))
    return str(p)


def test_run_cli_disabled_by_default(fake_wandb):
    """wandb_disable defaults True (matching main_run.py:61) -> the stub is
    returned and nothing touches the wandb module (unit-level: the full-CLI
    enabled path below already covers main())."""
    from audioeditingcode_tpu.cli import common, run

    args = run.parse_args(["--init_aud", "x.wav", "--target_prompt", "p"])
    assert args.wandb_disable is True
    w = common.init_wandb(args, "text_edit", "run")
    assert isinstance(w, common.WandbStub)
    common.log_edit_artifacts(w, "n", 16000, np.zeros(10), np.zeros(10))
    common.log_pc_corrs(w, [], [], [], 1)
    assert fake_wandb.logs == [] and fake_wandb.inits == []


def test_run_cli_logs_when_enabled(fake_wandb, clip, tmp_path, monkeypatch):
    from audioeditingcode_tpu.cli import run

    args = run.parse_args([
        "--model_id", "test/tiny-audioldm", "--init_aud", clip,
        "--target_prompt", "a trumpet", "--num_diffusion_steps", "4",
        "--tstart", "2", "--results_path", str(tmp_path / "r"), "--seed", "0",
    ])
    args.wandb_disable = False
    monkeypatch.setattr(run, "parse_args", lambda argv=None: args)
    run.main([])

    # init surface: project AudInv, job_type, config.update(args)
    init_kwargs = [k for tag, k in fake_wandb.inits if tag == "init"]
    assert init_kwargs and init_kwargs[0]["project"] == "AudInv"
    assert init_kwargs[0]["job_type"] == "text_edit"
    configs = [k for tag, k in fake_wandb.inits if tag == "config"]
    assert configs and configs[0]["model_id"] == "test/tiny-audioldm"
    # artifact surface (reference main_run.py:226-231): orig/gen audio + specs
    merged = {k: v for d in fake_wandb.logs for k, v in d.items()}
    assert merged["orig"][0] == "audio"
    assert merged["gen"][0] == "audio"
    assert merged["orig_spec"][0] == "image"
    assert merged["gen_spec"][0] == "image"


@pytest.mark.slow
def test_pc_extract_logs_corr_diagnostics(fake_wandb, clip, tmp_path, monkeypatch):
    from audioeditingcode_tpu.cli import pc_extract

    args = pc_extract.parse_args([
        "--model_id", "test/tiny-audioldm", "--init_aud", clip,
        "--num_diffusion_steps", "4", "--drift_start", "3", "--drift_end", "1",
        "--iters", "3", "--n_evs", "1",
        "--results_path", str(tmp_path / "r"), "--seed", "0",
    ])
    args.wandb_disable = False
    monkeypatch.setattr(pc_extract, "parse_args", lambda argv=None: args)
    pc_extract.main([])

    init_kwargs = [k for tag, k in fake_wandb.inits if tag == "init"]
    assert init_kwargs and init_kwargs[0]["job_type"] == "pc_extraction_inv"
    merged = {k: v for d in fake_wandb.logs for k, v in d.items()}
    # convergence line plot + eigenvalue series + artifacts
    assert any(k.startswith("in_corr_") for k in merged), merged.keys()
    assert any(k.startswith("eigval_") for k in merged), merged.keys()
    assert "gen" in merged and "orig" in merged
