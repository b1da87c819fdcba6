"""Demo-page generator: results-dir scan + HTML rendering
(tools/build_demo_page.py; reference equivalent: the static docs/supp.html
with embedded result audio, /root/reference/docs/supp.html)."""

import os

import numpy as np
from scipy.io import wavfile

from tools.build_demo_page import main, render, scan_results


def _fake_results(root):
    d = os.path.join(root, "tiny-audioldm", "clip",
                     "src_a_rock_song", "dec_a_metal_song__neg__")
    os.makedirs(d)
    t = np.zeros(1600, np.int16)
    wavfile.write(os.path.join(d, "orig.wav"), 16000, t)
    wavfile.write(os.path.join(d, "cfg_e_3_cfg_d_12_skip_2_123.wav"), 16000, t)
    wavfile.write(os.path.join(d, "cfg_e_3_cfg_d_15_skip_4_124.wav"), 16000, t)
    return d


def test_scan_and_render(tmp_path):
    _fake_results(str(tmp_path / "results"))
    rows = scan_results(str(tmp_path / "results"))
    assert len(rows) == 1
    r = rows[0]
    assert r.model == "tiny-audioldm"
    assert r.source_prompt == "a rock song"
    assert r.target_prompt == "a metal song"
    assert r.orig_wav and len(r.edited) == 2

    out = str(tmp_path / "docs" / "supp.html")
    page = render(rows, out)
    assert page.count("<audio") == 3  # orig + 2 edits
    assert "a metal song" in page


def test_main_copies_audio(tmp_path):
    _fake_results(str(tmp_path / "results"))
    out = str(tmp_path / "docs" / "supp.html")
    audio_dir = str(tmp_path / "docs" / "resources" / "audio")
    main(["--results", str(tmp_path / "results"), "--out", out,
          "--copy-audio", audio_dir])
    assert os.path.exists(out)
    copied = os.listdir(audio_dir)
    assert len(copied) == 3
    page = open(out).read()
    # copied files referenced relative to the page, no absolute tmp paths
    assert "resources/audio/" in page and str(tmp_path) not in page


def test_empty_results_placeholder(tmp_path):
    (tmp_path / "results").mkdir()
    page = render(scan_results(str(tmp_path / "results")),
                  str(tmp_path / "supp.html"))
    assert "No results yet" in page
