"""Inference-server tests: service edit path + HTTP round trip."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from scipy.io import wavfile

from audioeditingcode_tpu.serve import EditService, make_server


def clip_bytes(sr=16000, seconds=0.5):
    t = np.arange(int(sr * seconds), dtype=np.float32) / sr
    buf = io.BytesIO()
    wavfile.write(buf, sr, (0.4 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16))
    return buf.getvalue()


@pytest.fixture(scope="module")
def service():
    return EditService("test/tiny-audioldm", num_diffusion_steps=5,
                       dtype="float32")


@pytest.mark.slow
def test_service_edit(service):
    audio, sr = service.edit(clip_bytes(), "a trumpet", tstart=3, seed=0)
    assert audio.ndim == 2 and audio.shape[-1] > 0
    assert np.isfinite(audio).all()


def test_service_compiled_reuse(service):
    """Second request with different cfg reuses the compiled program."""
    service.edit(clip_bytes(), "a trumpet", tstart=3, cfg_tar=12.0)
    n = len(service._compiled)
    service.edit(clip_bytes(), "a violin", tstart=3, cfg_tar=5.0)
    assert len(service._compiled) == n  # cfg is a traced input, not static


def test_http_round_trip(service):
    server = make_server(service, "127.0.0.1", 0)
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit",
            data=json.dumps({
                "audio_b64": base64.b64encode(clip_bytes()).decode(),
                "target_prompt": "a trumpet", "tstart": 3,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            wav = r.read()
        sr, data = wavfile.read(io.BytesIO(wav))
        assert sr == 16000 and len(data) > 0
    finally:
        server.shutdown()


def test_service_edit_stable_audio():
    """The Stable Audio family serves too: waveform frontend, per-request
    duration conditioning via the param bundle, 2nd-order solver history
    threaded from inversion into the reverse pass."""
    svc = EditService("test/tiny-stable-audio", num_diffusion_steps=3,
                      dtype="float32")
    audio, sr = svc.edit(clip_bytes(sr=44100, seconds=0.3), "tiny", tstart=2,
                         seed=0)
    assert audio.ndim == 2 and audio.shape[-1] > 0  # (C, T) stereo waveform
    assert np.isfinite(audio).all()


def test_stable_audio_serve_respects_per_request_duration():
    """The waveform crop is a static slice in vae_decode; serving must not
    freeze the first request's duration into the compiled program."""
    svc = EditService("test/tiny-stable-audio", num_diffusion_steps=3,
                      dtype="float32")
    max_s = svc.pipe.audio_vae_length / svc.pipe.sample_rate
    d1, d2 = 0.3 * max_s, 0.9 * max_s
    a1, sr1 = svc.edit(clip_bytes(sr=44100, seconds=d1), "tiny", tstart=2)
    n_programs = len(svc._compiled)
    a2, sr2 = svc.edit(clip_bytes(sr=44100, seconds=d2), "tiny", tstart=2)
    assert len(svc._compiled) == n_programs  # no per-duration retrace
    assert a2.shape[-1] > a1.shape[-1]  # crop follows the request
    # crop tracks each request's duration (within resampling rounding)
    assert abs(a1.shape[-1] - d1 * sr1) <= 2
    assert abs(a2.shape[-1] - d2 * sr2) <= 2
