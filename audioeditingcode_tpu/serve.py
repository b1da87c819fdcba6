"""Minimal production-style inference server for text-based audio editing.

The reference is a research CLI; serving is a new first-class capability of
this framework: one process loads a pipeline, compiles the edit program ONCE
(params threaded as jit arguments, persistent compilation cache on), and
answers HTTP requests with no per-request tracing. Stdlib-only (no web
framework dependency).

API:
  GET  /healthz              -> {"status": "ok", "model": ..., "backend": ...}
  POST /edit                 -> edited WAV bytes
       JSON body: {"audio_b64": <base64 wav>, "target_prompt": str,
                   "source_prompt": str = "", "tstart": int = S//2,
                   "cfg_src": float = 3, "cfg_tar": float = 12, "seed": int}

Run: python main_serve.py --model_id ... --num_diffusion_steps 50 --port 8080
"""

from __future__ import annotations

import base64
import io
import json
import threading
from typing import Optional

import numpy as np


class EditService:
    """Holds the pipeline + a compiled-edit cache keyed by static knobs."""

    def __init__(self, model_id: str, num_diffusion_steps: int,
                 weights_dir: Optional[str] = None, dtype: str = "bfloat16"):
        import jax
        import jax.numpy as jnp

        from .utils.jax_setup import enable_compilation_cache

        enable_compilation_cache()
        from .models.registry import load_model, resolve_spec

        self.jax = jax
        self.jnp = jnp
        self.model_id = model_id
        self.steps = num_diffusion_steps
        self.spec = resolve_spec(model_id)
        self.is_stable_audio = self.spec.family == "stable-audio"
        self.pipe = load_model(
            model_id, num_diffusion_steps, weights_dir=weights_dir,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        )
        self.params = self.pipe.params_dict()
        self._lock = threading.Lock()  # one edit at a time per chip
        self._compiled = {}
        self._uncond = self.pipe.encode_text([""], negative=True)

    # each distinct tstart is a fresh trace+compile held under the lock
    # (minutes through a remote-compile tunnel) — bound the cache so a
    # client sweeping tstarts cannot grow it without limit
    MAX_COMPILED = 8

    def _edit_fn(self, tstart: int):
        """Compiled edit program for a given tstart (cfg scales are traced
        array inputs — no recompilation across requests)."""
        key = tstart
        if key in self._compiled:
            return self._compiled[key]
        if len(self._compiled) >= self.MAX_COMPILED:
            self._compiled.pop(next(iter(self._compiled)))  # oldest entry
        jax, jnp, pipe = self.jax, self.jnp, self.pipe
        from .editing.invert import (
            inversion_forward_process,
            inversion_reverse_process,
            make_cfg_denoiser,
        )

        stable_audio = self.is_stable_audio

        @jax.jit
        def edit(params, w0, rng, cfg_src, cfg_tar, uncond, src, tgt):
            p = pipe.bind(params)

            def den(uc, c, scale):
                return make_cfg_denoiser(
                    p.make_eps_pair(uc, c),
                    None if c is None else
                    jnp.full((1,) + w0.shape[1:], 1.0) * scale,
                )

            fwd = den(uncond, src, cfg_src)
            rev = den(uncond, tgt, cfg_tar)
            if stable_audio:
                # 2nd-order solver history threads from the forward pass
                # into the reverse pass (reference extra_info,
                # inversion_utils.py:129,219)
                _, zs, xts, extras = inversion_forward_process(
                    p.sched, fwd, w0, rng, return_extras=True)
                w_edit = inversion_reverse_process(
                    p.sched, rev, xts, zs[:tstart],
                    init_history=extras[tstart - 1])
            else:
                _, zs, xts = inversion_forward_process(p.sched, fwd, w0, rng)
                w_edit = inversion_reverse_process(p.sched, rev, xts, zs[:tstart])
            x_dec = p.vae_decode(w_edit)
            return p.decode_to_mel(x_dec)

        self._compiled[key] = edit
        return edit

    def edit(self, wav_bytes: bytes, target_prompt: str, source_prompt: str = "",
             tstart: Optional[int] = None, cfg_src: float = 3.0,
             cfg_tar: float = 12.0, seed: int = 0):
        """One edit request; returns (wav float32 (1, T), sample_rate)."""
        import tempfile

        from .utils.audio_io import load_audio

        jnp = self.jnp
        tstart = tstart if tstart is not None else self.steps // 2
        if not 1 <= int(tstart) <= self.steps:
            raise ValueError(
                f"tstart must be in [1, {self.steps}], got {tstart}")
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(wav_bytes)
            f.flush()
            x0, sr, duration = load_audio(
                f.name, self.pipe.mel_config, stft=not self.is_stable_audio,
                model_sr=self.pipe.get_sr())

        crop_end = None
        with self._lock:
            rng = self.jax.random.PRNGKey(seed)
            if self.is_stable_audio:
                # Per-request duration conditioning rides params_dict()
                # (traced arguments). The waveform CROP however is a static
                # slice inside vae_decode — baking it in would freeze the
                # first request's duration into the compiled program — so
                # the jitted edit decodes the full window and the crop
                # happens host-side below.
                max_s = self.pipe.audio_vae_length / self.pipe.sample_rate
                self.pipe.setup_duration(0.0, min(duration, max_s))
                crop_end = self.pipe._waveform_end
                self.pipe._waveform_start = 0
                self.pipe._waveform_end = None
                self.params = self.pipe.params_dict()
                rng, enc_rng = self.jax.random.split(rng)
                w0 = self.pipe.vae_encode(jnp.asarray(x0), rng=enc_rng)
            else:
                w0 = self.pipe.vae_encode(jnp.asarray(x0))
            uncond = self._uncond  # constant; encoded once at startup
            src = self.pipe.encode_text([source_prompt]) if source_prompt else None
            tgt = self.pipe.encode_text([target_prompt])
            fn = self._edit_fn(int(tstart))
            audio = fn(self.params, w0, rng,
                       jnp.asarray(cfg_src, jnp.float32),
                       jnp.asarray(cfg_tar, jnp.float32), uncond, src, tgt)
        audio = np.asarray(audio)
        if audio.ndim == 3:  # stable-audio stereo waveform (1, C, T)
            audio = audio[0]
        if crop_end is not None:
            audio = audio[..., :crop_end]
        return audio, sr


def _wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    from scipy.io import wavfile

    buf = io.BytesIO()
    a = np.clip(np.asarray(audio, np.float32), -1, 1)
    if a.ndim == 2:
        a = a.T
    wavfile.write(buf, sr, (a * 32767.0).astype(np.int16))
    return buf.getvalue()


def make_server(service: EditService, host: str = "127.0.0.1", port: int = 8080):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            print(f"[serve] {self.address_string()} {fmt % args}")

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._json(200, {"status": "ok", "model": service.model_id,
                                 "backend": jax.default_backend(),
                                 "steps": service.steps})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/edit":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                wav = base64.b64decode(req["audio_b64"])
                params = dict(
                    target_prompt=req["target_prompt"],
                    source_prompt=req.get("source_prompt", ""),
                    tstart=req.get("tstart"),
                    cfg_src=float(req.get("cfg_src", 3.0)),
                    cfg_tar=float(req.get("cfg_tar", 12.0)),
                    seed=int(req.get("seed", 0)),
                )
            except Exception as e:  # malformed request -> 400
                self._json(400, {"error": str(e)})
                return
            try:
                audio, sr = service.edit(wav, **params)
            except (KeyError, ValueError, TypeError) as e:  # bad values
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # server-side fault (compile/OOM/bug)
                self._json(500, {"error": str(e)})
                return
            try:
                body = _wav_bytes(audio, sr)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception:
                pass  # client hung up mid-response; headers already sent

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Audio-editing inference server")
    p.add_argument("--model_id", default="cvssp/audioldm-s-full-v2")
    p.add_argument("--num_diffusion_steps", type=int, default=50)
    p.add_argument("--weights_dir", default=None)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args(argv)

    from .cli.common import apply_platform_override

    apply_platform_override()
    service = EditService(args.model_id, args.num_diffusion_steps,
                          args.weights_dir, args.dtype)
    server = make_server(service, args.host, args.port)
    print(f"[serve] listening on {args.host}:{args.port} ({args.model_id})")
    server.serve_forever()


if __name__ == "__main__":
    main()
