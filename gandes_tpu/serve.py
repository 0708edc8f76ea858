"""Warm-model serving: HTTP generation endpoint over the trained GANs.

The reference's only inference surface is `demo.ipynb` (reload the
checkpoint, run cells, play files — `demo.ipynb` cells 7-10, 25-28). This
module is the production-serving equivalent: load a checkpoint ONCE, keep
the jitted generator graphs warm, and serve generation requests over HTTP
with JSON/base64 payloads and latency accounting.

Endpoints (JSON in/out):
  GET  /healthz
       -> {"status": "ok", "model": "mmgan", "requests": N,
           "avg_latency_s": ...}
  POST /generate/mmgan   {"n": 1, "seed": 0, "wav": false}
       -> {"midi_b64": [...], "roll_sums": [...], "wav_b64": [...]?,
           "latency_s": ...}
  POST /generate/gandes  {"n": 1, "seed": 0}
       -> {"wav_b64": [...], "mel_shape": [...], "latency_s": ...}

Requests are serialized with a lock: generation couples the device forward
to the host DES stage, which seeds the global numpy RNG for reference
parity (`matrix_sim_process.py:114-115` semantics) — concurrent requests
would interleave those streams. Scale-out is process-level (one server per
chip), matching the framework's host-plane parallelism story
(docs/SCALING.md).
"""

from __future__ import annotations

import base64
import json
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class BadRequest(ValueError):
    """Client-side error (malformed body, n out of range) -> HTTP 400.
    Internal generation failures stay plain exceptions -> HTTP 500."""


# ALL services in a process share this generation lock by default:
# generation seeds the process-global numpy RNG (reference parity), so any
# two concurrent generations — same family or not — would interleave the
# stream and break per-seed byte stability. Pass an explicit ``lock`` only
# to isolate tests.
_GENERATION_LOCK = threading.Lock()


class GenerationService:
    """Loads checkpoints once; serves repeated generation requests warm.

    ``model``: 'mmgan' (matrix+params -> DES -> MIDI) or 'gandes'
    (matrix -> DES -> MIDI -> synth WAV -> mel). ``checkpoint`` is an orbax
    dir trained here; ``torch_checkpoint`` a reference state_dict.
    """

    def __init__(self, model: str = "mmgan", checkpoint: str | None = None,
                 torch_checkpoint: str | None = None, start: int = 100,
                 sequence_length: int = 50, max_n: int = 64,
                 lock: threading.Lock | None = None,
                 sound_font: str | None = None):
        if model not in ("mmgan", "gandes"):
            raise ValueError(f"unknown model {model!r}")
        self.model = model
        self.max_n = max_n
        self.sound_font = sound_font  # .sf2 -> sample-playback WAV renders
        # the process-wide default makes the safety invariant self-enforcing
        # (see _GENERATION_LOCK) — no caller plumbing required
        self._lock = lock or _GENERATION_LOCK
        self.requests = 0
        self._latency_sum = 0.0

        # inference forwards are jitted and cached (mmgan_loop._eval_forward
        # / loading.gandes_eval_forward) — warm compiled graphs are the
        # point of a serving process: eager flax applies dispatch each op
        # separately, which on a remote-attached TPU costs minutes per
        # request in per-op compiles
        if model == "mmgan":
            from gandes_tpu.train.loading import load_mmgan_state
            from gandes_tpu.train.mmgan_loop import MMGANConfig

            self.cfg = MMGANConfig(start=start, sequence_length=sequence_length)
            self.state = load_mmgan_state(self.cfg, checkpoint, torch_checkpoint)
        else:
            from gandes_tpu.train.gandes_loop import GanDesConfig
            from gandes_tpu.train.loading import load_gandes_state

            self.cfg = GanDesConfig()
            self.state, self.gen = load_gandes_state(self.cfg, checkpoint,
                                                     torch_checkpoint)
            from gandes_tpu.train.loading import gandes_eval_forward

            self._fwd = gandes_eval_forward(self.gen)

    # ------------------------------------------------------------ handlers

    def healthz(self) -> dict:
        n = self.requests
        return {
            "status": "ok",
            "model": self.model,
            "requests": n,
            "avg_latency_s": round(self._latency_sum / n, 4) if n else None,
            # requests serialize on the (process-wide by default) generation
            # lock; True = SOME generation is in flight in this process —
            # with co-hosted families that includes the other family's
            # requests, since they contend for the same lock
            "busy": self._lock.locked(),
        }

    def generate(self, n: int = 1, seed: int = 0, wav: bool = False) -> dict:
        if not 1 <= n <= self.max_n:
            raise BadRequest(f"n must be in [1, {self.max_n}], got {n}")
        with self._lock:
            t0 = time.perf_counter()
            if self.model == "mmgan":
                out = self._generate_mmgan(n, seed, wav)
            else:
                out = self._generate_gandes(n, seed)
            dt = time.perf_counter() - t0
            self.requests += 1
            self._latency_sum += dt
            out["latency_s"] = round(dt, 4)
            return out

    def _generate_mmgan(self, n, seed, wav) -> dict:
        # literally the CLI's inference path (mmgan_loop.generate_midi,
        # whose forward is jitted + cached) — structural byte parity
        from gandes_tpu.train.mmgan_loop import generate_midi

        cfg = self.cfg
        rng = np.random.RandomState(seed)
        midi_b64, wav_b64, roll_sums = [], [], []
        failed = 0
        with tempfile.TemporaryDirectory() as tmp:
            for i in range(n):
                noise1 = rng.randn(1, cfg.noise_dim).astype(np.float32)
                noise2 = rng.randn(1, cfg.noise_dim).astype(np.float32)
                beats = np.zeros((1, cfg.max_beat_length), np.float32)
                np.random.seed(seed + i)  # DES routing stream (parity with the CLI)
                rolls = generate_midi(self.state, cfg, noise1, noise2, beats,
                                      out_dir=tmp)
                roll_sums.append(float(np.sum(rolls[0])))
                path = os.path.join(tmp, "generation.mid")
                # a failed/timed-out sim leaves no file — report the slot as
                # null rather than silently re-serving the previous sample
                if not os.path.exists(path):
                    failed += 1
                    midi_b64.append(None)
                    if wav:
                        wav_b64.append(None)
                    continue
                with open(path, "rb") as f:
                    midi_bytes = f.read()
                midi_b64.append(base64.b64encode(midi_bytes).decode())
                if wav:
                    from gandes_tpu.data.audio import save_wav
                    from gandes_tpu.music.synth import render_midi

                    audio = render_midi(path, sound_font=self.sound_font)
                    wpath = os.path.join(tmp, "generation.wav")
                    save_wav(wpath, audio)
                    with open(wpath, "rb") as f:
                        wav_b64.append(base64.b64encode(f.read()).decode())
                os.remove(path)  # never re-serve a stale file for sample i+1
        out = {"midi_b64": midi_b64, "roll_sums": roll_sums, "failed": failed}
        if wav:
            out["wav_b64"] = wav_b64
        return out

    def _generate_gandes(self, n, seed) -> dict:
        import jax

        from gandes_tpu.bridge.gandes_decode import matrix_to_wav

        noise = jax.random.normal(jax.random.key(seed), (n, self.cfg.z_dim))
        mats = self._fwd(self.state.g_params, self.state.g_stats, noise)
        np.random.seed(seed)
        wav_b64 = []
        with tempfile.TemporaryDirectory() as tmp:
            specs = matrix_to_wav(np.asarray(mats), size=20, start=0, end=216,
                                  out_dir=tmp, sound_font=self.sound_font)
            for i in range(n):
                with open(os.path.join(tmp, "wav", f"output_{i}.wav"), "rb") as f:
                    wav_b64.append(base64.b64encode(f.read()).decode())
        return {"wav_b64": wav_b64, "mel_shape": list(np.asarray(specs).shape)}


def make_http_server(service, host: str = "127.0.0.1",
                     port: int = 8472) -> ThreadingHTTPServer:
    """Returns an unstarted ThreadingHTTPServer bound to (host, port);
    call ``serve_forever()`` (and ``shutdown()`` from another thread).

    ``service`` is a :class:`GenerationService` or a dict
    ``{model_name: service}`` to host several model families in one
    process — each keeps its own stats, but all share the process-wide
    generation lock by default (see ``_GENERATION_LOCK``).
    """
    services = service if isinstance(service, dict) else {service.model: service}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; the services keep stats
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                healths = {name: svc.healthz() for name, svc in services.items()}
                if len(healths) == 1:
                    self._reply(200, next(iter(healths.values())))
                else:
                    self._reply(200, {"status": "ok", "models": healths})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            service = next(
                (svc for name, svc in services.items()
                 if self.path == f"/generate/{name}"), None)
            if service is None:
                served = ", ".join(f"/generate/{n}" for n in services)
                self._reply(404, {"error": f"unknown path {self.path}; "
                                           f"serving {served}"})
                return
            try:  # request parsing: any failure here is the client's fault
                length = int(self.headers.get("Content-Length") or 0)
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("body must be a JSON object")
                n = int(req.get("n", 1))
                seed = int(req.get("seed", 0))
                wav = bool(req.get("wav", False))
            except (ValueError, TypeError) as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                self._reply(200, service.generate(n=n, seed=seed, wav=wav))
            except BadRequest as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # internal generation failure
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def run_server(model="mmgan", checkpoint=None, torch_checkpoint=None,
               host="127.0.0.1", port=8472, warmup=True, start=100,
               sequence_length=50, sound_font=None):
    """``model='both'`` hosts mmgan AND gandes in one process; checkpoint
    args are rejected in that mode (it is ambiguous which family they
    target — run one server per checkpointed model instead)."""
    if model == "both" and (checkpoint or torch_checkpoint):
        raise ValueError(
            "--model both cannot take checkpoint args (ambiguous target); "
            "serve each checkpointed model from its own process")
    models = ("mmgan", "gandes") if model == "both" else (model,)
    services = {}
    for m in models:
        # services share _GENERATION_LOCK by default — no plumbing needed
        services[m] = GenerationService(
            model=m, checkpoint=checkpoint, torch_checkpoint=torch_checkpoint,
            start=start, sequence_length=sequence_length,
            sound_font=sound_font)
    if warmup:  # compile + first DES round trip before accepting traffic
        for m, svc in services.items():
            svc.generate(n=1, seed=0)
            print(f"{m} warmup done in {svc._latency_sum:.2f}s")
            # keep the compile-heavy warmup out of /healthz request stats
            svc.requests = 0
            svc._latency_sum = 0.0
    server = make_http_server(services, host, port)
    endpoints = ", ".join(f"POST /generate/{m}" for m in services)
    print(f"serving {'+'.join(services)} on http://{host}:{port} "
          f"({endpoints}, GET /healthz)")
    server.serve_forever()
