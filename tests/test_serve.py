"""HTTP generation server: real socket round trips on an ephemeral port.

The service loads models once and serves repeated requests warm; these
tests drive it exactly as a client would — POST JSON over HTTP, decode the
base64 MIDI/WAV payloads, check they are real SMF/RIFF files.
"""

import base64
import json
import os
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mmgan_server(tmp_path_factory):
    from gandes_tpu.serve import GenerationService, make_http_server

    service = GenerationService(model="mmgan", start=0, sequence_length=50)
    server = make_http_server(service, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", service
    server.shutdown()


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_serve_healthz_and_generate(mmgan_server, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # DES writes logs/ relative to cwd
    base, service = mmgan_server

    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["model"] == "mmgan"

    status, out = _post(base + "/generate/mmgan", {"n": 2, "seed": 3})
    assert status == 200
    assert len(out["midi_b64"]) == 2 and len(out["roll_sums"]) == 2
    for b64 in out["midi_b64"]:
        midi = base64.b64decode(b64)
        assert midi[:4] == b"MThd"  # a real SMF file
    assert out["latency_s"] > 0

    # warm second request: stats accumulate, determinism per seed
    status2, out2 = _post(base + "/generate/mmgan", {"n": 2, "seed": 3})
    assert status2 == 200
    assert out2["midi_b64"] == out["midi_b64"]  # same seed -> same bytes
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        health2 = json.loads(r.read())
    assert health2["requests"] == health["requests"] + 2


def test_serve_wav_and_errors(mmgan_server, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    base, service = mmgan_server

    status, out = _post(base + "/generate/mmgan", {"n": 1, "seed": 1, "wav": True})
    assert status == 200
    wav = base64.b64decode(out["wav_b64"][0])
    assert wav[:4] == b"RIFF"

    # wrong endpoint -> 404 with a hint
    req = urllib.request.Request(base + "/generate/gandes", data=b"{}")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 404

    # malformed body / absurd n -> 400 JSON error, server stays alive
    for body in (b"{not json", json.dumps({"n": 10**6}).encode()):
        req = urllib.request.Request(
            base + "/generate/mmgan", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_serve_both_models(tmp_path, monkeypatch):
    """One process hosts both families: each endpoint routes to its own
    service, /healthz aggregates per-model stats."""
    import os

    from gandes_tpu.serve import GenerationService, make_http_server

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    services = {
        "mmgan": GenerationService(model="mmgan", start=0),
        "gandes": GenerationService(model="gandes"),
    }
    # the safety invariant is self-enforcing: services share the
    # process-wide generation lock by default (DES owns the global numpy
    # stream)
    assert services["mmgan"]._lock is services["gandes"]._lock
    server = make_http_server(services, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        status, out = _post(base + "/generate/mmgan", {"n": 1, "seed": 2})
        assert status == 200 and base64.b64decode(out["midi_b64"][0])[:4] == b"MThd"
        status, out = _post(base + "/generate/gandes", {"n": 1, "seed": 2})
        assert status == 200 and base64.b64decode(out["wav_b64"][0])[:4] == b"RIFF"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert set(health["models"]) == {"mmgan", "gandes"}
        assert health["models"]["mmgan"]["requests"] == 1
        assert health["models"]["gandes"]["requests"] == 1
    finally:
        server.shutdown()


def test_serve_concurrent_requests_stay_deterministic(tmp_path, monkeypatch):
    """Concurrent clients hammering both co-hosted families must not
    perturb per-seed outputs: generation seeds the process-global numpy
    RNG, and the (default, process-wide) lock serializes every generation.

    Byte-comparing DES outputs is safe here despite the wall-clock budget
    quirk: the native engine finishes these ~1000-customer sims by count in
    milliseconds, orders of magnitude under the >=0.5 s budgets a fresh G
    emits, so truncation would need a ~100x machine slowdown (the same
    assumption every other serve determinism test already makes)."""
    import concurrent.futures
    import os

    from gandes_tpu.serve import GenerationService, make_http_server

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    services = {
        "mmgan": GenerationService(model="mmgan", start=0),
        "gandes": GenerationService(model="gandes"),
    }
    server = make_http_server(services, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        # baseline: sequential, idle server
        seq = {}
        for seed in (11, 12):
            seq[("mmgan", seed)] = _post(
                base + "/generate/mmgan", {"n": 1, "seed": seed})[1]["midi_b64"]
            seq[("gandes", seed)] = _post(
                base + "/generate/gandes", {"n": 1, "seed": seed})[1]["wav_b64"]

        # the same four requests fired concurrently from four threads
        jobs = [("mmgan", 11), ("gandes", 11), ("mmgan", 12), ("gandes", 12)]

        def fire(job):
            model, seed = job
            return job, _post(base + f"/generate/{model}",
                              {"n": 1, "seed": seed})[1]

        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
            for job, out in ex.map(fire, jobs):
                model, seed = job
                key = "midi_b64" if model == "mmgan" else "wav_b64"
                assert out[key] == seq[job], f"{job} diverged under concurrency"
    finally:
        server.shutdown()


def test_serve_internal_error_is_500():
    """Internal generation failures surface as 500, not 400 (client error
    codes are reserved for malformed bodies / n out of range)."""
    from gandes_tpu.serve import make_http_server

    class Broken:
        model = "mmgan"

        def healthz(self):
            return {"status": "ok"}

        def generate(self, **kw):
            raise RuntimeError("decode exploded")

    server = make_http_server(Broken(), port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        req = urllib.request.Request(base + "/generate/mmgan", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 500
        assert "decode exploded" in json.loads(ei.value.read())["error"]
    finally:
        server.shutdown()


def test_serve_matches_eager_forward_bytes(tmp_path, monkeypatch):
    """The server (cached jitted eval forward, shared with the CLI via
    generate_midi) produces MIDI byte-identical to an EAGER per-op forward
    of the same models — pinning that jit compilation does not perturb the
    generator outputs enough to change a single decoded note."""
    import os

    import jax

    from gandes_tpu.bridge.mmgan_decode import matrix_to_midi
    from gandes_tpu.serve import GenerationService
    from gandes_tpu.train.loading import load_mmgan_state
    from gandes_tpu.train.mmgan_loop import MMGANConfig, build_mmgan

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)

    svc = GenerationService(model="mmgan", start=0)
    serve_midi = base64.b64decode(svc.generate(n=1, seed=4)["midi_b64"][0])

    cfg = MMGANConfig(start=0)
    state = load_mmgan_state(cfg)
    g1, g2, _ = build_mmgan(cfg)
    rng = np.random.RandomState(4)
    noise1 = rng.randn(1, cfg.noise_dim).astype(np.float32)
    noise2 = rng.randn(1, cfg.noise_dim).astype(np.float32)
    beats = np.zeros((1, cfg.max_beat_length), np.float32)
    out1 = g1.apply({"params": state.g_params["g1"],
                     "batch_stats": state.g_stats["g1"]},
                    noise1, None, False, rngs={"aux": jax.random.key(0)})
    out2 = g2.apply({"params": state.g_params["g2"],
                     "batch_stats": state.g_stats["g2"]},
                    noise2, beats, False)
    np.random.seed(4)
    os.makedirs("eager_out", exist_ok=True)
    matrix_to_midi(np.asarray(out1)[:, None], np.asarray(out2),
                   adj_size=cfg.adj_size, instrument=cfg.instrument,
                   start=cfg.start, end=cfg.start + cfg.sequence_length,
                   generate=True, out_dir="eager_out")
    eager_midi = (tmp_path / "eager_out" / "generation.mid").read_bytes()

    assert serve_midi == eager_midi


def test_serve_gandes_service(tmp_path, monkeypatch):
    """GAN-DES service without HTTP: WAV payloads decode, mel shape right."""
    from gandes_tpu.serve import GenerationService

    monkeypatch.chdir(tmp_path)
    service = GenerationService(model="gandes")
    out = service.generate(n=1, seed=0)
    wav = base64.b64decode(out["wav_b64"][0])
    assert wav[:4] == b"RIFF"
    assert out["mel_shape"] == [1, 128, 216]


# ------------------------------------------------- process-level scale-out


def _start_server_proc(tmpdir, port):
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, env.get("PYTHONPATH", "")] if p)
    os.makedirs(os.path.join(tmpdir, "logs"), exist_ok=True)
    return subprocess.Popen(
        [sys.executable, "-m", "gandes_tpu.cli", "serve", "--model", "mmgan",
         "--start", "0", "--port", str(port)],
        cwd=tmpdir, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def _wait_healthy(base, deadline_s=240.0):
    import time

    t0 = time.time()
    while time.time() - t0 < deadline_s:
        try:
            with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
                if json.loads(r.read())["status"] == "ok":
                    return
        except Exception:
            time.sleep(1.0)
    raise TimeoutError(f"server at {base} never became healthy")


def test_two_process_scale_out(tmp_path):
    """Scale-out is one server PROCESS per chip (docs/SERVING.md). Two real
    instances in separate processes must show:

    * per-seed byte determinism in, and ACROSS, processes (a fleet answers
      identically regardless of which replica takes the request);
    * lock ISOLATION — each process serializes on its own generation lock,
      so a slow request on replica A never queues requests on replica B.
      (Wall-clock 2x aggregate throughput needs two cores/chips; this CI
      box has one core, so the test pins the queueing structure instead —
      B's latency while A is saturated stays ~its solo latency, not
      A-queue-depth multiples of it.)
    """
    import concurrent.futures
    import socket
    import time

    def _free_port():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    ports = (_free_port(), _free_port())
    procs = [_start_server_proc(str(tmp_path / f"srv{i}"), p)
             for i, p in enumerate(ports)]
    bases = [f"http://127.0.0.1:{p}" for p in ports]
    try:
        for b in bases:
            _wait_healthy(b)

        # cross-process determinism: same seed -> identical MIDI bytes
        _, a = _post(bases[0] + "/generate/mmgan", {"n": 1, "seed": 11})
        _, b = _post(bases[1] + "/generate/mmgan", {"n": 1, "seed": 11})
        assert a["midi_b64"] == b["midi_b64"]
        _, a2 = _post(bases[0] + "/generate/mmgan", {"n": 1, "seed": 12})
        assert a2["midi_b64"] != a["midi_b64"]

        def fire(base, n, seed):
            t0 = time.time()
            status, _ = _post(base + "/generate/mmgan", {"n": n, "seed": seed})
            assert status == 200
            return time.time() - t0

        t_solo = min(fire(bases[1], 1, 50 + i) for i in range(3))

        # saturate A with slow batches; B must keep serving at ~solo speed
        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            slow = [pool.submit(fire, bases[0], 16, 60 + i) for i in range(3)]
            time.sleep(0.3)  # let A's queue form
            fast = [fire(bases[1], 1, 70 + i) for i in range(3)]
            t_slow = [f.result() for f in slow]
        # A's lock serialized its own queue (latencies stack)...
        assert max(t_slow) > 2 * min(t_slow) or max(t_slow) > 4 * t_solo
        # ...while B stayed unqueued: within CPU-contention factor of solo,
        # far under A's queued latencies
        assert min(fast) < max(t_slow) / 2, (t_solo, fast, t_slow)

        if (os.cpu_count() or 1) >= 2:
            # the wall-clock two-core moment: aggregate throughput of the
            # two replicas beats one replica's. Gated on core count so it
            # activates on any >=2-core runner (this CI box has one core,
            # where both replicas timeshare a core and the ratio is ~1).
            import itertools

            def drain(targets, n_req, seed0):
                t0 = time.time()
                with concurrent.futures.ThreadPoolExecutor(len(targets)) as ex:
                    list(ex.map(lambda sb: fire(sb[1], 1, seed0 + sb[0]),
                                zip(range(n_req), itertools.cycle(targets))))
                return n_req / (time.time() - t0)

            r_one = drain(bases[:1], 6, 100)
            r_two = drain(bases, 6, 200)
            assert r_two > 1.3 * r_one, (r_one, r_two)
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=20)
            except Exception:
                p.kill()


def test_warmup_excluded_from_stats(tmp_path, monkeypatch):
    """run_server's compile-heavy warmup must not pollute /healthz request
    stats (r1 advisor finding): after warmup the service reports zero
    requests and None avg latency until real traffic arrives."""
    import contextlib
    import io

    from gandes_tpu.serve import GenerationService

    monkeypatch.chdir(tmp_path)
    (tmp_path / "logs").mkdir()
    with contextlib.redirect_stdout(io.StringIO()):
        svc = GenerationService(model="mmgan", start=0)
        svc.generate(n=1, seed=0)         # stands in for run_server warmup
        svc.requests = 0                   # the reset run_server performs
        svc._latency_sum = 0.0
        h = svc.healthz()
        assert h["requests"] == 0 and h["avg_latency_s"] is None
        svc.generate(n=1, seed=1)
        h2 = svc.healthz()
    assert h2["requests"] == 1 and h2["avg_latency_s"] > 0
