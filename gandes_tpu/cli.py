"""Command-line interface.

The reference's entry points are a script ``__main__`` (`GAN_DES/SIMNN.py`),
a unittest-as-trainer (`MMGAN_MIDI_DES/network_tests.py:352`), notebooks,
and hardcoded literals; this CLI replaces all of them with one surface:

    python -m gandes_tpu.cli pickle-dataset --midi-root DIR --out data/preprocessed_data_50.pkl
    python -m gandes_tpu.cli train-mmgan   --data data/preprocessed_data_50.pkl --epochs 5
    python -m gandes_tpu.cli train-gandes  --midi-root DIR --steps 20
    python -m gandes_tpu.cli generate-mmgan --checkpoint models/mmgan_64_64_epoch_5
    python -m gandes_tpu.cli sim-to-wav    --size 32 --instrument 5
    python -m gandes_tpu.cli bench
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _cmd_pickle_dataset(args):
    from gandes_tpu.data.datasets import build_window_pickle

    n = build_window_pickle(args.midi_root, args.out, sample_size=args.sample_size,
                            sequence_length=args.sequence_length, verbose=True,
                            workers=args.workers,
                            device_rasterize=args.device_rasterize)
    print(f"wrote {n} windows -> {args.out}")


def _mesh(spec: str | None):
    """'dp,tp' or 'dp' -> mesh_shape tuple (None passes through)."""
    if not spec:
        return None
    try:
        parts = [int(p) for p in spec.split(",")]
        if len(parts) not in (1, 2) or any(p < 1 for p in parts):
            raise ValueError
    except ValueError:
        raise SystemExit(f"--mesh expects 'dp' or 'dp,tp' positive ints, got {spec!r}")
    return (parts[0], parts[1] if len(parts) > 1 else 1)


def _train_mmgan_recycled(args):
    """Bounded-RSS long-run mode: run the training in epoch chunks, each in
    a FRESH process that resumes from the newest checkpoint (orbax resume
    is exact; JAX RNG streams continue via the step counter). Motivation:
    the axon client leaks ~the bytes of every host->device transfer in
    client RSS (PARITY.md "axon h2d transfer leak"), so any single-process
    run grows without bound; recycling resets the process envelope every N
    epochs. The global numpy stream (DES routing, reference parity) cannot
    be checkpointed across processes — each chunk gets a deterministic
    chunk-derived --np-seed instead, so a recycled run is reproducible
    end-to-end given the same schedule (pinned by
    tests/test_training_loops.py::test_mmgan_recycle_mode)."""
    import subprocess

    total = args.epochs
    chunk = args.recycle_every
    argv = list(sys.argv[1:])

    def strip(flag, has_value=True):
        while flag in argv:
            i = argv.index(flag)
            del argv[i : i + (2 if has_value else 1)]

    strip("--recycle-every")
    strip("--epochs")
    strip("--np-seed")
    target = chunk
    while True:
        target = min(target, total)
        cmd = [sys.executable, "-m", "gandes_tpu.cli", *argv,
               "--epochs", str(target),
               "--np-seed", str(1_000_003 * (args.np_seed or 0) + target)]
        proc = subprocess.run(cmd)
        if proc.returncode != 0:
            raise SystemExit(proc.returncode)
        if target >= total:
            break
        target += chunk


def _cmd_train_mmgan(args):
    if args.recycle_every:
        return _train_mmgan_recycled(args)
    if args.np_seed is not None:
        # deterministic DES routing for THIS process: the simulator consumes
        # the global numpy stream (reference parity), which cannot be
        # checkpointed across processes — recycled chunks each get an
        # explicit chunk-derived seed instead
        import numpy as np

        np.random.seed(args.np_seed)
    from gandes_tpu.data.datasets import MaestroDatasetPickle
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    cfg = MMGANConfig(num_epochs=args.epochs, batch_size=args.batch_size,
                      start=args.start, sequence_length=args.sequence_length,
                      lr=args.lr, d_lr=args.d_lr,
                      models_dir=args.models_dir, losses_dir=args.losses_dir,
                      faithful=args.faithful, g_update=args.g_update,
                      des_parallel=args.des_parallel, mesh_shape=_mesh(args.mesh),
                      fused_io=args.fused_io, profile=args.profile,
                      trace_dir=args.trace_dir,
                      compute_dtype=args.compute_dtype,
                      instance_noise_sigma=args.instance_noise,
                      instance_noise_anneal_epochs=args.instance_noise_anneal,
                      r1_gamma=args.r1_gamma, moment_match=args.moment_match,
                      moment_match_cond=args.moment_match_cond,
                      r1_mode=args.r1_mode, r1_fd_eps=args.r1_fd_eps,
                      instance_noise_floor=args.instance_noise_floor)
    dataset = MaestroDatasetPickle(args.data, data_dir=".")
    state, history = train_mmgan(dataset, cfg, max_batches=args.max_batches)
    print(f"done: {len(history['disc'])} epochs")


def _cmd_train_gandes(args):
    from gandes_tpu.data.datasets import DataLoader, MaestroDatasetGanDes, my_collate
    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes

    dataset = MaestroDatasetGanDes(batch_size=args.batch_size, input_folder=args.midi_root,
                                   sound_font=args.sound_font)
    loader = DataLoader(dataset, batch_size=1, shuffle=True, collate_fn=my_collate)
    cfg = GanDesConfig(batch_size=args.batch_size, model_path=args.models_dir,
                       lr=args.lr, d_lr=args.d_lr, resume=args.resume,
                       g_update=args.g_update, des_parallel=args.des_parallel,
                       mesh_shape=_mesh(args.mesh), profile=args.profile,
                       trace_dir=args.trace_dir,
                       # the fake path must render with the SAME synth as
                       # the real dataset, or D separates on timbre alone
                       sound_font=args.sound_font,
                       compute_dtype=args.compute_dtype)
    state, history = train_gandes(loader, cfg, max_steps=args.steps)
    print(f"done: {len(history['disc'])} steps")


def _cmd_generate_mmgan(args):
    from gandes_tpu.train.loading import load_mmgan_state
    from gandes_tpu.train.mmgan_loop import MMGANConfig, generate_midi

    cfg = MMGANConfig(start=args.start, sequence_length=args.sequence_length)
    state = load_mmgan_state(cfg, args.checkpoint, args.torch_checkpoint)
    rng = np.random.RandomState(args.seed)
    n_failed = 0
    for i in range(args.n):
        noise1 = rng.randn(1, cfg.noise_dim).astype(np.float32)
        noise2 = rng.randn(1, cfg.noise_dim).astype(np.float32)
        beats = np.zeros((1, cfg.max_beat_length), np.float32)
        np.random.seed(args.seed + i)
        src = os.path.join(args.out_dir, "generation.mid")
        if os.path.exists(src):
            os.remove(src)  # a stale file must not masquerade as sample i
        rolls = generate_midi(state, cfg, noise1, noise2, beats, out_dir=args.out_dir)
        if not os.path.exists(src):
            # timed-out/failed sim wrote no file — report, don't crash or
            # silently reuse a stale generation.mid
            print(f"sample {i}: simulation failed, no MIDI written")
            n_failed += 1
            continue
        name = "generation.mid" if args.n == 1 else f"generation_{i}.mid"
        if args.n > 1:
            os.replace(src, os.path.join(args.out_dir, name))
        print(f"generated roll sum={rolls[0].sum():.1f} -> {args.out_dir}/{name}")
        if args.wav:
            from gandes_tpu.data.audio import save_wav
            from gandes_tpu.music.synth import render_midi

            audio = render_midi(os.path.join(args.out_dir, name))
            wav_name = name.replace(".mid", ".wav")
            save_wav(os.path.join(args.out_dir, wav_name), audio)
            print(f"wrote {args.out_dir}/{wav_name}")
    if n_failed:
        print(f"{n_failed} of {args.n} sample(s) failed")
        if n_failed == args.n:
            raise SystemExit(1)  # nothing was generated


def _cmd_generate_gandes(args):
    import jax

    from gandes_tpu.bridge.gandes_decode import matrix_to_wav
    from gandes_tpu.eval.visualize import plot_spectrogram
    from gandes_tpu.train.gandes_loop import GanDesConfig
    from gandes_tpu.train.loading import load_gandes_state

    cfg = GanDesConfig()
    state, gen = load_gandes_state(cfg, args.checkpoint, args.torch_checkpoint,
                                   batch_size=args.n)
    from gandes_tpu.train.loading import gandes_eval_forward

    noise = jax.random.normal(jax.random.key(args.seed), (args.n, cfg.z_dim))
    mats = gandes_eval_forward(gen)(state.g_params, state.g_stats, noise)
    np.random.seed(args.seed)
    import os as _os

    _os.makedirs(args.out_dir, exist_ok=True)
    specs = matrix_to_wav(np.asarray(mats), size=20, start=0, end=216,
                          out_dir=args.out_dir, sound_font=args.sound_font)
    plot_spectrogram(np.asarray(specs[0]),
                     save_path=os.path.join(args.out_dir, "spectrogram.png"))
    print(f"generated {args.n} song(s): WAVs + spectrogram.png in {args.out_dir}/")


def _cmd_doctor(args):
    """Environment self-check: device, compilers, native engines, parity."""
    import time

    if getattr(args, "fluidsynth_ab", None):
        # ground-truth A/B vs a real FluidSynth binary (VERDICT r2 #4b):
        # render the same MIDI both ways, report mel-distance/onset/gain
        import json as _json

        from gandes_tpu.eval.fluidsynth_ab import find_fluidsynth, fluidsynth_ab

        if not find_fluidsynth():
            raise SystemExit(
                "no fluidsynth binary on PATH (or $GANDES_FLUIDSYNTH) — "
                "run this where FluidSynth is installed")
        report = fluidsynth_ab(args.fluidsynth_ab, midi_path=args.ab_midi)
        print(_json.dumps(report, indent=1))
        if not report["ok"]:
            raise SystemExit("A/B FAILED: renders diverge beyond thresholds")
        print("A/B ok: renders agree within thresholds")
        return

    rows = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            detail = fn() or ""
            rows.append((name, "ok", time.perf_counter() - t0, detail))
        except Exception as e:
            rows.append((name, "FAIL", time.perf_counter() - t0,
                         f"{type(e).__name__}: {e}"))

    def c_jax():
        import jax

        d = jax.devices()
        return f"platform={d[0].platform}, {len(d)} device(s)"

    def c_jit():
        import jax
        import jax.numpy as jnp

        out = jax.jit(lambda x: (x @ x).sum())(jnp.eye(128))
        assert float(out) == 128.0

    def c_native_engine():
        from gandes_tpu.des.native import get_lib, native_available

        assert native_available(), "C++ DES engine failed to build"
        get_lib()
        return "C++ DES engine built"

    def c_native_decoder():
        from gandes_tpu.music.native_decode import native_decode_available

        assert native_decode_available(), "C++ MIDI decoder failed to build"
        return "C++ log->MIDI decoder built"

    def c_engine_parity():
        import tempfile

        from gandes_tpu.des import Sim

        adj = np.array([[1.0, 1.0], [0.0, -1.0]])
        dists = [["exponential", 1.0], ["exponential", 0.8]]
        logs = []
        with tempfile.TemporaryDirectory() as tmp:
            for engine in ("python", "native"):
                np.random.seed(42)
                sim = Sim(adj, dists, [0, 20], seeds=[7], generate_log=True,
                          log_path=tmp + "/", logging_mode="Music",
                          engine=engine)
                sim.run(number_of_customers=500)
                logs.append("\n".join(sim.music_lines()))
        if logs[0] != logs[1]:
            raise AssertionError("python vs native event logs differ")
        return "python == native event log (500 customers)"

    def c_pallas():
        from gandes_tpu.music.mel import melspectrogram_db_tensor

        wav = np.zeros(44100, np.float32)
        melspectrogram_db_tensor(wav, sr=44100)
        return "mel front-end compiles"

    def c_sf2():
        import tempfile

        from gandes_tpu.music import sf2 as m
        from gandes_tpu.music.midi import (Message, MetaMessage, MidiFile,
                                           MidiTrack)
        from gandes_tpu.music.sf2 import G_SAMPLE_MODES, Sf2Synth, build_sf2

        with tempfile.TemporaryDirectory() as tmp:
            # One font engaging every generator family the synth honors
            # (loop, DAHDSR, filter + sweep, both LFOs, mod env, pan,
            # effects sends): a real render through the full feature
            # matrix, not just parse + zone selection.
            gens = {G_SAMPLE_MODES: 1, m.G_HOLD_VOL: 1200,
                    m.G_ATTACK_VOL: -6000, m.G_RELEASE_VOL: -3000,
                    m.G_PAN: 200,
                    m.G_INITIAL_FILTER_FC: 9000, m.G_INITIAL_FILTER_Q: 200,
                    m.G_VIB_LFO_TO_PITCH: 50, m.G_MOD_LFO_TO_VOL: 60,
                    m.G_MOD_ENV_TO_PITCH: 300, m.G_DECAY_MOD_ENV: -2000,
                    m.G_MOD_ENV_TO_FILTER_FC: 1200,
                    m.G_MOD_LFO_TO_FILTER_FC: 600,
                    m.G_REVERB_SEND: 300, m.G_CHORUS_SEND: 300}
            path = build_sf2(
                tmp + "/t.sf2",
                samples=[{"name": "s", "data": np.sin(
                    2 * np.pi * np.arange(2000) / 50).astype(np.float32) * 0.5,
                    "sample_rate": 22050, "original_pitch": 60,
                    "loop_start": 200, "loop_end": 1800}],
                instruments=[{"name": "i", "zones": [
                    {"sample": 0, "gens": gens}]}],
                presets=[{"name": "p", "program": 0,
                          "zones": [{"instrument": 0}]}])
            synth = Sf2Synth(path)
            voices = synth.font.select_voices(0, 60, 100)
            if len(voices) != 1 or voices[0]["loop"] != 1:
                # not assert: stripped under python -O, and doctor must
                # never report a vacuous pass
                raise RuntimeError(f"zone selection returned {voices!r}")
            mid = MidiFile(type=0, ticks_per_beat=480)
            tr = MidiTrack()
            tr.append(MetaMessage("set_tempo", tempo=500000, time=0))
            tr.append(Message("note_on", note=60, velocity=100, time=0))
            tr.append(Message("note_on", note=67, velocity=80, time=96))
            tr.append(Message("note_off", note=60, velocity=0, time=192))
            tr.append(Message("note_off", note=67, velocity=0, time=96))
            tr.append(MetaMessage("end_of_track", time=0))
            mid.tracks.append(tr)
            audio = synth.render_midi(mid, sr=22050, min_seconds=1.0)
            if not np.all(np.isfinite(audio)):
                raise RuntimeError("render produced non-finite samples")
            peak = float(np.abs(audio).max())
            if not 1e-5 < peak <= 1.0 + 1e-6:
                raise RuntimeError(f"render peak {peak} out of range")
        return "SoundFont parse + zone selection + full-matrix render"

    def c_reference():
        import os as _os

        if _os.path.exists("/root/reference/SIMULATOR/simulation_v3.py"):
            return "mounted (parity suites active)"
        return "not mounted (parity suites will skip)"

    check("jax backend", c_jax)
    check("jit compile", c_jit)
    check("native DES engine", c_native_engine)
    check("native MIDI decoder", c_native_decoder)
    check("engine parity", c_engine_parity)
    check("mel front-end", c_pallas)
    check("soundfont synth", c_sf2)
    check("reference mount", c_reference)

    width = max(len(r[0]) for r in rows)
    failed = 0
    for name, status, dt, detail in rows:
        failed += status == "FAIL"
        print(f"{name:<{width}}  {status:<4}  {dt:6.1f}s  {detail}")
    if failed:
        raise SystemExit(f"{failed} check(s) failed")
    print("all checks passed")


def _cmd_serve(args):
    from gandes_tpu.serve import run_server

    run_server(model=args.model, checkpoint=args.checkpoint,
               torch_checkpoint=args.torch_checkpoint, host=args.host,
               port=args.port, warmup=not args.no_warmup, start=args.start,
               sequence_length=args.sequence_length,
               sound_font=args.sound_font)


def _cmd_export_torch(args):
    """Export an orbax checkpoint trained here as a reference-loadable torch
    state_dict (the inverse of --torch-checkpoint import)."""
    if args.model == "mmgan":
        from gandes_tpu.train.loading import load_mmgan_state
        from gandes_tpu.train.mmgan_loop import MMGANConfig
        from gandes_tpu.train.torch_import import export_mmgan_torch_checkpoint

        state = load_mmgan_state(MMGANConfig(), checkpoint=args.checkpoint)
        export_mmgan_torch_checkpoint(state, args.out)
    else:
        from gandes_tpu.train.gandes_loop import GanDesConfig
        from gandes_tpu.train.loading import load_gandes_state
        from gandes_tpu.train.torch_import import export_gandes_torch_checkpoint

        state, _ = load_gandes_state(GanDesConfig(), checkpoint=args.checkpoint)
        export_gandes_torch_checkpoint(state, args.out)
    print(f"exported {args.model} torch state_dict -> {args.out}")


def _cmd_render_graph(args):
    import jax
    import jax.numpy as jnp

    from gandes_tpu.eval.visualize import render_computation_graph

    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.key(0)
    outs = []
    if args.model == "mmgan":
        from gandes_tpu.models import BeatGenerator, DiscriminatorCNN, MLPGenerator

        g1, g2 = MLPGenerator(adj_size=(64, 64)), BeatGenerator(output_dim=20)
        d = DiscriminatorCNN(roll_size=(2, 128, 50))
        z = jnp.zeros((args.batch, 50))
        p1 = g1.init({"params": key, "aux": key}, z[:1])
        p2 = g2.init({"params": key, "aux": key}, z[:1], z[:1])
        pd = d.init(key, jnp.zeros((1, 2, 128, 50)))
        rngs = {"aux": jax.random.key(1)}
        outs.append(render_computation_graph(
            lambda x: g1.apply(p1, x, train=False, rngs=rngs), z,
            save_path=os.path.join(args.out_dir, "graph_generator.png"),
            title="MM-GAN G1 (adjacency generator)"))
        outs.append(render_computation_graph(
            lambda x, b: g2.apply(p2, x, b, train=False, rngs=rngs), z, z,
            save_path=os.path.join(args.out_dir, "graph_beat_generator.png"),
            title="MM-GAN G2 (sim-parameter generator)"))
        outs.append(render_computation_graph(
            lambda r: d.apply(pd, r), jnp.zeros((args.batch, 2, 128, 50)),
            save_path=os.path.join(args.out_dir, "graph_discriminator.png"),
            title="MM-GAN DiscriminatorCNN"))
    else:
        from gandes_tpu.models.gan_des import DCGANGenerator, MelDiscriminator

        g, d = DCGANGenerator(noise_dim=100), MelDiscriminator()
        pg = g.init(key, jnp.zeros((1, 100)))
        pd = d.init(key, jnp.zeros((1, 128, 216)))
        outs.append(render_computation_graph(
            lambda z: g.apply(pg, z, train=False), jnp.zeros((args.batch, 100)),
            save_path=os.path.join(args.out_dir, "graph_generator.png"),
            title="GAN-DES DCGANGenerator"))
        outs.append(render_computation_graph(
            lambda m: d.apply(pd, m), jnp.zeros((args.batch, 128, 216)),
            save_path=os.path.join(args.out_dir, "graph_discriminator.png"),
            title="GAN-DES MelDiscriminator"))
    print("\n".join(outs))


def _cmd_sim_to_wav(args):
    from gandes_tpu.bridge.sim_demo import sim_to_wav

    np.random.seed(args.seed)
    outs = sim_to_wav(matrices=[None], size=args.size,
                      use_same_instrument=args.instrument, out_dir=args.out_dir,
                      sound_font=args.sound_font or "FluidR3_GM.sf2")
    print("\n".join(outs))


def _cmd_eval_metrics(args):
    import json

    import numpy as np

    from gandes_tpu.data.datasets import MaestroDatasetPickle
    from gandes_tpu.eval.metrics import (
        compare_distributions,
        pitch_class_histogram,
        roll_metrics,
    )

    if args.family == "gandes":
        return _eval_metrics_gandes(args)

    ds = MaestroDatasetPickle(args.data, data_dir=".")
    take = min(args.n, len(ds))
    # evenly spaced across the pickle (windows are grouped by source MIDI,
    # so the first n would over-weight the first files — same balance rule
    # as the gandes family's collect_real_mels); deterministic, exactly
    # `take` distinct indices since floor(i*len/take) strictly increases
    pick = [(i * len(ds)) // take for i in range(take)]
    real = np.stack([np.stack([ds[i][0], ds[i][1]]) for i in pick])
    rm = roll_metrics(real)
    rm = dict(rm, pitch_classes=pitch_class_histogram(real))

    def _gaps_for(checkpoint=None, torch_checkpoint=None):
        import jax

        from gandes_tpu.bridge.mmgan_decode import matrix_to_midi
        from gandes_tpu.train.loading import load_mmgan_state
        from gandes_tpu.train.mmgan_loop import MMGANConfig, _eval_forward

        cfg = MMGANConfig()
        state = load_mmgan_state(cfg, checkpoint, torch_checkpoint,
                                 batch_size=take)
        key = jax.random.key(args.seed)
        noise1 = jax.random.normal(jax.random.fold_in(key, 0), (take, cfg.noise_dim))
        noise2 = jax.random.normal(jax.random.fold_in(key, 1), (take, cfg.noise_dim))
        beats = np.stack([ds[i][2] for i in pick])  # same balanced indices
        mats, vec = _eval_forward(cfg)(
            state.g_params, state.g_stats, noise1, noise2,
            np.asarray(beats, np.float32), jax.random.key(0))
        np.random.seed(args.seed)
        rolls, failed = matrix_to_midi(
            np.asarray(mats)[:, None], np.asarray(vec), adj_size=cfg.adj_size,
            instrument=cfg.instrument, start=cfg.start,
            end=cfg.start + cfg.sequence_length, force_roll=True,
            parallel=args.des_parallel,
        )
        fake = np.stack(rolls)
        fm = roll_metrics(fake)
        fm = dict(fm, pitch_classes=pitch_class_histogram(fake))
        gen = {k: float(np.mean(np.asarray(v))) for k, v in fm.items()
               if k != "pitch_classes"}
        return gen, compare_distributions(rm, fm), failed

    out = {"real": {k: float(np.mean(np.asarray(v))) for k, v in rm.items()
                    if k != "pitch_classes"}, "n_real": take}
    if args.checkpoints_dir:
        _sweep_checkpoints(args, out, _gaps_for, _mmgan_epoch_key,
                           gap_keys=set(compare_distributions(rm, rm)))
    elif args.checkpoint or args.torch_checkpoint:
        out["generated"], out["gaps"], out["failed_sims"] = _gaps_for(
            args.checkpoint, args.torch_checkpoint)
    print(json.dumps(out, indent=2, sort_keys=True))


def _strip_torch_suffix(name: str):
    for suf in (".pth", ".pt"):
        if name.endswith(suf):
            return name[: -len(suf)]
    return name


def _mmgan_epoch_key(name: str):
    """mmgan_{a}_{b}_epoch_{e}[.pth] -> e (skips *_surrogate companions)."""
    parts = _strip_torch_suffix(name).rsplit("_epoch_", 1)
    return int(parts[1]) if len(parts) == 2 and parts[1].isdigit() else None


def _gandes_step_key(name: str):
    """gen_{step}_{timestamp}[.pt] -> step (skips *_surrogate companions)."""
    import re

    m = re.fullmatch(r"gen_(\d+)_[\d.]+", _strip_torch_suffix(name))
    return int(m.group(1)) if m else None


def _sweep_checkpoints(args, out, gaps_for, key_of, gap_keys):
    """Checkpoint SELECTION: evaluate every checkpoint of a training run
    under --checkpoints-dir with identical noise/seed/data, rank by
    --rank-by (a gap key, or 'avg_rank': the scale-free mean of per-metric
    ranks), and report the winner. Adversarial gaps oscillate across a run
    (docs/RESULTS.md), so picking the checkpoint is part of the workflow,
    not an afterthought. For MM-GAN the key is the epoch; for GAN-DES the
    saved step. Both this framework's orbax checkpoint dirs and the
    reference's torch files sweep (layouts: mmgan_{a}_{b}_epoch_{e}[.pth] /
    gen_{step}_{ts}[.pt])."""
    rank_by = args.rank_by  # validate BEFORE the (expensive) sweep: a typo'd
    # key must not cost a full multi-checkpoint evaluation
    if rank_by != "avg_rank" and rank_by not in gap_keys:
        raise SystemExit(
            f"--rank-by must be 'avg_rank' or one of {sorted(gap_keys)}")
    epochs = {}
    for name in sorted(os.listdir(args.checkpoints_dir)):
        key = key_of(name)
        if key is not None:
            epochs[key] = os.path.join(args.checkpoints_dir, name)
    if not epochs:
        raise SystemExit(f"no checkpoints found in {args.checkpoints_dir}")
    per_epoch = {}
    for e in sorted(epochs):
        if os.path.isfile(epochs[e]):  # reference torch state_dict
            _, gaps, failed = gaps_for(torch_checkpoint=epochs[e])
        else:  # this framework's orbax checkpoint dir
            _, gaps, failed = gaps_for(checkpoint=epochs[e])
        per_epoch[e] = dict(gaps, failed_sims=failed)
    keys = [k for k in next(iter(per_epoch.values())) if k != "failed_sims"]
    ranks = {e: 0.0 for e in per_epoch}
    for k in keys:
        for r, e in enumerate(sorted(per_epoch, key=lambda e: per_epoch[e][k])):
            ranks[e] += r / max(1, len(per_epoch) - 1)
    for e in per_epoch:
        per_epoch[e]["avg_rank"] = ranks[e] / len(keys)
    best = min(per_epoch, key=lambda e: per_epoch[e][rank_by])
    out["per_epoch"] = {str(e): per_epoch[e] for e in sorted(per_epoch)}
    out["rank_by"] = rank_by
    out["best_epoch"] = best
    out["best_checkpoint"] = epochs[best]


def _eval_metrics_gandes(args):
    """GAN-DES family eval: real = MIDI dir -> synth -> 5 s mel slices
    (the discriminator's actual input distribution); generated =
    checkpoint G -> matrix_to_wav mels. Gaps over mel spectral statistics
    (eval/metrics.py::mel_metrics)."""
    import json

    import numpy as np

    import jax

    from gandes_tpu.bridge.gandes_decode import matrix_to_wav
    from gandes_tpu.eval.metrics import compare_distributions, mel_metrics
    from gandes_tpu.train.gandes_loop import GanDesConfig
    from gandes_tpu.train.loading import gandes_eval_forward, load_gandes_state

    from gandes_tpu.data.datasets import collect_real_mels

    try:
        # balanced across files (round-robin), short-window renders dropped
        # before counting — see collect_real_mels
        real, n_files = collect_real_mels(args.data, args.n,
                                          sound_font=args.sound_font,
                                          seed=args.seed)
    except ValueError as e:
        raise SystemExit(str(e))
    print(f"eval-metrics: real side = {real.shape[0]} mel slices from "
          f"{n_files} file(s)", file=sys.stderr)
    rm = mel_metrics(real)

    def _gaps_for(checkpoint=None, torch_checkpoint=None):
        cfg = GanDesConfig()
        state, gen = load_gandes_state(cfg, checkpoint, torch_checkpoint,
                                       batch_size=args.n)
        noise = jax.random.normal(jax.random.key(args.seed), (args.n, cfg.z_dim))
        mats = gandes_eval_forward(gen)(state.g_params, state.g_stats, noise)
        np.random.seed(args.seed)
        os.makedirs("logs", exist_ok=True)
        specs = matrix_to_wav(np.asarray(mats), size=20, start=0,
                              end=real.shape[-1], write_wav=False,
                              parallel=args.des_parallel,
                              sound_font=args.sound_font)
        fm = mel_metrics(np.asarray(specs))
        gen_stats = {k: float(np.mean(np.asarray(v))) for k, v in fm.items()}
        return gen_stats, compare_distributions(rm, fm), 0

    out = {"real": {k: float(np.mean(np.asarray(v))) for k, v in rm.items()},
           "n_real": int(real.shape[0]), "family": "gandes"}
    if args.checkpoints_dir:
        _sweep_checkpoints(args, out, _gaps_for, _gandes_step_key,
                           gap_keys=set(compare_distributions(rm, rm)))
    elif args.checkpoint or args.torch_checkpoint:
        out["generated"], out["gaps"], out["failed_sims"] = _gaps_for(
            args.checkpoint, args.torch_checkpoint)
    print(json.dumps(out, indent=2, sort_keys=True))


def _cmd_bench(args):
    import bench

    bench.main()


def main(argv=None):
    # honor JAX_PLATFORMS even when a sitecustomize pre-imported jax and
    # latched a different platform default
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from gandes_tpu.core.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    p = argparse.ArgumentParser(prog="gandes_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("pickle-dataset", help="build the windowed roll pickle")
    sp.add_argument("--midi-root", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--sample-size", type=int, default=300)
    sp.add_argument("--sequence-length", type=int, default=50)
    sp.add_argument("--workers", type=int, default=None,
                    help="parse files on a process pool (fast path)")
    sp.add_argument("--device-rasterize", action="store_true",
                    help="rasterize rolls with the batched device kernel")
    sp.set_defaults(fn=_cmd_pickle_dataset)

    sp = sub.add_parser("train-mmgan", help="train the MM-GAN")
    sp.add_argument("--data", required=True)
    sp.add_argument("--lr", type=float, default=0.01,
                    help="G (and default D) learning rate (reference: 0.01)")
    sp.add_argument("--d-lr", type=float, default=None,
                    help="separate D learning rate (GAN balance knob)")
    sp.add_argument("--epochs", type=int, default=100)
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--start", type=int, default=100)
    sp.add_argument("--sequence-length", type=int, default=50)
    sp.add_argument("--models-dir", default="models")
    sp.add_argument("--losses-dir", default="losses")
    sp.add_argument("--max-batches", type=int, default=None)
    sp.add_argument("--faithful", action="store_true")
    sp.add_argument("--g-update",
                    choices=["none", "direct", "surrogate", "reinforce"],
                    default="none",
                    help="'none' = reference semantics (G gets zero gradient); "
                         "'direct'/'surrogate' = straight-through G training; "
                         "'reinforce' = score-function estimator through the "
                         "real DES (unbiased, no surrogate)")
    sp.add_argument("--recycle-every", type=int, default=None,
                    help="bounded-RSS long-run mode: run N-epoch chunks in "
                         "fresh processes via exact orbax resume (the axon "
                         "client leaks h2d bytes in RSS; see PARITY.md)")
    sp.add_argument("--np-seed", type=int, default=None,
                    help="seed the global numpy stream (DES routing) at "
                         "process start; recycle chunks derive their own")
    sp.add_argument("--instance-noise", type=float, default=0.0,
                    help="g_update='surrogate' balance knob: N(0, sigma^2) "
                         "added to every D input, annealed to 0 (roll units)")
    sp.add_argument("--instance-noise-anneal", type=float, default=None,
                    help="epochs over which instance noise anneals to 0 "
                         "(default: the full run)")
    sp.add_argument("--r1-gamma", type=float, default=0.0,
                    help="g_update='surrogate' balance knob: R1 gradient "
                         "penalty weight on the real batch")
    sp.add_argument("--moment-match", type=float, default=0.0,
                    help="g_update='surrogate' location anchor: per-pitch "
                         "mean-profile MSE weight")
    sp.add_argument("--moment-match-cond", type=float, default=0.0,
                    help="g_update='surrogate' anchor on the eval's "
                         "conditional moments (velocity mean/std | onset, "
                         "duration mean | sounding)")
    sp.add_argument("--r1-mode", choices=["exact", "fd"], default="exact",
                    help="R1 formulation: 'exact' grad-of-grad (hangs the "
                         "axon relay compile) or 'fd' finite-difference "
                         "probe (axon-compatible)")
    sp.add_argument("--r1-fd-eps", type=float, default=0.5,
                    help="finite-difference step for --r1-mode fd "
                         "(roll units)")
    sp.add_argument("--instance-noise-floor", type=float, default=0.0,
                    help="anneal instance noise to this sigma instead of 0 "
                         "(permanent D noise floor)")
    sp.add_argument("--mesh", default=None,
                    help="'dp,tp' sharded training mesh (e.g. '4,2'); "
                         "default single-device")
    sp.add_argument("--des-parallel", type=int, default=None,
                    help="run the batch's DES sims on N threads (fast mode)")
    sp.add_argument("--fused-io", action="store_true",
                    help="single-launch steps: G forward + DES io_callback + "
                         "D update as one compiled program per batch")
    sp.add_argument("--profile", action="store_true",
                    help="print a per-phase StepTimer table every "
                         "print_interval batches")
    sp.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler device trace here "
                         "(view with xprof/TensorBoard)")
    sp.add_argument("--compute-dtype", choices=["float32", "bf16"],
                    default="float32", dest="compute_dtype",
                    help="bf16: dense math in bfloat16 (MXU-native), params/"
                         "optimizer/BN stats stay float32; default keeps the "
                         "reference's float32 numerics")
    sp.set_defaults(fn=_cmd_train_mmgan)

    sp = sub.add_parser("train-gandes", help="train the GAN-DES spectrogram GAN")
    sp.add_argument("--midi-root", required=True)
    sp.add_argument("--sound-font", default=None, help=".sf2 path: render by sample playback from this soundfont (default: additive synth)")
    sp.add_argument("--batch-size", type=int, default=30)
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--models-dir", default="models")
    sp.add_argument("--lr", type=float, default=2e-5,
                    help="Adam learning rate (reference default 2e-5)")
    sp.add_argument("--d-lr", type=float, default=None,
                    help="separate D learning rate (GAN balance knob; "
                         "default: --lr, the reference's single-lr semantics)")
    sp.add_argument("--resume", action="store_true",
                    help="continue from the newest gen_<step>_<ts> "
                         "checkpoint under --models-dir (full state incl. "
                         "optimizers; step-derived noise streams continue "
                         "at the saved step — the DES's global-numpy "
                         "stream is process-level, so reseed numpy for a "
                         "reproducible continuation)")
    sp.add_argument("--g-update", choices=["none", "surrogate", "reinforce"],
                    default="none",
                    help="'none' = reference semantics (G gets zero gradient); "
                         "'surrogate' = learned matrix->mel surrogate; "
                         "'reinforce' = score-function estimator through the "
                         "real DES->synth->mel pipeline")
    sp.add_argument("--mesh", default=None,
                    help="'dp,tp' sharded training mesh (e.g. '4,2'); "
                         "default single-device")
    sp.add_argument("--des-parallel", type=int, default=None,
                    help="run the batch's DES sims on N threads (fast mode)")
    sp.add_argument("--profile", action="store_true",
                    help="print a per-phase StepTimer table every display_step")
    sp.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler device trace here")
    sp.add_argument("--compute-dtype", choices=["float32", "bf16"],
                    default="float32", dest="compute_dtype",
                    help="bf16: dense math in bfloat16 (MXU-native), params/"
                         "optimizer/BN stats stay float32")
    sp.set_defaults(fn=_cmd_train_gandes)

    sp = sub.add_parser("generate-mmgan", help="generate a MIDI from a checkpoint")
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--torch-checkpoint", default=None,
                    help="a reference .pth state_dict (author-trained weights)")
    sp.add_argument("--start", type=int, default=100)
    sp.add_argument("--sequence-length", type=int, default=50)
    sp.add_argument("--out-dir", default="./adj_sim_outputs/midi")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--n", type=int, default=1,
                    help=">1: batch-serve n samples (generation_<i>.mid)")
    sp.add_argument("--wav", action="store_true", help="also synthesize WAV")
    sp.set_defaults(fn=_cmd_generate_mmgan)

    sp = sub.add_parser("generate-gandes", help="GAN-DES: generate songs from a checkpoint")
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--sound-font", default=None, help=".sf2 path: render by sample playback from this soundfont (default: additive synth)")
    sp.add_argument("--torch-checkpoint", default=None,
                    help="a reference gen_<step>_<ts>.pt state_dict")
    sp.add_argument("--n", type=int, default=1)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--out-dir", default="adj_sim_outputs")
    sp.set_defaults(fn=_cmd_generate_gandes)

    sp = sub.add_parser("render-graph", help="render model computation "
                        "graphs (jaxpr DAG PNG + text, the torchviz-dump "
                        "analog)")
    sp.add_argument("--model", choices=["mmgan", "gandes"], default="mmgan")
    sp.add_argument("--batch", type=int, default=4)
    sp.add_argument("--out-dir", default="graphs")
    sp.set_defaults(fn=_cmd_render_graph)

    sp = sub.add_parser("doctor", help="environment self-check (device, "
                                       "native builds, engine parity)")
    sp.add_argument("--fluidsynth-ab", metavar="SF2", default=None,
                    help="A/B our SF2 renderer against a real fluidsynth "
                         "binary with this font (skips the other checks)")
    sp.add_argument("--ab-midi", default=None,
                    help="MIDI file for --fluidsynth-ab (default: built-in "
                         "register-spanning test piece)")
    sp.set_defaults(fn=_cmd_doctor)

    sp = sub.add_parser("serve", help="warm-model HTTP generation server")
    sp.add_argument("--model", choices=["mmgan", "gandes", "both"],
                    default="mmgan",
                    help="'both' hosts the two model families in one process")
    sp.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    sp.add_argument("--torch-checkpoint", default=None,
                    help="a reference .pth/.pt state_dict")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8472)
    sp.add_argument("--no-warmup", action="store_true")
    sp.add_argument("--start", type=int, default=100)
    sp.add_argument("--sequence-length", type=int, default=50)
    sp.add_argument("--sound-font", default=None,
                    help=".sf2 path: WAV payloads render by sample playback")
    sp.set_defaults(fn=_cmd_serve)

    sp = sub.add_parser("export-torch",
                        help="export an orbax checkpoint as a reference-"
                             "loadable torch state_dict")
    sp.add_argument("--model", choices=["mmgan", "gandes"], required=True)
    sp.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    sp.add_argument("--out", required=True, help="output .pth/.pt path")
    sp.set_defaults(fn=_cmd_export_torch)

    sp = sub.add_parser("sim-to-wav", help="random queueing network -> WAV demo")
    sp.add_argument("--sound-font", default=None, help=".sf2 path: render by sample playback from this soundfont (default: additive synth)")
    sp.add_argument("--size", type=int, default=32)
    sp.add_argument("--instrument", type=int, default=None)
    sp.add_argument("--out-dir", default="adj_sim_outputs")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=_cmd_sim_to_wav)

    sp = sub.add_parser("eval-metrics",
                        help="music-quality statistics: dataset vs generated")
    sp.add_argument("--data", required=True,
                    help="windowed roll pickle (mmgan) or a MIDI dir (gandes)")
    sp.add_argument("--family", choices=("mmgan", "gandes"), default="mmgan",
                    help="model family: mmgan ranks piano-roll gaps, gandes "
                         "ranks mel-spectral gaps")
    sp.add_argument("--sound-font", default=None,
                    help="optional .sf2 for the gandes audio path")
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--torch-checkpoint", default=None)
    sp.add_argument("--checkpoints-dir", default=None,
                    help="evaluate every checkpoint in a training run's "
                         "models/ dir and rank them (checkpoint selection; "
                         "mmgan: *_epoch_N, gandes: gen_<step>_<ts>)")
    sp.add_argument("--rank-by", default="avg_rank",
                    help="gap key to select the best epoch by, or "
                         "'avg_rank' (default): mean of per-metric ranks")
    sp.add_argument("--n", type=int, default=16)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--des-parallel", type=int, default=None)
    sp.set_defaults(fn=_cmd_eval_metrics)

    sp = sub.add_parser("bench", help="run the headline benchmark")
    sp.set_defaults(fn=_cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
