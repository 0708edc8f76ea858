"""Datasets, training loops, checkpoint/resume, CLI — end to end on
self-generated fixtures (no MAESTRO needed: the simulator generates MIDI)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

import jax

from gandes_tpu.data.datasets import (
    DataLoader,
    MaestroDatasetMidi,
    MaestroDatasetPickle,
    build_window_pickle,
    my_collate,
)


# midi_fixture_dir comes from conftest.py (session-scoped)


def test_cli_doctor(tmp_path, monkeypatch, capsys):
    from gandes_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    main(["doctor"])
    out = capsys.readouterr().out
    assert "all checks passed" in out
    assert "engine parity" in out and "FAIL" not in out


def test_build_window_pickle_and_dataset(midi_fixture_dir, tmp_path):
    out = str(tmp_path / "windows.pkl")
    n = build_window_pickle(str(midi_fixture_dir), out, sample_size=300,
                            sequence_length=50)
    assert n > 0
    ds = MaestroDatasetPickle(out, data_dir=".")
    roll, dur, beats = ds[0]
    assert roll.shape == (128, 50) and dur.shape == (128, 50) and beats.shape == (50,)
    # window 0 skipped: the pickler starts at window 1 (notebook cell 11)
    with open(out, "rb") as f:
        data = pickle.load(f)
    assert len(data) == n

    loader = DataLoader(ds, batch_size=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == n // 2
    r, d_, b = batches[0]
    assert r.shape == (2, 128, 50)


def test_pickler_fast_paths_match(midi_fixture_dir, tmp_path):
    """workers/device_rasterize fast paths produce byte-identical pickles
    to the sequential host pickler."""
    base = str(tmp_path / "base.pkl")
    dev = str(tmp_path / "dev.pkl")
    pooled = str(tmp_path / "pooled.pkl")
    n0 = build_window_pickle(str(midi_fixture_dir), base, sample_size=300,
                             sequence_length=50)
    n1 = build_window_pickle(str(midi_fixture_dir), dev, sample_size=300,
                             sequence_length=50, device_rasterize=True)
    n2 = build_window_pickle(str(midi_fixture_dir), pooled, sample_size=300,
                             sequence_length=50, workers=2)
    assert n0 == n1 == n2 and n0 > 0
    with open(base, "rb") as f:
        a = pickle.load(f)
    for path in (dev, pooled):
        with open(path, "rb") as f:
            b = pickle.load(f)
        assert len(a) == len(b)
        for (r0, d0, b0), (r1, d1, b1) in zip(a, b):
            np.testing.assert_array_equal(r0, r1)
            np.testing.assert_array_equal(d0, d1)
            np.testing.assert_array_equal(b0, b1)


def test_maestro_midi_dataset(midi_fixture_dir):
    ds = MaestroDatasetMidi(str(midi_fixture_dir), sequence_length=40)
    assert len(ds) >= 3
    roll, dur, beats = ds[0]
    assert roll.shape == (128, 40) and beats.shape == (50,)


def test_mmgan_training_loop_and_resume(midi_fixture_dir, tmp_path, monkeypatch):
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    cfg = MMGANConfig(batch_size=2, num_epochs=2, start=0, sequence_length=50,
                      models_dir=str(tmp_path / "models"),
                      losses_dir=str(tmp_path / "losses"), seed=1)
    np.random.seed(0)
    state, history = train_mmgan(ds, cfg, max_batches=2)
    assert len(history["disc"]) == 2 and len(history["disc"][0]) == 2
    assert all(np.isfinite(v) for e in history["disc"] for v in e)
    # loss pickles in reference naming
    assert os.path.exists(tmp_path / "losses" / "disc_losses_epoch_1.pkl")
    assert os.path.exists(tmp_path / "losses" / "gen_losses_epoch_2.pkl")
    # checkpoints per epoch
    assert os.path.isdir(tmp_path / "models" / "mmgan_64_64_epoch_2")

    # resume: restarts from epoch 2 and trains only the remaining epoch
    cfg2 = MMGANConfig(**{**cfg.__dict__, "num_epochs": 3})
    np.random.seed(0)
    state2, history2 = train_mmgan(ds, cfg2, max_batches=2)
    assert len(history2["disc"]) == 1
    assert int(state2.step) > int(state.step)


def test_mmgan_recycle_mode(midi_fixture_dir, tmp_path, monkeypatch):
    """--recycle-every N: epoch chunks in fresh processes via exact orbax
    resume (bounded-RSS long-run mode, VERDICT r3 #6). Two identical
    recycled runs must produce IDENTICAL loss pickles (each chunk seeds the
    global numpy stream deterministically via the derived --np-seed), and
    the checkpoints must reach the full epoch target."""
    import pickle
    import subprocess
    import sys as _sys

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, env.get("PYTHONPATH", "")] if p)
    env["JAX_PLATFORMS"] = "cpu"

    def run(tag):
        wd = tmp_path / tag
        (wd / "logs").mkdir(parents=True)
        proc = subprocess.run(
            [_sys.executable, "-m", "gandes_tpu.cli", "train-mmgan",
             "--data", out, "--epochs", "2", "--recycle-every", "1",
             "--batch-size", "2", "--max-batches", "2", "--start", "0",
             "--sequence-length", "50", "--models-dir", str(wd / "models"),
             "--losses-dir", str(wd / "losses")],
            env=env, cwd=str(wd), text=True, capture_output=True, timeout=900)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert os.path.isdir(wd / "models" / "mmgan_64_64_epoch_2")
        losses = {}
        for ep in (1, 2):
            with open(wd / "losses" / f"disc_losses_epoch_{ep}.pkl", "rb") as f:
                losses[ep] = pickle.load(f)
        return losses

    a, b = run("a"), run("b")
    assert a == b, "recycled runs are not reproducible"


def test_mmgan_faithful_and_direct_modes(midi_fixture_dir, tmp_path, monkeypatch):
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    for name, kw in (("faithful", {"faithful": True}),
                     ("direct", {"g_update": "direct"})):
        cfg = MMGANConfig(batch_size=2, num_epochs=1, start=0, sequence_length=50,
                          models_dir=str(tmp_path / f"m_{name}"),
                          losses_dir=str(tmp_path / f"l_{name}"),
                          save_interval=99, resume=False, seed=2, **kw)
        np.random.seed(1)
        state, history = train_mmgan(ds, cfg, max_batches=1)
        assert np.isfinite(history["disc"][0][0]), name
        assert np.isfinite(history["gen"][0][0]), name


def test_mmgan_training_loop_mesh(midi_fixture_dir, tmp_path, monkeypatch):
    """Sharded training over a (dp=4, tp=2) mesh: the loop runs end to end
    (host DES stage + sharded device step), params pick up tp column
    sharding, and the checkpoint is reloadable."""
    from gandes_tpu.train import checkpoint as ckpt
    from gandes_tpu.train.mmgan_loop import (
        MMGANConfig, init_state_for_config, train_mmgan,
    )

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    cfg = MMGANConfig(batch_size=4, num_epochs=1, start=0, sequence_length=50,
                      models_dir=str(tmp_path / "models"),
                      losses_dir=str(tmp_path / "losses"), seed=1,
                      mesh_shape=(4, 2))
    np.random.seed(0)
    state, history = train_mmgan(ds, cfg, max_batches=1)
    assert np.isfinite(history["disc"][0][0]) and np.isfinite(history["gen"][0][0])
    # G1's hidden->4096 projection is column-parallel over tp
    kern = state.g_params["g1"]["_GenBlock_3"]["Dense_0"]["kernel"]
    assert "tp" in str(kern.sharding.spec)
    # sharded checkpoint restores into a fresh (unsharded) template
    fresh, _, _ = init_state_for_config(cfg, steps_per_epoch=1)
    restored = ckpt.restore_state(str(tmp_path / "models" / "mmgan_64_64_epoch_1"),
                                  fresh)
    np.testing.assert_allclose(np.asarray(restored.d_params["Dense_0"]["bias"]),
                               np.asarray(state.d_params["Dense_0"]["bias"]))

    # divisibility is validated up front
    bad = MMGANConfig(**{**cfg.__dict__, "batch_size": 3})
    with pytest.raises(ValueError, match="divisible"):
        train_mmgan(ds, bad, max_batches=1)


def test_gandes_training_loop_mesh(tmp_path, monkeypatch):
    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    rng = np.random.RandomState(0)
    batches = [rng.rand(4, 128, 216).astype(np.float32) * 40 - 40]
    cfg = GanDesConfig(batch_size=4, model_path=str(tmp_path / "models"),
                       number_of_customers=120, max_sim_time=0.3,
                       save_step=99, mesh_shape=(4, 1))
    np.random.seed(2)
    state, history = train_gandes(iter(batches), cfg, max_steps=1)
    assert np.isfinite(history["disc"][0])


def test_gandes_training_loop(tmp_path, monkeypatch):
    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    rng = np.random.RandomState(0)
    batches = [rng.rand(4, 128, 216).astype(np.float32) * 40 - 40 for _ in range(2)]
    cfg = GanDesConfig(batch_size=4, model_path=str(tmp_path / "models"),
                       number_of_customers=120, max_sim_time=0.3)
    np.random.seed(2)
    state, history = train_gandes(iter(batches), cfg, max_steps=2)
    assert len(history["disc"]) == 2
    assert all(np.isfinite(v) for v in history["disc"])


def test_gandes_resume_continues_exactly(tmp_path, monkeypatch):
    """GAN-DES resume: 2 straight steps + 2 resumed steps reproduce a
    4-step run bit-for-bit — full state (params, BN stats, both Adam
    states, step counter) restores, and the step-derived noise streams
    plus the global-numpy DES stream CONTINUE rather than replay."""
    import jax

    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    rng = np.random.RandomState(0)
    batches = [rng.rand(4, 128, 216).astype(np.float32) * 40 - 40
               for _ in range(4)]

    def cfg(models_dir, save_step=2):
        return GanDesConfig(batch_size=4, model_path=str(tmp_path / models_dir),
                            number_of_customers=120, max_sim_time=0.3,
                            save_step=save_step, resume=True)

    np.random.seed(2)
    ref_state, ref_hist = train_gandes(iter(batches), cfg("m_straight"),
                                       max_steps=4)

    # split run in the SAME process: the global numpy stream continues
    # across the save/restore boundary exactly as it does mid-run (the
    # step-derived jax streams continue cross-process too; the DES's
    # global-numpy stream is process-level — seeded here once, as the
    # straight run was)
    np.random.seed(2)
    state1, hist1 = train_gandes(iter(batches), cfg("m_split"), max_steps=3)
    # checkpoint gen_2_* captured state AFTER the step-2 update (step==3);
    # the resumed loop gets the FULL dataloader and must fast-forward past
    # the 3 already-trained batches by itself
    state2, hist2 = train_gandes(iter(batches), cfg("m_split"),
                                 max_steps=4)
    assert int(state2.step) == 4
    for a, b in zip(jax.tree.leaves(ref_state.g_params),
                    jax.tree.leaves(state2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref_state.d_opt),
                    jax.tree.leaves(state2.d_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(ref_hist["disc"][3], hist2["disc"][0])


def test_multimodal_gan_composite(tmp_path, monkeypatch):
    from gandes_tpu.models.composite import MultiModalGAN

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    np.random.seed(5)
    mmgan = MultiModalGAN(z_dim=50, adj_size=(64, 64), roll_size=(2, 128, 50),
                          input_dim=50, output_dim=20, instrument=0,
                          start=0, end=50, out_dir=str(tmp_path / "midi"))
    noise1 = np.random.randn(2, 50).astype(np.float32)
    noise2 = np.random.randn(2, 50).astype(np.float32)
    beats = np.zeros((2, 50), np.float32)
    logits, failed = mmgan(noise1, noise2, beats, count=1)
    assert logits.shape == (2, 1)
    rolls = mmgan.generate_midi(noise1[:1], noise2[:1], beats[:1])
    assert rolls[0].shape == (2, 128, 50)
    assert os.path.exists(tmp_path / "midi" / "generation.mid")


def test_simnn_heads():
    from gandes_tpu.models.composite import SimNN

    model = SimNN(10)
    x = np.random.RandomState(0).randn(2, 1, 64, 64).astype(np.float32)
    v = model.init(jax.random.key(0), x)
    matrix, a1, a2, a3, a4 = model.apply(v, x)
    assert matrix.shape == (2, 10, 10)
    assert a1.shape == a2.shape == a3.shape == a4.shape == (2, 10)


def test_simnn_create_and_pretrain():
    from gandes_tpu.models.composite import SimNN

    model = SimNN.create_model(4)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 32, 32).astype(np.float32)
    targets = (rng.randn(2, 4, 4).astype(np.float32),
               *(rng.randn(2, 4).astype(np.float32) for _ in range(4)))
    v = model.init(jax.random.key(0), x)
    v2, losses = model.pretrain_model(v, [(x, targets)] * 4, num_epochs=3)
    assert len(losses) == 12
    assert losses[-1] < losses[0]  # MSE regression actually trains
    out = model.apply(v2, x)
    assert out[0].shape == (2, 4, 4)
    assert SimNN.error_system(out[0]) is None  # reference placeholder parity


def test_cli_sim_to_wav(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "gandes_tpu.cli", "sim-to-wav", "--size", "32",
         "--instrument", "4", "--seed", "3", "--out-dir", "demo_out"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "demo_out" / "wav" / "output_0.wav").exists()
    assert (tmp_path / "demo_out" / "midi" / "output.mid").exists()


def test_cli_eval_metrics_checkpoint_selection(midi_fixture_dir, tmp_path,
                                               monkeypatch, capsys):
    """`eval-metrics --checkpoints-dir` sweeps every epoch checkpoint of a
    training run with identical noise/data and ranks them — the
    checkpoint-selection workflow docs/RESULTS.md describes (adversarial
    gaps oscillate epoch to epoch, so users pick by measured gap)."""
    import json

    from gandes_tpu.cli import main
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    cfg = MMGANConfig(batch_size=2, num_epochs=2, start=100, sequence_length=50,
                      models_dir=str(tmp_path / "models"),
                      losses_dir=str(tmp_path / "losses"), seed=1)
    np.random.seed(0)
    train_mmgan(ds, cfg, max_batches=1)

    def _json_tail(text):
        # generation progress lines may print before the JSON object; the
        # object itself (indent=2) is the last thing on stdout
        return json.loads(text[text.rindex("\n{") + 1:] if "\n{" in text
                          else text)

    main(["eval-metrics", "--data", out, "--checkpoints-dir",
          str(tmp_path / "models"), "--n", "2", "--des-parallel", "2"])
    res = _json_tail(capsys.readouterr().out)
    assert sorted(res["per_epoch"]) == ["1", "2"]
    assert res["rank_by"] == "avg_rank"
    assert str(res["best_epoch"]) in res["per_epoch"]
    assert res["best_checkpoint"].endswith(f"epoch_{res['best_epoch']}")
    for e, gaps in res["per_epoch"].items():
        assert {"pitch_class_l1", "velocity_mean_gap", "avg_rank"} <= set(gaps)

    # a named gap key also works as the ranking criterion
    main(["eval-metrics", "--data", out, "--checkpoints-dir",
          str(tmp_path / "models"), "--n", "2", "--des-parallel", "2",
          "--rank-by", "pitch_class_l1"])
    res2 = _json_tail(capsys.readouterr().out)
    best = str(res2["best_epoch"])
    assert all(res2["per_epoch"][best]["pitch_class_l1"]
               <= g["pitch_class_l1"] for g in res2["per_epoch"].values())


def test_cli_eval_metrics_gandes_selection(midi_fixture_dir, tmp_path,
                                           monkeypatch, capsys):
    """The symmetric GAN-DES selection: `eval-metrics --family gandes`
    ranks gen_<step>_<ts> checkpoints by mel-spectral gaps against real
    MIDI rendered through the audio path."""
    import json

    from gandes_tpu.cli import main
    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    rng = np.random.RandomState(0)
    batches = [rng.rand(2, 128, 216).astype(np.float32) * 40 - 40 for _ in range(3)]
    cfg = GanDesConfig(batch_size=2, model_path=str(tmp_path / "models"),
                       number_of_customers=120, max_sim_time=0.3, save_step=1)
    np.random.seed(2)
    train_gandes(iter(batches), cfg, max_steps=3)  # saves steps 1 and 2

    main(["eval-metrics", "--family", "gandes", "--data", str(midi_fixture_dir),
          "--checkpoints-dir", str(tmp_path / "models"), "--n", "2",
          "--des-parallel", "2"])
    out = capsys.readouterr().out
    res = json.loads(out[out.rindex("\n{") + 1:] if "\n{" in out else out)
    assert res["family"] == "gandes"
    assert sorted(res["per_epoch"]) == ["1", "2"]  # saved steps 1 and 2
    assert {"db_mean_gap", "centroid_gap", "flux_gap", "avg_rank"} <= set(
        res["per_epoch"]["1"])
    assert res["best_checkpoint"].startswith(str(tmp_path / "models"))


def test_mmgan_resume_continues_rng_streams(midi_fixture_dir, tmp_path,
                                            monkeypatch):
    """Resume must CONTINUE the per-batch RNG streams, not replay them:
    every key derives from `count`, so a resumed run's counts pick up
    where the restored epochs left off (review finding, r2)."""
    import gandes_tpu.train.mmgan_loop as ml
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)

    seen_counts = []
    real_m2m = ml.matrix_to_midi

    def recording_m2m(*a, **kw):
        seen_counts.append(kw.get("count"))
        return real_m2m(*a, **kw)

    monkeypatch.setattr(ml, "matrix_to_midi", recording_m2m)
    cfg = MMGANConfig(batch_size=2, num_epochs=1, start=0, sequence_length=50,
                      models_dir=str(tmp_path / "models"),
                      losses_dir=str(tmp_path / "losses"), seed=1)
    np.random.seed(0)
    train_mmgan(ds, cfg)
    first_run = list(seen_counts)
    assert first_run[0] == 1

    seen_counts.clear()
    cfg2 = MMGANConfig(**{**cfg.__dict__, "num_epochs": 2})
    np.random.seed(0)
    train_mmgan(ds, cfg2)  # resumes from epoch 1
    # the resumed epoch's counts continue past the first run's, so noise/
    # aux keys (all fold_in(key, count)) are fresh draws, not replays
    assert seen_counts[0] == first_run[-1] + 1


def test_mmgan_direct_mode_decodes_rolls_and_faithful_guard(
        midi_fixture_dir, tmp_path, monkeypatch):
    import gandes_tpu.train.mmgan_loop as ml
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)

    seen_force = []
    real_m2m = ml.matrix_to_midi

    def recording_m2m(*a, **kw):
        seen_force.append(kw.get("force_roll"))
        return real_m2m(*a, **kw)

    monkeypatch.setattr(ml, "matrix_to_midi", recording_m2m)
    cfg = MMGANConfig(batch_size=2, num_epochs=1, start=0, sequence_length=50,
                      models_dir=str(tmp_path / "m_d"), resume=False,
                      losses_dir=str(tmp_path / "l_d"), seed=1,
                      g_update="direct")
    np.random.seed(0)
    train_mmgan(ds, cfg, max_batches=1)
    # the straight-through value must be the DES's ACTUAL roll, not the
    # save-gated blank (review finding, r2)
    assert seen_force == [True]

    # faithful re-runs the fake path and would silently overwrite the
    # g_update objective's generator loss — rejected up front
    bad = MMGANConfig(**{**cfg.__dict__, "faithful": True})
    with pytest.raises(ValueError, match="faithful"):
        train_mmgan(ds, bad, max_batches=1)


def test_gandes_sound_font_and_pad_batches(tmp_path, monkeypatch):
    """The fake path renders with the configured soundfont (same synth as
    the real dataset) and pad_batches pins one compiled batch shape."""
    import gandes_tpu.train.gandes_loop as gl
    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)

    seen = []
    real_m2w = gl.matrix_to_wav

    def recording_m2w(*a, **kw):
        seen.append((kw.get("sound_font"), len(a[0])))
        return real_m2w(*a, **kw)

    monkeypatch.setattr(gl, "matrix_to_wav", recording_m2w)
    rng = np.random.RandomState(0)
    # variable my_collate-style sizes: 3 then 2
    batches = [rng.rand(3, 128, 216).astype(np.float32) * 40 - 40,
               rng.rand(2, 128, 216).astype(np.float32) * 40 - 40]
    # a real minimal font: a missing --sound-font path fails loudly by
    # contract (tests/test_sf2.py::test_missing_sound_font_fails_loudly)
    from gandes_tpu.music.sf2 import build_sf2

    sf = build_sf2(
        str(tmp_path / "mini.sf2"),
        samples=[{"name": "s", "data": np.sin(np.arange(800) / 8.0) * 0.4,
                  "sample_rate": 44100, "original_pitch": 60}],
        instruments=[{"name": "i", "zones": [{"sample": 0}]}],
        presets=[{"name": "p", "program": 0, "zones": [{"instrument": 0}]}],
    )
    cfg = GanDesConfig(batch_size=4, model_path=str(tmp_path / "models"),
                       number_of_customers=120, max_sim_time=0.3,
                       save_step=99, sound_font=sf, pad_batches=True)
    np.random.seed(2)
    state, history = train_gandes(iter(batches), cfg, max_steps=2)
    assert [s for s, _ in seen] == [sf, sf]
    assert [n for _, n in seen] == [4, 4]  # both batches padded to batch_size
    assert all(np.isfinite(v) for v in history["disc"])


def test_sweep_validates_rank_by_and_routes_torch_files(tmp_path):
    """Regression pair for the checkpoint sweep: (1) a typo'd --rank-by
    dies BEFORE any checkpoint is evaluated (a sweep is minutes-to-hours
    of G+DES work); (2) the reference's torch state_dict files
    (mmgan_{a}_{b}_epoch_{e}.pth / gen_{step}_{ts}.pt) sweep alongside
    this framework's orbax dirs, routed through the torch loader."""
    import argparse

    from gandes_tpu.cli import (
        _gandes_step_key,
        _mmgan_epoch_key,
        _sweep_checkpoints,
    )

    assert _mmgan_epoch_key("mmgan_64_64_epoch_35.pth") == 35
    assert _mmgan_epoch_key("mmgan_64_64_epoch_35") == 35
    assert _mmgan_epoch_key("mmgan_64_64_epoch_7_surrogate") is None
    assert _gandes_step_key("gen_100_1699999999.25.pt") == 100
    assert _gandes_step_key("gen_100_1699999999.25") == 100
    assert _gandes_step_key("gen_100_1699999999.25.pt.bak") is None

    ckdir = tmp_path / "models"
    ckdir.mkdir()
    (ckdir / "mmgan_64_64_epoch_1").mkdir()          # orbax-style dir
    (ckdir / "mmgan_64_64_epoch_2.pth").write_bytes(b"x")  # torch file
    calls = []

    def gaps_for(checkpoint=None, torch_checkpoint=None):
        calls.append((checkpoint, torch_checkpoint))
        e = 1 if checkpoint else 2
        return {}, {"duration_mean": float(e)}, 0

    args = argparse.Namespace(checkpoints_dir=str(ckdir), rank_by="oops")
    with pytest.raises(SystemExit, match="--rank-by must be"):
        _sweep_checkpoints(args, {}, gaps_for, _mmgan_epoch_key,
                           gap_keys={"duration_mean"})
    assert calls == []  # nothing was evaluated for the bad key

    args.rank_by = "duration_mean"
    out = {}
    _sweep_checkpoints(args, out, gaps_for, _mmgan_epoch_key,
                       gap_keys={"duration_mean"})
    assert calls == [(str(ckdir / "mmgan_64_64_epoch_1"), None),
                     (None, str(ckdir / "mmgan_64_64_epoch_2.pth"))]
    assert out["best_epoch"] == 1 and sorted(out["per_epoch"]) == ["1", "2"]


def test_eval_metrics_gandes_skips_short_renders(midi_fixture_dir, tmp_path,
                                                 monkeypatch, capsys):
    """A MIDI that renders shorter than the 5 s mel window must be skipped
    with a note, not crash the whole eval with a ragged concatenate."""
    import json
    import shutil

    from gandes_tpu.cli import main
    from gandes_tpu.music.midi import Message, MetaMessage, MidiFile, MidiTrack

    data = tmp_path / "data"
    data.mkdir()
    for p in midi_fixture_dir.rglob("*.mid"):
        shutil.copy(p, data / f"{p.parent.parent.name}_{p.name}")
    mid = MidiFile(type=0, ticks_per_beat=480)
    tr = MidiTrack()
    tr.append(MetaMessage("set_tempo", tempo=500000, time=0))
    tr.append(Message("note_on", note=60, velocity=90, time=0))
    tr.append(Message("note_off", note=60, velocity=0, time=120))  # ~0.12 s
    tr.append(MetaMessage("end_of_track", time=0))
    mid.tracks.append(tr)
    mid.save(str(data / "0short.mid"))  # sorts first -> definitely read

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    main(["eval-metrics", "--family", "gandes", "--data", str(data),
          "--n", "1000"])  # > total windows: every file is read
    cap = capsys.readouterr()
    # collect_real_mels drops short renders BEFORE counting and reports
    # the real-side composition; the 0.12 s file must not be among the
    # contributing files (its mel has fewer frames than the full window)
    assert "real side =" in cap.err
    n_files = int(cap.err.split("from ")[1].split(" file")[0])
    assert n_files < len(list(data.iterdir()))
    res = json.loads(cap.out[cap.out.rindex("\n{") + 1:]
                     if "\n{" in cap.out else cap.out)
    assert res["family"] == "gandes" and res["n_real"] >= 1


def test_bf16_compute_dtype_trains_with_f32_state(midi_fixture_dir, tmp_path,
                                                  monkeypatch):
    """Opt-in mixed precision: compute_dtype='bf16' runs the dense math in
    bfloat16 while params / optimizer state / BN stats stay float32 (so
    checkpoints interop with f32 runs); losses stay finite in both loops.
    Default remains the reference's float32 numerics."""
    import jax.numpy as jnp

    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    cfg = MMGANConfig(batch_size=4, num_epochs=1, start=0, sequence_length=50,
                      models_dir=str(tmp_path / "models"),
                      losses_dir=str(tmp_path / "losses"), seed=1,
                      compute_dtype="bf16", resume=False,
                      mesh_shape=(4, 2))  # bf16 composes with dp/tp sharding
    np.random.seed(0)
    state, history = train_mmgan(ds, cfg, max_batches=2)
    assert all(np.isfinite(v) for e in history["disc"] for v in e)
    leaves = jax.tree.leaves((state.g_params, state.d_params, state.g_opt,
                              state.d_opt, state.g_stats))
    assert all(l.dtype != jnp.bfloat16 for l in leaves if hasattr(l, "dtype"))
    kern = state.g_params["g1"]["_GenBlock_3"]["Dense_0"]["kernel"]
    assert "tp" in str(kern.sharding.spec)  # sharding survives the bf16 cast

    rng = np.random.RandomState(0)
    batches = [rng.rand(2, 128, 216).astype(np.float32) * 40 - 40]
    gcfg = GanDesConfig(batch_size=2, model_path=str(tmp_path / "gmodels"),
                        number_of_customers=120, max_sim_time=0.3,
                        compute_dtype="bf16")
    np.random.seed(2)
    gstate, ghistory = train_gandes(iter(batches), gcfg, max_steps=1)
    assert all(np.isfinite(v) for v in ghistory["disc"])
    gleaves = jax.tree.leaves((gstate.g_params, gstate.d_params))
    assert all(l.dtype != jnp.bfloat16 for l in gleaves if hasattr(l, "dtype"))

    with pytest.raises(ValueError, match="compute_dtype"):
        train_mmgan(ds, MMGANConfig(**{**cfg.__dict__,
                                       "compute_dtype": "fp8"}), max_batches=1)


def test_gandes_resume_restores_surrogate_companion(tmp_path, monkeypatch):
    """Surrogate-mode resume restores the *_surrogate companion checkpoint
    too: a 2+2 split run reproduces a straight 4-step run's surrogate
    params exactly (if the companion were re-initialized instead, the
    online-regression state would diverge immediately)."""
    import jax

    from gandes_tpu.train.gandes_loop import GanDesConfig, train_gandes

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)
    rng = np.random.RandomState(0)
    batches = [rng.rand(4, 128, 216).astype(np.float32) * 40 - 40
               for _ in range(4)]

    def cfg(models_dir):
        return GanDesConfig(batch_size=4, model_path=str(tmp_path / models_dir),
                            number_of_customers=120, max_sim_time=0.3,
                            save_step=2, resume=True, g_update="surrogate")

    np.random.seed(7)
    ref_state, _ = train_gandes(iter(batches), cfg("s_straight"), max_steps=4)

    np.random.seed(7)
    train_gandes(iter(batches), cfg("s_split"), max_steps=3)
    assert os.path.isdir(str(tmp_path / "s_split") + "/" + [
        n for n in os.listdir(tmp_path / "s_split") if n.endswith("_surrogate")][0])
    state2, _ = train_gandes(iter(batches), cfg("s_split"), max_steps=4)
    assert int(state2.step) == 4
    for a, b in zip(jax.tree.leaves(ref_state.g_params),
                    jax.tree.leaves(state2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
