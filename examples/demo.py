"""End-to-end demo — the reference `demo.ipynb` as a script.

Covers the notebook's cells (SURVEY.md §2 row 32): render training-style
audio, generate music from an (optionally trained) MM-GAN through the DES,
random-network instrument presets, and spectrogram/piano-roll/queue-GIF
visualization. Everything lands in ``demo_out/``.

Run:  python examples/demo.py  [--checkpoint models/mmgan_64_64_epoch_N]
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable without an install step: `python examples/demo.py` from anywhere
# finds the package at the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--play", action="store_true",
                    help="play the generated piece (pygame, like the "
                         "reference notebook; falls back to aplay/paplay)")
    ap.add_argument("--sound-font", default=None,
                    help=".sf2 path: synthesize by sample playback")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    os.makedirs("logs", exist_ok=True)

    from gandes_tpu.bridge.sim_demo import sim_to_wav
    from gandes_tpu.data.audio import load_wav, save_wav
    from gandes_tpu.eval.visualize import (
        plot_spectrogram,
        simulation_log_to_gif,
        visualize_piano_roll,
    )
    from gandes_tpu.music.mel import melspectrogram_db_tensor
    from gandes_tpu.music.synth import render_midi
    from gandes_tpu.train import checkpoint as ckpt
    from gandes_tpu.train.mmgan_loop import MMGANConfig, generate_midi, init_state_for_config

    # 1. instrument-preset random networks (demo.ipynb cells 13-22)
    print("== random queueing networks with instrument presets ==")
    np.random.seed(args.seed)
    for name, program in [("piano", 0), ("marimba", 12), ("organ", 19)]:
        outs = sim_to_wav(matrices=[None], size=32, use_same_instrument=program,
                          out_dir=os.path.join(args.out, f"preset_{name}"))
        print(f"  {name}: {outs[0]}")

    # 2. MM-GAN generation through the DES (cells 25-28)
    print("== MM-GAN generation ==")
    cfg = MMGANConfig(start=100, sequence_length=50)
    state, _, _ = init_state_for_config(cfg, batch_size=1)
    if args.checkpoint:
        state = ckpt.restore_state(args.checkpoint, state)
        print(f"  loaded {args.checkpoint}")
    rng = np.random.RandomState(args.seed)
    noise1 = rng.randn(1, cfg.noise_dim).astype(np.float32)
    noise2 = rng.randn(1, cfg.noise_dim).astype(np.float32)
    beats = np.zeros((1, cfg.max_beat_length), np.float32)
    np.random.seed(args.seed)
    rolls = generate_midi(state, cfg, noise1, noise2, beats,
                          out_dir=os.path.join(args.out, "mmgan"))
    mid_path = os.path.join(args.out, "mmgan", "generation.mid")
    print(f"  roll sum={rolls[0].sum():.0f} -> {mid_path}")
    visualize_piano_roll(rolls[0][0], save_path=os.path.join(args.out, "piano_roll.png"))

    # 3. synthesize + spectrogram (cells 2-4, 28)
    audio = render_midi(mid_path, sound_font=args.sound_font)
    wav_path = os.path.join(args.out, "generation.wav")
    save_wav(wav_path, audio)
    mel = melspectrogram_db_tensor(load_wav(wav_path)[0])
    plot_spectrogram(mel, save_path=os.path.join(args.out, "spectrogram.png"))
    print(f"  {wav_path} ({len(audio) / 44100:.1f}s), spectrogram.png")

    # 3b. playback (cells 25-28 used pygame.mixer on generation output)
    if args.play:
        from gandes_tpu.data.audio import play_wav

        ok = play_wav(wav_path)
        print("  played generation.wav" if ok
              else "  no audio device available; wrote generation.wav")

    # 4. queue-length animation from the last sim log (simlog_to_vid.ipynb)
    if os.path.exists("logs/simulation.log"):
        simulation_log_to_gif("logs/simulation.log",
                              out_path=os.path.join(args.out, "simulation.gif"))
        print("  simulation.gif")

    print(f"done -> {args.out}/")


if __name__ == "__main__":
    main()
