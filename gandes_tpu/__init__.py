"""gandes_tpu — TPU-native framework with the capabilities of
marja-w/gan-des-midi-music-gen (GAN x DES MIDI music generation).

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):

- ``core``     — RNG stream discipline, event-log codec, profiling
                 (training configs are dataclasses in ``train``).
- ``des``      — the discrete-event simulator (host engine; C++ fast path),
                 queueing theory validators, SimTester.
- ``music``    — MIDI codec (self-contained SMF reader/writer), the log->MIDI
                 generators, piano-roll rasterization (host + batched JAX),
                 beat extraction, TPU-native synthesizer + mel spectrograms.
- ``data``     — MAESTRO-style datasets and loaders.
- ``models``   — flax GAN modules (GAN-DES DCGAN and MM-GAN MLP/CNN family).
- ``parallel`` — jax.sharding meshes, pjit train steps, collectives.
- ``train``    — training loops, losses, orbax checkpointing.
- ``bridge``   — matrix->Sim decoders (`matrix_to_midi`, `matrix_to_wav`,
                 `sim_to_wav`) with API parity to the reference.
- ``eval``     — generation entry points and visualization.
"""

__version__ = "0.1.0"
