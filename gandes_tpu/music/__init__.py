"""Music stack: MIDI codec, log->MIDI generators, piano rolls, beats,
TPU synth, mel spectrograms.

Exports resolve lazily (PEP 562) so numpy-only pieces (the MIDI codec, the
generators) don't pull in jax/flax just by importing the package.
"""

_EXPORTS = {
    "Message": "gandes_tpu.music.midi",
    "MetaMessage": "gandes_tpu.music.midi",
    "MidiFile": "gandes_tpu.music.midi",
    "MidiTrack": "gandes_tpu.music.midi",
    "generate_piano_roll": "gandes_tpu.music.piano_roll",
    "rasterize_events_jax": "gandes_tpu.music.piano_roll",
    "midi_to_events": "gandes_tpu.music.piano_roll",
    "get_beats": "gandes_tpu.music.beats",
    "LogLineProcessor": "gandes_tpu.music.generators",
    "MidiGeneratorV0": "gandes_tpu.music.generators",
    "MidiGeneratorV1": "gandes_tpu.music.generators",
    "MidiGeneratorV2": "gandes_tpu.music.generators",
    "process_adjsim_log_v0": "gandes_tpu.music.generators",
    "process_adjsim_log_v1": "gandes_tpu.music.generators",
    "process_adjsim_log_v2": "gandes_tpu.music.generators",
    "melspectrogram_db": "gandes_tpu.music.mel",
    "melspectrogram_db_from_file": "gandes_tpu.music.mel",
    "melspectrogram_db_ref_max": "gandes_tpu.music.mel",
    "melspectrogram_db_tensor": "gandes_tpu.music.mel",
    "melspectrogram_db_tensor_from_file": "gandes_tpu.music.mel",
    "melspectrogram_power_tensor": "gandes_tpu.music.mel",
    "FluidSynth": "gandes_tpu.music.synth",
    "midi_to_audio_fluidsynth": "gandes_tpu.music.synth",
    "render_midi": "gandes_tpu.music.synth",
    "Sf2Font": "gandes_tpu.music.sf2",
    "Sf2Synth": "gandes_tpu.music.sf2",
    "build_sf2": "gandes_tpu.music.sf2",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'gandes_tpu.music' has no attribute {name!r}")
