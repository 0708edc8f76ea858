from gandes_tpu.music.midi import Message, MetaMessage, MidiFile, MidiTrack
from gandes_tpu.music.piano_roll import generate_piano_roll, rasterize_events_jax, midi_to_events
from gandes_tpu.music.beats import get_beats
from gandes_tpu.music.generators import (
    LogLineProcessor,
    MidiGeneratorV0,
    MidiGeneratorV1,
    MidiGeneratorV2,
    process_adjsim_log_v0,
    process_adjsim_log_v1,
    process_adjsim_log_v2,
)
from gandes_tpu.music.mel import (
    melspectrogram_db,
    melspectrogram_db_tensor,
    melspectrogram_db_tensor_from_file,
    melspectrogram_power_tensor,
)
from gandes_tpu.music.synth import FluidSynth, render_midi
