from gandes_tpu.music.midi import Message, MetaMessage, MidiFile, MidiTrack
from gandes_tpu.music.piano_roll import generate_piano_roll, rasterize_events_jax, midi_to_events
from gandes_tpu.music.beats import get_beats
