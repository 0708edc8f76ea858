"""MIDI codec tests: roundtrip, reference-artifact parsing, tempo map."""

import glob

import numpy as np
import pytest

from gandes_tpu.music.midi import (
    DEFAULT_TEMPO,
    Message,
    MetaMessage,
    MidiFile,
    MidiTrack,
    _decode_varlen,
    _encode_varlen,
)

from conftest import reference_available


def test_varlen_roundtrip():
    for v in [0, 1, 127, 128, 500, 16383, 16384, 2097151, 2097152, 0x0FFFFFFF]:
        data = _encode_varlen(v)
        out, pos = _decode_varlen(data, 0)
        assert out == v and pos == len(data)


def test_save_load_roundtrip(tmp_path):
    mid = MidiFile()
    track = MidiTrack()
    mid.tracks.append(track)
    track.append(MetaMessage("set_tempo", tempo=750000, time=0))
    track.append(MetaMessage("time_signature", numerator=3, denominator=8, time=0))
    track.append(MetaMessage("key_signature", key="G#m", time=0))
    track.append(Message("program_change", program=42, time=0))
    track.append(Message("note_on", channel=0, note=60, velocity=100, time=5))
    track.append(Message("note_off", channel=0, note=60, velocity=100, time=17))
    track.append(Message("control_change", control=64, value=127, time=3))
    track.append(Message("pitchwheel", pitch=-1024, time=2))
    track.append(MetaMessage("end_of_track", time=0))
    path = str(tmp_path / "rt.mid")
    mid.save(path)

    loaded = MidiFile(path)
    assert loaded.ticks_per_beat == 480
    assert len(loaded.tracks) == 1
    assert list(loaded.tracks[0]) == list(track)


@pytest.mark.parametrize("key", ["C", "C#", "D", "E", "F", "F#", "G", "G#m", "A", "A#m", "B"])
def test_key_signatures_roundtrip(tmp_path, key):
    # all 11 keys the MM-GAN generator can emit (sim_log_to_midi.py:46)
    mid = MidiFile()
    t = MidiTrack()
    mid.tracks.append(t)
    t.append(MetaMessage("key_signature", key=key, time=0))
    t.append(MetaMessage("end_of_track", time=0))
    p = str(tmp_path / "k.mid")
    mid.save(p)
    assert MidiFile(p).tracks[0][0].key == key


def test_iteration_seconds_with_tempo_change(tmp_path):
    mid = MidiFile()
    t = MidiTrack()
    mid.tracks.append(t)
    # default tempo 500000 until the set_tempo is *yielded*
    t.append(Message("note_on", note=60, velocity=64, time=480))   # 0.5 s at default
    t.append(MetaMessage("set_tempo", tempo=1000000, time=480))    # still 0.5 s
    t.append(Message("note_off", note=60, velocity=64, time=480))  # 1.0 s at new tempo
    t.append(MetaMessage("end_of_track", time=0))
    deltas = [msg.time for msg in mid]
    assert deltas == pytest.approx([0.5, 0.5, 1.0, 0.0])
    assert mid.length == pytest.approx(2.0)


def test_merge_tracks_two_tracks():
    a, b = MidiTrack(), MidiTrack()
    a.append(Message("note_on", note=60, time=10))
    a.append(MetaMessage("end_of_track", time=5))
    b.append(Message("note_on", note=64, time=4))
    b.append(Message("note_off", note=64, time=20))
    mid = MidiFile()
    mid.tracks = [a, b]
    merged = [(m.type, getattr(m, "note", None)) for m in mid]
    assert merged == [
        ("note_on", 64),
        ("note_on", 60),
        ("note_off", 64),
        ("end_of_track", None),
    ]


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_parse_reference_artifacts():
    """The reference's committed mido-written .mid files must parse."""
    paths = sorted(glob.glob("/root/reference/MMGAN_MIDI_DES/adj_sim_outputs/midi/*.mid"))
    assert paths
    total_notes = 0
    for p in paths:
        mid = MidiFile(p)
        assert mid.tracks, p
        notes = [m for t in mid.tracks for m in t if getattr(m, "type", "") == "note_on"]
        total_notes += len(notes)
        for m in notes:
            assert 0 <= m.note < 128 and 0 <= m.velocity < 128
        # seconds-domain iteration terminates and is non-negative
        assert all(m.time >= 0 for m in mid)
        # the merge-free fast iterator is exactly equivalent on real files
        from gandes_tpu.music.midi import iter_seconds

        merge = [(m.type, m.time) for m in mid]
        fast = [(m.type, d) for m, d in iter_seconds(mid)]
        assert fast == merge, p
    assert total_notes > 50


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_reference_artifact_reencode_stable():
    """decode -> encode -> decode is a fixed point (message-level)."""
    p = sorted(glob.glob("/root/reference/MMGAN_MIDI_DES/adj_sim_outputs/midi/interesting*.mid"))[0]
    mid = MidiFile(p)
    import io, os, tempfile
    with tempfile.TemporaryDirectory() as d:
        q = os.path.join(d, "re.mid")
        mid.save(q)
        again = MidiFile(q)
    assert [list(t) for t in again.tracks] == [list(t) for t in mid.tracks]


def test_iter_seconds_fast_path_equals_merge(tmp_path):
    """iter_seconds' single-track fast path must yield byte-identical
    (message, delta) streams to full merge iteration, including tempo-map
    application; multi-track and interior-EOT files take the merge path."""
    from gandes_tpu.music.midi import iter_seconds

    mid = MidiFile()
    t = MidiTrack()
    mid.tracks.append(t)
    t.append(MetaMessage("set_tempo", tempo=123456, time=0))
    t.append(Message("program_change", program=7, time=3))
    t.append(Message("note_on", note=60, velocity=64, time=480))
    t.append(MetaMessage("set_tempo", tempo=1000000, time=480))
    t.append(Message("note_off", note=60, velocity=64, time=480))
    t.append(MetaMessage("end_of_track", time=0))

    merge = [(m.type, m.time) for m in mid]
    fast = [(m.type, d) for m, d in iter_seconds(mid)]
    assert fast == merge  # exact float equality required

    # multi-track file -> falls back to merge (same stream either way)
    a, b = MidiTrack(), MidiTrack()
    a.append(Message("note_on", note=60, time=10))
    a.append(MetaMessage("end_of_track", time=5))
    b.append(Message("note_off", note=60, time=4))
    mid2 = MidiFile()
    mid2.tracks = [a, b]
    assert [(m.type, d) for m, d in iter_seconds(mid2)] == [
        (m.type, m.time) for m in mid2
    ]


def test_render_from_memory_equals_render_from_file(tmp_path):
    """A v1-generator MidiFile renders identically whether passed in memory
    or re-parsed from the file it just saved (encode/parse are inverse for
    these tracks) — the basis for the bridge's skip-the-reparse fast path."""
    import numpy as np

    from gandes_tpu.music.generators import process_adjsim_log_v1
    from gandes_tpu.music.synth import midi_to_event_arrays

    lines = []
    for i in range(60):
        lines.append(f"INFO:root:{float(i) + 0.25!r} - {3 * i} - {i % 4} - arrival")
        lines.append(f"INFO:root:{float(i) + 0.75!r} - {3 * i} - {i % 4} - departure")
    out = str(tmp_path / "output.mid")
    path, mid = process_adjsim_log_v1(
        instruments=np.arange(4), note_levels=np.asarray([60, 62, 64, 65]),
        lines=lines, out_path=out, return_mid=True,
    )
    ev_mem = midi_to_event_arrays(mid, 256)
    ev_file = midi_to_event_arrays(MidiFile(path), 256)
    for a, b in zip(ev_mem[:5], ev_file[:5]):
        np.testing.assert_array_equal(a, b)
    assert ev_mem[5] == ev_file[5] and ev_mem[6] == ev_file[6]
    assert ev_mem[5] > 0  # non-trivial


def test_randomized_message_roundtrip_fuzz(tmp_path):
    """Randomized save->parse roundtrip over every channel-voice message
    kind (all channels, full field ranges, random interleavings),
    tempo + key-signature metas, and multi-track files: the parsed file
    must reproduce every message type, channel, field, and delta time
    exactly. (The writer always emits explicit status bytes, so the
    running-status DECODE path is exercised by the reference-artifact
    tests above — mido-written files use running status — not here.)"""
    from gandes_tpu.music.midi import _CHANNEL_SPECS, _KEYS_MAJOR, _KEYS_MINOR

    all_keys = list(_KEYS_MAJOR.values()) + list(_KEYS_MINOR.values())

    rng = np.random.RandomState(1234)
    field_ranges = {"note": 128, "velocity": 128, "value": 128,
                    "control": 128, "program": 128}
    for case in range(25):
        mid = MidiFile(type=1, ticks_per_beat=int(rng.randint(24, 960)))
        n_tracks = int(rng.randint(1, 4))
        for _ in range(n_tracks):
            tr = MidiTrack()
            tr.append(MetaMessage("set_tempo",
                                  tempo=int(rng.randint(100000, 1200000)),
                                  time=0))
            tr.append(MetaMessage("key_signature",
                                  key=all_keys[rng.randint(len(all_keys))],
                                  time=0))
            for _ in range(int(rng.randint(1, 40))):
                kind = list(_CHANNEL_SPECS)[rng.randint(len(_CHANNEL_SPECS))]
                fields = {}
                for fname in _CHANNEL_SPECS[kind][1]:
                    if fname == "pitch":
                        fields["pitch"] = int(rng.randint(-8192, 8192))
                    else:
                        fields[fname] = int(rng.randint(field_ranges[fname]))
                tr.append(Message(kind, channel=int(rng.randint(16)),
                                  time=int(rng.randint(0, 1 << 14)), **fields))
            tr.append(MetaMessage("end_of_track", time=0))
            mid.tracks.append(tr)
        path = str(tmp_path / f"fuzz_{case}.mid")
        mid.save(path)
        back = MidiFile(path)
        assert back.ticks_per_beat == mid.ticks_per_beat
        assert len(back.tracks) == len(mid.tracks)
        for ta, tb in zip(mid.tracks, back.tracks):
            assert len(tb) == len(ta)
            for ma, mb in zip(ta, tb):
                assert mb.type == ma.type and mb.time == ma.time
                if ma.type in _CHANNEL_SPECS:
                    assert mb.channel == ma.channel
                    for fname in _CHANNEL_SPECS[ma.type][1]:
                        assert getattr(mb, fname) == getattr(ma, fname), (
                            case, ma.type, fname)
                elif ma.type == "set_tempo":
                    assert mb.tempo == ma.tempo
                elif ma.type == "key_signature":
                    assert mb.key == ma.key
        # and re-encoding the parsed file is byte-stable
        path2 = str(tmp_path / f"fuzz_{case}_re.mid")
        back.save(path2)
        with open(path, "rb") as fa, open(path2, "rb") as fb:
            assert fa.read() == fb.read()
