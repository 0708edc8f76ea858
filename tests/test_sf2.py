"""SoundFont-2 sample-playback synthesis (music/sf2.py).

Builds a tiny fixture soundfont with ``build_sf2``, then checks the whole
chain the reference delegates to FluidSynth + FluidR3_GM
(`GAN_DES/matrix_sim_process.py:114-125`): parsing (hydra + sample data),
zone selection (key/vel ranges), sample-accurate onsets, pitch shifting
(rootkey-relative resampling), loop folding, the volume envelope
(sustain/decay/release), and the midi2audio facade dispatch.
"""

import numpy as np
import pytest

from gandes_tpu.music import sf2 as sf2mod
from gandes_tpu.music.midi import Message, MetaMessage, MidiFile, MidiTrack
from gandes_tpu.music.sf2 import (
    G_ATTACK_VOL,
    G_DECAY_VOL,
    G_HOLD_VOL,
    G_SAMPLE_MODES,
    G_SUSTAIN_VOL,
    Sf2Font,
    Sf2Synth,
    build_sf2,
)

SR = 44100


def _ramp_sample(n=2000):
    """Deterministic recognizable waveform: a ramp-modulated sine."""
    t = np.arange(n)
    return (0.5 * np.sin(2 * np.pi * t / 64.0) * (1.0 - t / (2 * n))).astype(np.float32)


@pytest.fixture(scope="module")
def fixture_font(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf2")
    path = str(d / "mini.sf2")
    looped = _ramp_sample(2000)
    oneshot = np.sin(2 * np.pi * np.arange(1200) / 32.0).astype(np.float32) * 0.4
    build_sf2(
        path,
        samples=[
            {"name": "looped", "data": looped, "sample_rate": SR,
             "original_pitch": 60, "loop_start": 500, "loop_end": 1500},
            {"name": "oneshot", "data": oneshot, "sample_rate": SR,
             "original_pitch": 72},
        ],
        instruments=[
            {"name": "keys", "zones": [
                # long hold + instant attack/decay -> env == 1 while held
                {"sample": 0, "key_lo": 0, "key_hi": 63, "gens": {
                    G_SAMPLE_MODES: 1, G_HOLD_VOL: 2786}},   # 2^(2786/1200) ~ 5 s
                {"sample": 1, "key_lo": 64, "key_hi": 127, "gens": {
                    G_HOLD_VOL: 2786}},
            ]},
        ],
        presets=[{"name": "piano", "program": 0, "zones": [{"instrument": 0}]}],
    )
    return path, looped, oneshot


def _midi(notes, program=0):
    """notes: list of (key, vel, on_s, off_s). One track, tempo 500000."""
    mid = MidiFile(type=0, ticks_per_beat=480)
    tr = MidiTrack()
    tr.append(MetaMessage("set_tempo", tempo=500000, time=0))
    events = []
    for key, vel, on, off in notes:
        events.append((on, Message("note_on", note=key, velocity=vel)))
        events.append((off, Message("note_off", note=key, velocity=0)))
    events.sort(key=lambda e: e[0])
    t_prev = 0.0
    for t, msg in events:
        msg.time = int(round((t - t_prev) * 960))  # 1 tick = 1/960 s
        tr.append(msg)
        t_prev = t_prev + msg.time / 960.0
    tr.append(MetaMessage("end_of_track", time=0))
    mid.tracks.append(tr)
    return mid


# ---------------------------------------------------------------- parsing


def test_parse_roundtrip(fixture_font):
    path, looped, oneshot = fixture_font
    font = Sf2Font(path)
    assert [s.name for s in font.samples] == ["looped", "oneshot"]
    s0 = font.samples[0]
    assert (s0.end - s0.start) == len(looped)
    assert (s0.loop_start - s0.start, s0.loop_end - s0.start) == (500, 1500)
    assert s0.sample_rate == SR and s0.original_pitch == 60
    got = font.bank[s0.start:s0.end]
    np.testing.assert_allclose(got, looped, atol=1.5 / 32768)
    assert len(font.instruments) == 1 and len(font.instruments[0].zones) == 2
    assert (0, 0) in font.presets
    z0, z1 = font.instruments[0].zones
    assert (z0.key_lo, z0.key_hi, z1.key_lo, z1.key_hi) == (0, 63, 64, 127)
    assert z0.gens[G_SAMPLE_MODES] == 1


def test_zone_selection_by_key(fixture_font):
    path, *_ = fixture_font
    font = Sf2Font(path)
    lo = font.select_voices(0, 60, 100)
    hi = font.select_voices(0, 72, 100)
    assert len(lo) == 1 and len(hi) == 1
    assert lo[0]["loop"] == 1 and hi[0]["loop"] == 0
    assert lo[0]["start"] != hi[0]["start"]


# ---------------------------------------------------------------- rendering


def test_sample_accurate_onset_and_content(fixture_font):
    """key == rootkey at the sample's own rate: the output IS the sample,
    starting exactly at round(on_s * sr)."""
    path, looped, _ = fixture_font
    synth = Sf2Synth(path)
    on_s = 0.25
    audio = synth.render_midi(_midi([(60, 127, on_s, on_s + 2.5)]), sr=SR)
    onset = int(round(on_s * SR))
    assert np.allclose(audio[:onset], 0.0)
    np.testing.assert_allclose(audio[onset:onset + 400], looped[:400],
                               atol=2e-4)


def test_pitch_shift_octave(fixture_font):
    """key = rootkey + 12 -> every second bank sample, exactly."""
    path, _, oneshot = fixture_font
    synth = Sf2Synth(path)
    audio = synth.render_midi(_midi([(84, 127, 0.0, 1.0)]), sr=SR)  # oneshot zone (root 72)
    np.testing.assert_allclose(audio[:300], oneshot[:600:2], atol=2e-4)


def test_loop_folding(fixture_font):
    """A held note longer than the sample loops over [loop_start, loop_end):
    consecutive loop passes are identical."""
    path, looped, _ = fixture_font
    synth = Sf2Synth(path)
    audio = synth.render_midi(_midi([(60, 127, 0.0, 3.5)]), sr=SR)
    span = 1000  # loop_end(1500) - loop_start(500)
    # pass k covers bank-rel [1500 + k*span) folded to [500, 1500)
    a = audio[1500:1500 + span]
    b = audio[1500 + span:1500 + 2 * span]
    np.testing.assert_allclose(a, b, atol=2e-4)
    # and both equal the loop segment of the source sample
    np.testing.assert_allclose(a, looped[500:1500], atol=2e-4)
    # one-shot zones go silent past the sample end instead of looping
    audio_hi = synth.render_midi(_midi([(72, 127, 0.0, 3.5)]), sr=SR)
    assert np.allclose(audio_hi[1300:], 0.0)


def test_envelope_sustain_decay_release(tmp_path):
    """decay ramps (linear-in-dB) to the sustain attenuation; release kills
    the voice within release_s of note_off."""
    path = str(tmp_path / "env.sf2")
    const = np.full(8000, 0.5, np.float32)
    build_sf2(
        path,
        samples=[{"name": "const", "data": const, "sample_rate": SR,
                  "original_pitch": 60, "loop_start": 100, "loop_end": 7900}],
        instruments=[{"name": "i", "zones": [{"sample": 0, "gens": {
            sf2mod.G_SAMPLE_MODES: 1,
            G_SUSTAIN_VOL: 200,            # -20 dB -> sustain amp 0.1
            G_DECAY_VOL: -1200,            # 0.5 s decay
            G_ATTACK_VOL: -12000,
            sf2mod.G_RELEASE_VOL: -2400,   # 0.25 s release (96 dB ramp)
        }}]}],
        presets=[{"name": "p", "program": 0, "zones": [{"instrument": 0}]}],
    )
    synth = Sf2Synth(path)
    off_s = 1.2
    audio = synth.render_midi(_midi([(60, 127, 0.0, off_s)]), sr=SR)
    peak = np.abs(audio[: SR // 50]).max()
    # mid-decay (0.25 s = halfway): attenuation -10 dB
    mid = np.abs(audio[int(0.24 * SR):int(0.26 * SR)]).max()
    assert mid == pytest.approx(peak * 10 ** (-10 / 20), rel=0.15)
    # sustained plateau at -20 dB
    sus = np.abs(audio[int(0.9 * SR):int(1.1 * SR)]).max()
    assert sus == pytest.approx(peak * 0.1, rel=0.1)
    # silent once the 0.25 s release has run its 96 dB course
    assert np.allclose(audio[int((off_s + 0.26) * SR):], 0.0)
    # release is decaying, not a hard gate
    r0 = np.abs(audio[int(off_s * SR):int((off_s + 0.04) * SR)]).max()
    r1 = np.abs(audio[int((off_s + 0.08) * SR):int((off_s + 0.12) * SR)]).max()
    assert 0 < r1 < r0 <= sus * 1.05


def test_velocity_maps_to_gain(fixture_font):
    path, *_ = fixture_font
    synth = Sf2Synth(path)
    loud = synth.render_midi(_midi([(60, 127, 0.0, 1.0)]), sr=SR)
    soft = synth.render_midi(_midi([(60, 64, 0.0, 1.0)]), sr=SR)
    ratio = np.abs(soft[:2000]).max() / np.abs(loud[:2000]).max()
    assert ratio == pytest.approx((64 / 127) ** 2, rel=0.05)


def _noise_font(path, filter_gens):
    """Broadband looped-noise font (flat-ish spectrum) for filter checks."""
    noise = np.random.RandomState(0).uniform(-0.5, 0.5, 8000).astype(np.float32)
    build_sf2(
        path,
        samples=[{"name": "noise", "data": noise, "sample_rate": SR,
                  "original_pitch": 60, "loop_start": 100, "loop_end": 7900}],
        instruments=[{"name": "n", "zones": [
            {"sample": 0, "gens": {G_SAMPLE_MODES: 1, G_HOLD_VOL: 2786,
                                   **filter_gens}}]}],
        presets=[{"name": "n", "program": 0, "zones": [{"instrument": 0}]}],
    )
    return path


def _band_energy(audio, lo_hz, hi_hz):
    spec = np.abs(np.fft.rfft(audio)) ** 2
    freqs = np.fft.rfftfreq(len(audio), 1.0 / SR)
    return spec[(freqs >= lo_hz) & (freqs < hi_hz)].mean()


def test_filter_cutoff_attenuates_highs(tmp_path):
    """initialFilterFc (gen 8): a 1.5 kHz low-pass kills the noise energy
    above ~4x the cutoff while leaving the sub-cutoff plateau in place
    (q_cb == 0 -> Butterworth-flat passband, no DC-gain drop)."""
    from gandes_tpu.music.sf2 import G_INITIAL_FILTER_FC

    fc_cents = int(round(1200 * np.log2(1500 / 8.176)))  # ~1.5 kHz
    open_path = _noise_font(str(tmp_path / "open.sf2"), {})
    lp_path = _noise_font(str(tmp_path / "lp.sf2"),
                          {G_INITIAL_FILTER_FC: fc_cents})
    mid = _midi([(60, 127, 0.05, 0.55)])
    a_open = Sf2Synth(open_path).render_midi(mid, sr=SR)
    a_lp = Sf2Synth(lp_path).render_midi(mid, sr=SR)
    steady = slice(int(0.1 * SR), int(0.5 * SR))
    hf = _band_energy(a_lp[steady], 6000, 15000) / \
        _band_energy(a_open[steady], 6000, 15000)
    lf = _band_energy(a_lp[steady], 100, 400) / \
        _band_energy(a_open[steady], 100, 400)
    assert hf < 0.05, f"highs not attenuated: {hf:.4f}"
    assert 0.7 < lf < 1.3, f"passband changed: {lf:.4f}"


def test_filter_resonance_peaks_at_cutoff(tmp_path):
    """initialFilterQ (gen 9): resonance lifts the band around fc well above
    the low-frequency plateau, and the spec's half-Q DC-gain drop scales the
    passband down."""
    from gandes_tpu.music.sf2 import G_INITIAL_FILTER_FC, G_INITIAL_FILTER_Q

    fc_cents = int(round(1200 * np.log2(1500 / 8.176)))
    open_path = _noise_font(str(tmp_path / "open.sf2"), {})
    res_path = _noise_font(
        str(tmp_path / "res.sf2"),
        {G_INITIAL_FILTER_FC: fc_cents, G_INITIAL_FILTER_Q: 240})  # 24 dB peak
    mid = _midi([(60, 127, 0.05, 0.55)])
    a_open = Sf2Synth(open_path).render_midi(mid, sr=SR)
    a_res = Sf2Synth(res_path).render_midi(mid, sr=SR)
    steady = slice(int(0.1 * SR), int(0.5 * SR))
    peak_band = _band_energy(a_res[steady], 1200, 1875)
    lf_band = _band_energy(a_res[steady], 100, 400)
    assert peak_band > 5.0 * lf_band, (peak_band, lf_band)
    # DC gain drops by q_cb/2 = 12 dB -> passband energy scales ~0.25^2
    lf = _band_energy(a_res[steady], 100, 400) / \
        _band_energy(a_open[steady], 100, 400)
    assert lf == pytest.approx(0.25 ** 2, rel=0.5)


def test_filter_w_bucket_independent(tmp_path):
    """The filtered render must not depend on the W window bucket (CPU
    sizes W to content, TPU uses a fixed bucket): the envelope folds in
    before the circular FFT and the env>0 gate after it, so W=2^16 and
    W=2^17 agree to float32 noise. This is the property that keeps CPU
    and TPU renders of the same font in agreement."""
    import jax.numpy as jnp

    from gandes_tpu.music.sf2 import G_INITIAL_FILTER_FC, _F, _voice_bucket

    fc_cents = int(round(1200 * np.log2(1500 / 8.176)))
    path = _noise_font(str(tmp_path / "lp.sf2"),
                       {G_INITIAL_FILTER_FC: fc_cents})
    synth = Sf2Synth(path)
    cols, nv, _ = synth.midi_to_voices(_midi([(60, 127, 0.05, 0.55)]), SR)
    E = _voice_bucket(nv)
    packed = np.zeros((len(_F), E), dtype=np.float32)
    for i, k in enumerate(_F):
        packed[i, :nv] = cols[k][:nv]
    start_i = np.zeros(E, dtype=np.int32)
    start_i[:nv] = cols["start_i"][:nv]
    outs = [
        np.asarray(sf2mod._render_sf2(synth.bank, jnp.asarray(packed),
                                      jnp.asarray(start_i),
                                      jnp.zeros(1, jnp.float32),
                                      1 << 16, W, SR,
                                      use_filter=True))
        for W in (1 << 16, 1 << 17)
    ]
    assert np.abs(outs[0]).max() > 0.01  # non-trivial audio
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)


def test_filter_defaults_bypass(fixture_font):
    """Fonts that don't set gens 8/9 resolve to fc_hz == 0 (bypass) so the
    render skips the FFT path entirely."""
    path, *_ = fixture_font
    for vp in Sf2Font(path).select_voices(0, 60, 100):
        assert vp["fc_hz"] == 0.0 and vp["q_lin"] == pytest.approx(2 ** -0.5)


def test_global_zone_ranges_are_zone_defaults(tmp_path):
    """Spec 7.3/7.7: global-zone generators (incl. keyRange/velRange) are
    defaults for zones that don't set their own; a zone's own range
    overrides."""
    path = str(tmp_path / "g.sf2")
    data = _ramp_sample(1200)
    build_sf2(
        path,
        samples=[{"name": "s", "data": data, "sample_rate": SR,
                  "original_pitch": 60}],
        instruments=[{"name": "i", "zones": [
            {"key_lo": 40, "key_hi": 80, "vel_lo": 20, "vel_hi": 100},  # GLOBAL
            {"sample": 0},                                # inherits 40-80/20-100
            {"sample": 0, "key_lo": 90, "key_hi": 127},   # own key range wins
        ]}],
        presets=[{"name": "p", "program": 0, "zones": [{"instrument": 0}]}],
    )
    font = Sf2Font(path)
    assert len(font.select_voices(0, 30, 64)) == 0      # below global range
    assert len(font.select_voices(0, 60, 64)) == 1      # inherited range
    assert len(font.select_voices(0, 60, 10)) == 0      # inherited vel range
    assert len(font.select_voices(0, 100, 64)) == 1     # override zone only


def test_missing_sound_font_fails_loudly(tmp_path):
    """A typo'd --sound-font path must not silently train/serve/eval on the
    additive timbre; only the reference's hardcoded default font name is
    allowed to be absent (sim_to_wav's signature default)."""
    from gandes_tpu.music.synth import FluidSynth, render_midi

    with pytest.raises(FileNotFoundError, match="typo"):
        FluidSynth(str(tmp_path / "typo.sf2"))
    with pytest.raises(FileNotFoundError):
        render_midi(_midi([(60, 100, 0.0, 0.2)]),
                    sound_font=str(tmp_path / "nope.sf2"))
    fs = FluidSynth(str(tmp_path / "FluidR3_GM.sf2"))  # absent default: additive
    assert fs._sf2 is None


def test_polyphony_sums(fixture_font):
    path, *_ = fixture_font
    synth = Sf2Synth(path)
    a = synth.render_midi(_midi([(60, 100, 0.0, 1.0)]), sr=SR)
    b = synth.render_midi(_midi([(67, 100, 0.5, 1.5)]), sr=SR)
    ab = synth.render_midi(_midi([(60, 100, 0.0, 1.0), (67, 100, 0.5, 1.5)]), sr=SR)
    n = min(len(a), len(b), len(ab))
    np.testing.assert_allclose(ab[:n], (a[:n] + b[:n]), atol=3e-4)


# ---------------------------------------------------------------- facade


def test_fluidsynth_facade_dispatch(fixture_font, tmp_path):
    """With a real .sf2 the facade renders by sample playback; without one
    it falls back to the additive model — same API both ways
    (reference: midi2audio FluidSynth('FluidR3_GM.sf2'))."""
    from gandes_tpu.data.audio import load_wav
    from gandes_tpu.music.synth import FluidSynth

    path, looped, _ = fixture_font
    mid = _midi([(60, 127, 0.1, 1.0)])
    midi_path = str(tmp_path / "scale.mid")
    mid.save(midi_path)

    sf_wav = str(tmp_path / "sf.wav")
    FluidSynth(path, sample_rate=SR).midi_to_audio(midi_path, sf_wav)
    audio, sr = load_wav(sf_wav)
    assert sr == SR
    onset = int(round(0.1 * SR))
    np.testing.assert_allclose(audio[onset:onset + 200], looped[:200], atol=2e-3)

    add_wav = str(tmp_path / "add.wav")
    FluidSynth(None, sample_rate=SR).midi_to_audio(midi_path, add_wav)
    audio2, _ = load_wav(add_wav)
    n = min(len(audio), len(audio2))
    assert not np.allclose(audio[:n], audio2[:n], atol=1e-3)


def test_gandes_pipeline_with_soundfont(fixture_font, tmp_path, monkeypatch):
    """matrix_to_wav with sound_font= renders the WAV by sample playback
    (reference: GAN_DES/matrix_sim_process.py:114-125 via FluidR3_GM)."""
    from gandes_tpu.bridge.gandes_decode import matrix_to_wav
    from gandes_tpu.data.audio import load_wav

    path, *_ = fixture_font
    monkeypatch.chdir(tmp_path)
    (tmp_path / "logs").mkdir()
    rng = np.random.RandomState(0)
    mats = rng.rand(1, 20, 20).astype(np.float32)
    np.random.seed(3)
    specs = matrix_to_wav(mats, size=20, start=0, end=216, sound_font=path)
    assert specs.shape == (1, 128, 216)
    np.random.seed(3)
    specs2 = matrix_to_wav(mats, size=20, start=0, end=216)  # additive
    assert not np.allclose(np.asarray(specs), np.asarray(specs2), atol=1e-3)
    wav, sr = load_wav(str(tmp_path / "adj_sim_outputs/wav/output_0.wav"))
    assert len(wav) > 0


def test_gm_scale_font_many_presets_velocity_layers_stereo(tmp_path):
    """A GM-shaped font: 16 programs, velocity-layered zones, stereo
    sample pairs (two zones matching the same key) — the structures
    FluidR3_GM actually uses. Parser + zone selection must scale and pick
    exactly the right zones."""
    path = str(tmp_path / "gm.sf2")
    rng = np.random.RandomState(0)
    n_prog = 16
    samples, instruments, presets = [], [], []
    for p in range(n_prog):
        base = rng.randn(400).astype(np.float32) * 0.2
        samples += [
            {"name": f"p{p}L", "data": base, "sample_rate": SR,
             "original_pitch": 60},
            {"name": f"p{p}R", "data": -base, "sample_rate": SR,
             "original_pitch": 60},
            {"name": f"p{p}loud", "data": base * 2, "sample_rate": SR,
             "original_pitch": 60},
        ]
        instruments.append({"name": f"inst{p}", "zones": [
            # soft layer: stereo pair (both zones match the key)
            {"sample": 3 * p, "vel_lo": 0, "vel_hi": 80},
            {"sample": 3 * p + 1, "vel_lo": 0, "vel_hi": 80},
            # loud layer: single sample
            {"sample": 3 * p + 2, "vel_lo": 81, "vel_hi": 127},
        ]})
        presets.append({"name": f"prog{p}", "program": p,
                        "zones": [{"instrument": p}]})
    build_sf2(path, samples=samples, instruments=instruments, presets=presets)

    font = Sf2Font(path)
    assert len(font.presets) == n_prog and len(font.samples) == 3 * n_prog
    for p in (0, 7, 15):
        soft = font.select_voices(p, 60, 50)
        loud = font.select_voices(p, 60, 120)
        assert len(soft) == 2 and len(loud) == 1          # stereo vs single
        starts = {v["start"] for v in soft}
        assert font.samples[3 * p].start in starts
        assert font.samples[3 * p + 1].start in starts
        assert loud[0]["start"] == font.samples[3 * p + 2].start
    # unknown program falls back to SOME preset rather than silence
    assert font.select_voices(99, 60, 100)


def test_malformed_sf2_fails_cleanly(tmp_path):
    """Users plug in arbitrary .sf2 files; corrupt ones must raise one
    clean ValueError naming the file, never a deep IndexError/KeyError."""
    import struct

    from gandes_tpu.music.sf2 import Sf2Font, build_sf2

    # not a soundfont at all
    p = tmp_path / "bogus.sf2"
    p.write_bytes(b"not a riff file at all, just junk bytes" * 4)
    with pytest.raises(ValueError, match="not a SoundFont"):
        Sf2Font(str(p))

    # a valid font, then truncated mid-hydra: required chunks go missing
    good = tmp_path / "good.sf2"
    t = np.arange(2000) / 44100.0
    build_sf2(str(good),
              samples=[dict(name="s", data=np.sin(2 * np.pi * 440 * t),
                            sample_rate=44100, original_pitch=69,
                            loop_start=100, loop_end=1900)],
              instruments=[dict(name="i", zones=[dict(sample=0, gens={})])],
              presets=[dict(name="p", program=0, bank=0,
                            zones=[dict(instrument=0)])])
    data = good.read_bytes()
    Sf2Font(str(good))  # sanity: the untruncated font parses
    trunc = tmp_path / "trunc.sf2"
    trunc.write_bytes(data[: len(data) // 2])
    with pytest.raises(ValueError, match="missing required SF2 chunk"):
        Sf2Font(str(trunc))

    # corrupt hydra: a pbag zone spanning gen records [0, 60000) walks far
    # past the real pgen table
    pos = data.index(b"pbag")
    (size,) = struct.unpack_from("<I", data, pos + 4)
    bad = bytearray(data)
    recs = struct.pack("<HH", 0, 0) + struct.pack("<HH", 60000, 0) * (size // 4 - 1)
    bad[pos + 8:pos + 8 + size] = recs[:size]
    badf = tmp_path / "badbag.sf2"
    badf.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="malformed SF2 hydra"):
        Sf2Font(str(badf))


def test_fixed_bucket_capacity_keeps_trailing_voices(fixture_font, monkeypatch):
    """Regression: the fixed-bucket (accelerator) path used E = max_voices
    verbatim; _render_sf2 walks E // EVENT_BLOCK whole blocks, so a
    capacity that wasn't a multiple of EVENT_BLOCK silently dropped the
    trailing voices (e.g. voice 33 of 33 at max_voices=33). Capacities now
    round up to whole blocks; fixed- and dynamic-bucket renders of a
    33-voice piece must agree."""
    path, _, _ = fixture_font
    assert sf2mod._voice_bucket(1) == sf2mod.EVENT_BLOCK
    assert sf2mod._voice_bucket(32) == 32
    assert sf2mod._voice_bucket(33) == 64
    assert sf2mod._voice_bucket(100) == 128

    n = sf2mod.EVENT_BLOCK + 1  # one voice past a whole block
    notes = [(40 + i % 20, 100, 0.01 * i, 0.01 * i + 0.3) for i in range(n)]
    synth = Sf2Synth(path)
    ref = synth.render_midi(_midi(notes), sr=SR, max_voices=n)

    monkeypatch.setattr(sf2mod, "_dynamic_buckets", lambda: False)
    fixed = synth.render_midi(_midi(notes), sr=SR, max_voices=n)
    m = min(len(ref), len(fixed))
    np.testing.assert_allclose(fixed[:m], ref[:m], atol=1e-5)
    # and the raw kernel refuses ragged capacities outright
    with pytest.raises(ValueError, match="multiple of"):
        sf2mod._render_sf2(synth.bank, np.zeros((len(sf2mod._F), 33), np.float32),
                           np.zeros(33, np.int32), np.zeros(1, np.float32),
                           1 << 15, 1 << 10, SR)


# ------------------------------------------------------------- LFOs / pan


def _sine_font(path, extra_gens, f0=441.0, seconds=1.0):
    """One continuously-looped pure sine (whole cycles, so the loop fold is
    seamless) under a flat envelope — the cleanest carrier for measuring
    pitch/volume modulation."""
    from gandes_tpu.music.sf2 import G_HOLD_VOL as HOLD, G_SAMPLE_MODES as MODES

    n = int(SR * seconds)
    data = (0.5 * np.sin(2 * np.pi * f0 * np.arange(n) / SR)).astype(np.float32)
    gens = {MODES: 1, HOLD: 2786}  # ~5 s hold: env == 1 while held
    gens.update(extra_gens)
    build_sf2(path, samples=[{"name": "sine", "data": data, "sample_rate": SR,
                              "original_pitch": 60, "loop_start": 0,
                              "loop_end": n}],
              instruments=[{"name": "i", "zones": [{"sample": 0, "gens": gens}]}],
              presets=[{"name": "p", "program": 0, "zones": [{"instrument": 0}]}])
    return path


def _inst_freq(audio, sr):
    """Instantaneous frequency from the FFT analytic signal (Hz/sample)."""
    n = len(audio)
    X = np.fft.fft(audio)
    h = np.zeros(n)
    h[0] = 1.0
    h[1:n // 2] = 2.0
    h[n // 2] = 1.0
    analytic = np.fft.ifft(X * h)
    phase = np.unwrap(np.angle(analytic))
    return np.diff(phase) * sr / (2 * np.pi)


def _np_tri(u):
    p = np.mod(u, 1.0)
    return np.where(p < 0.25, 4 * p, np.where(p < 0.75, 2 - 4 * p, 4 * p - 4))


def test_vibrato_tracks_triangle_lfo(tmp_path):
    """vibLfoToPitch: instantaneous frequency follows f0 * (1 + k*tri(f*t))
    with k = cents*ln2/1200 (the renderer's documented linearization) and
    the triangle starting at zero rising (spec 8.1.2)."""
    from gandes_tpu.music.sf2 import G_FREQ_VIB_LFO, G_VIB_LFO_TO_PITCH

    f_lfo = 2.0
    freq_cents = int(round(1200 * np.log2(f_lfo / 8.176)))
    path = _sine_font(str(tmp_path / "vib.sf2"),
                      {G_VIB_LFO_TO_PITCH: 200, G_FREQ_VIB_LFO: freq_cents})
    audio = Sf2Synth(path).render_midi(_midi([(60, 127, 0.0, 2.2)]), sr=SR)

    finst = _inst_freq(audio[: int(2.0 * SR)], SR)
    k = 200 * np.log(2.0) / 1200.0
    # 10 ms moving average knocks down interpolation noise
    w = int(0.010 * SR)
    kern = np.ones(w) / w
    sm = np.convolve(finst, kern, mode="same")
    t = np.arange(len(sm)) / SR
    lo, hi = int(0.2 * SR), int(1.8 * SR)
    # the LFO frequency itself resolves within ~1% (8.176 * 2^(cents/1200))
    f_lfo_real = 8.176 * 2.0 ** (freq_cents / 1200.0)
    expected = 441.0 * (1.0 + k * _np_tri(f_lfo_real * t[lo:hi]))
    rel_err = np.abs(sm[lo:hi] / expected - 1.0)
    assert np.max(rel_err) < 0.02
    # and the modulation is real: +-11.5% swing, not a flat line
    assert sm[lo:hi].max() > 441 * 1.08 and sm[lo:hi].min() < 441 * 0.92


def test_vibrato_delay_gates_onset(tmp_path):
    """delayVibLFO: no pitch modulation before the delay elapses."""
    from gandes_tpu.music.sf2 import (G_DELAY_VIB_LFO, G_FREQ_VIB_LFO,
                                      G_VIB_LFO_TO_PITCH)

    freq_cents = int(round(1200 * np.log2(4.0 / 8.176)))
    path = _sine_font(str(tmp_path / "vibdelay.sf2"),
                      {G_VIB_LFO_TO_PITCH: 200, G_FREQ_VIB_LFO: freq_cents,
                       G_DELAY_VIB_LFO: 0})  # 0 timecents == 1.0 s
    audio = Sf2Synth(path).render_midi(_midi([(60, 127, 0.0, 2.2)]), sr=SR)
    finst = _inst_freq(audio[: int(2.0 * SR)], SR)
    w = int(0.010 * SR)
    sm = np.convolve(finst, np.ones(w) / w, mode="same")
    before = sm[int(0.2 * SR): int(0.9 * SR)]
    after = sm[int(1.1 * SR): int(1.9 * SR)]
    assert np.max(np.abs(before - 441.0)) < 2.0          # flat until 1 s
    assert after.max() > 441 * 1.08 and after.min() < 441 * 0.92


def test_tremolo_volume_oscillation(tmp_path):
    """modLfoToVolume: amplitude swings by the generator's centibels at the
    mod-LFO rate (peak/trough amplitude ratio = 10^(2*cb/200))."""
    from gandes_tpu.music.sf2 import G_FREQ_MOD_LFO, G_MOD_LFO_TO_VOL

    f_lfo_cents = int(round(1200 * np.log2(4.0 / 8.176)))
    path = _sine_font(str(tmp_path / "trem.sf2"),
                      {G_MOD_LFO_TO_VOL: 120, G_FREQ_MOD_LFO: f_lfo_cents})
    audio = Sf2Synth(path).render_midi(_midi([(60, 127, 0.0, 2.2)]), sr=SR)
    f_lfo = 8.176 * 2.0 ** (f_lfo_cents / 1200.0)

    def rms_at(t):
        c = int(t * SR)
        w = int(0.008 * SR)
        return float(np.sqrt(np.mean(audio[c - w:c + w] ** 2)))

    # triangle peaks at u=0.25 (+1) and u=0.75 (-1); average several periods
    peaks = [rms_at((0.25 + p) / f_lfo) for p in range(1, 7)]
    troughs = [rms_at((0.75 + p) / f_lfo) for p in range(1, 7)]
    ratio = np.mean(peaks) / np.mean(troughs)
    assert 10.0 < ratio < 25.0  # expected 10^1.2 ~ 15.8


def test_pan_mono_folddown(tmp_path):
    """pan (gen 17): a hard-panned leg folds into the mono render at
    1/sqrt(2) of the center-pan level (constant-power legs summed)."""
    from gandes_tpu.music.sf2 import G_PAN

    center = _sine_font(str(tmp_path / "center.sf2"), {})
    hard = _sine_font(str(tmp_path / "hard.sf2"), {G_PAN: 500})
    note = [(60, 127, 0.0, 1.0)]
    a_c = Sf2Synth(center).render_midi(_midi(note), sr=SR)
    a_h = Sf2Synth(hard).render_midi(_midi(note), sr=SR)
    seg = slice(int(0.1 * SR), int(0.9 * SR))
    ratio = np.sqrt(np.mean(a_h[seg] ** 2) / np.mean(a_c[seg] ** 2))
    assert abs(ratio - 1 / np.sqrt(2)) < 0.02


def test_zero_amount_lfo_gens_stay_on_prelfo_program(tmp_path):
    """LFO freq/delay generators without any amount (vib/mod pitch cents and
    mod volume all zero) must keep use_lfo False — the render is bitwise
    the pre-LFO program (the static-toggle contract, like use_filter)."""
    from gandes_tpu.music.sf2 import G_DELAY_MOD_LFO, G_FREQ_VIB_LFO

    plain = _sine_font(str(tmp_path / "plain.sf2"), {})
    freq_only = _sine_font(str(tmp_path / "freqonly.sf2"),
                           {G_FREQ_VIB_LFO: -1200, G_DELAY_MOD_LFO: -2400})
    note = [(60, 100, 0.0, 0.8)]
    a = Sf2Synth(plain).render_midi(_midi(note), sr=SR)
    b = Sf2Synth(freq_only).render_midi(_midi(note), sr=SR)
    assert np.array_equal(a, b)


def test_keynum_scales_vol_env_hold_and_decay(tmp_path):
    """keynumToVolEnvHold/Decay (gens 39/40): hold/decay stretch by
    2^(amt*(60-key)/1200) with amt in timecents PER KEYNUMBER — the
    key-scaled piano-decay idiom real GM fonts use. amt=100 tc/key means
    one octave below middle (key 48, +1200 tc) doubles, one above
    halves, key 60 unchanged."""
    from gandes_tpu.music.sf2 import (G_DECAY_VOL, G_HOLD_VOL,
                                      G_KEYNUM_TO_VOL_DECAY,
                                      G_KEYNUM_TO_VOL_HOLD)

    path = _sine_font(str(tmp_path / "keyscale.sf2"),
                      {G_HOLD_VOL: 0, G_DECAY_VOL: 0,   # 1.0 s each
                       G_KEYNUM_TO_VOL_HOLD: 100,
                       G_KEYNUM_TO_VOL_DECAY: 100})
    font = Sf2Font(path)
    v60 = font.select_voices(0, 60, 100)[0]
    v48 = font.select_voices(0, 48, 100)[0]
    v72 = font.select_voices(0, 72, 100)[0]
    assert abs(v60["hold_s"] - 1.0) < 1e-9 and abs(v60["decay_s"] - 1.0) < 1e-9
    assert abs(v48["hold_s"] - 2.0) < 1e-9 and abs(v48["decay_s"] - 2.0) < 1e-9
    assert abs(v72["hold_s"] - 0.5) < 1e-9 and abs(v72["decay_s"] - 0.5) < 1e-9


def test_keynum_scaling_applies_in_timecent_domain(tmp_path):
    """The key scaling adds TIMECENTS per spec 8.1.3 — an 'instant'
    -12000 default hold still stretches to 2^((-12000+100*60)/1200)
    ~= 31 ms at key 0 (scaling the clamped 0.0 seconds would drop it)."""
    from gandes_tpu.music.sf2 import (G_KEYNUM_TO_VOL_HOLD,
                                      G_SAMPLE_MODES)

    n = 2000
    data = (0.4 * np.sin(2 * np.pi * np.arange(n) / 64.0)).astype(np.float32)
    path = str(tmp_path / "tc.sf2")
    build_sf2(path, samples=[{"name": "s", "data": data, "sample_rate": SR,
                              "original_pitch": 60, "loop_start": 0,
                              "loop_end": n}],
              instruments=[{"name": "i", "zones": [{"sample": 0, "gens": {
                  G_SAMPLE_MODES: 1, G_KEYNUM_TO_VOL_HOLD: 100}}]}],
              presets=[{"name": "p", "program": 0,
                        "zones": [{"instrument": 0}]}])
    font = Sf2Font(path)
    assert font.select_voices(0, 60, 100)[0]["hold_s"] == 0.0  # instant
    v0 = font.select_voices(0, 0, 100)[0]
    assert abs(v0["hold_s"] - 2.0 ** ((-12000 + 6000) / 1200.0)) < 1e-9


def test_pitch_lfo_depth_clamps_to_monotone_regime(tmp_path):
    """vibLfoToPitch clamps to +-1200 cents: the linearized position ramp
    must stay monotone (|k| < 1) so the memoryless loop fold cannot
    oscillate across loop_end."""
    from gandes_tpu.music.sf2 import G_VIB_LFO_TO_PITCH

    path = _sine_font(str(tmp_path / "deep.sf2"),
                      {G_VIB_LFO_TO_PITCH: 12000})
    font = Sf2Font(path)
    v = font.select_voices(0, 60, 100)[0]
    assert abs(v["vib_k"] - 1200 * np.log(2.0) / 1200.0) < 1e-12  # k = ln2


def test_cubic_interpolation_default_and_passthrough(tmp_path):
    """Default interpolation is 4-point cubic (FluidSynth's default
    order). At integer phase (key == rootkey at the bank's own rate) the
    Catmull-Rom weights collapse to passthrough, so the output still
    reproduces the sample exactly; at fractional phase (pitch-shifted)
    cubic tracks a sine strictly better than linear."""
    f0 = 441.0
    path = _sine_font(str(tmp_path / "interp.sf2"), {}, f0=f0)
    note = [(60, 127, 0.0, 1.0)]
    cubic = Sf2Synth(path)                      # default
    linear = Sf2Synth(path, interp="linear")
    assert cubic.use_cubic and not linear.use_cubic

    a_c = cubic.render_midi(_midi(note), sr=SR)
    # integer phase: both interpolators are exact passthrough
    a_l = linear.render_midi(_midi(note), sr=SR)
    np.testing.assert_array_equal(a_c[:1000], a_l[:1000])

    # pitch-shift by a tritone (irrational-ish phase step): compare both
    # against the ideal resampled sine over a steady segment
    note_up = [(66, 127, 0.0, 1.0)]
    up_c = cubic.render_midi(_midi(note_up), sr=SR)
    up_l = linear.render_midi(_midi(note_up), sr=SR)
    ratio = 2.0 ** (6 / 12.0)
    t = np.arange(len(up_c)) / SR
    ideal = 0.5 * np.sin(2 * np.pi * f0 * ratio * t)
    seg = slice(int(0.1 * SR), int(0.8 * SR))
    err_c = np.sqrt(np.mean((up_c[seg] - ideal[seg]) ** 2))
    err_l = np.sqrt(np.mean((up_l[seg] - ideal[seg]) ** 2))
    assert err_c < err_l * 0.5  # cubic at least halves the resample error

    with pytest.raises(ValueError, match="interp"):
        Sf2Synth(path, interp="sinc")


# ---------------------------------------------- modulation envelope (25-32)


def test_menv_integral_matches_numeric():
    """The closed-form DAHDSR integral equals dense numeric integration of
    the spec envelope (linear attack, linear decay to S, linear release
    from the note-off value over R), including mid-attack note-offs and
    near-instant phases."""
    import jax.numpy as jnp

    from gandes_tpu.music.sf2 import _menv_integral

    t = np.linspace(0.0, 3.0, 60001)
    dt = t[1] - t[0]
    for A, H, D, S, R, dur in [
        (0.3, 0.1, 0.4, 0.4, 0.25, 1.2),   # full DAHDS then release
        (0.2, 0.0, 0.3, 0.0, 0.5, 0.15),   # note off mid-attack
        (1e-6, 0.2, 1e-6, 0.7, 0.3, 2.0),  # instant attack/decay
        (0.4, 0.3, 0.5, 1.0, 0.2, 0.6),    # sustain == 1 (no decay)
    ]:
        e = np.clip(t / max(A, 1e-6), 0, 1) \
            - (1 - S) * np.clip((t - A - H) / max(D, 1e-6), 0, 1)
        e_dur = (np.clip(dur / max(A, 1e-6), 0, 1)
                 - (1 - S) * np.clip((dur - A - H) / max(D, 1e-6), 0, 1))
        env = np.where(t <= dur, e,
                       np.clip(e_dur * (1.0 - (t - dur) / R), 0.0, None))
        i_num = np.cumsum(env) * dt
        i_cf = np.asarray(_menv_integral(
            jnp.asarray(t, jnp.float32), A, H, D, S, R, dur))
        np.testing.assert_allclose(i_cf, i_num, atol=3e-3)


def test_mod_env_pitch_tracks_dahdsr(tmp_path):
    """modEnvToPitch (gen 7): instantaneous frequency follows
    f0 * (1 + k*e(t)) — rising through the attack, holding at
    f0*(1 + k*S) in sustain, and falling back to f0 through the
    envelope's own release after note-off."""
    from gandes_tpu.music.sf2 import (G_ATTACK_MOD_ENV, G_DECAY_MOD_ENV,
                                      G_MOD_ENV_TO_PITCH, G_RELEASE_MOD_ENV,
                                      G_RELEASE_VOL, G_SUSTAIN_MOD_ENV)

    cents = 200
    k = cents * np.log(2.0) / 1200.0
    tc = lambda s: int(round(1200 * np.log2(s)))
    path = _sine_font(str(tmp_path / "menv.sf2"),
                      {G_MOD_ENV_TO_PITCH: cents,
                       G_ATTACK_MOD_ENV: tc(0.4), G_DECAY_MOD_ENV: tc(0.3),
                       G_SUSTAIN_MOD_ENV: 500,      # S = 0.5
                       G_RELEASE_MOD_ENV: tc(0.3),
                       G_RELEASE_VOL: 0})   # 1.0 s: audio alive past 1.8 s
    audio = Sf2Synth(path).render_midi(_midi([(60, 127, 0.0, 1.5)]), sr=SR,
                                       min_seconds=2.2)
    finst = _inst_freq(audio[: int(2.1 * SR)], SR)
    w = int(0.01 * SR)
    sm = np.convolve(finst, np.ones(w) / w, mode="same")

    def mean_f(a, b):
        return float(np.mean(sm[int(a * SR): int(b * SR)]))

    assert mean_f(0.05, 0.10) < mean_f(0.20, 0.25) < mean_f(0.36, 0.40)
    # peak right after the attack (hold is the ~1 ms default)
    assert mean_f(0.40, 0.43) > 441.0 * (1.0 + 0.90 * k)
    # sustain plateau at S = 0.5
    assert mean_f(1.0, 1.4) == pytest.approx(441.0 * (1.0 + 0.5 * k), rel=0.01)
    # the envelope's release (0.3 s from the 1.5 s note-off) returns the
    # pitch to ~f0 by its end, while the tone is still audible (the volume
    # release rides the MAX_RELEASE_S = 0.5 s cap, silent only past ~2 s)
    assert mean_f(1.55, 1.60) < mean_f(1.0, 1.4)  # release slides down
    assert mean_f(1.76, 1.80) == pytest.approx(441.0, rel=0.006)


def test_zero_amount_mod_env_stays_on_pre_program(tmp_path):
    """Envelope-shape generators without a pitch amount must not engage
    the mod-env path: bitwise equal to the base font's render."""
    from gandes_tpu.music.sf2 import (G_ATTACK_MOD_ENV, G_SUSTAIN_MOD_ENV)

    notes = [(60, 90, 0.0, 0.5)]
    base = Sf2Synth(_sine_font(str(tmp_path / "b.sf2"), {})).render_midi(
        _midi(notes), sr=SR)
    shaped = Sf2Synth(_sine_font(
        str(tmp_path / "s.sf2"),
        {G_ATTACK_MOD_ENV: -3000, G_SUSTAIN_MOD_ENV: 300})).render_midi(
        _midi(notes), sr=SR)
    np.testing.assert_array_equal(base, shaped)


# ------------------------------------------- filter sweeps (gens 10/11)


def test_filter_env_sweep_opens_highs(tmp_path):
    """modEnvToFilterFc (gen 11): a 500 Hz cutoff swept up 4 octaves by a
    0.5 s mod-env attack gates the high band early and opens it late,
    while the sub-cutoff band stays put."""
    from gandes_tpu.music.sf2 import (G_ATTACK_MOD_ENV,
                                      G_INITIAL_FILTER_FC,
                                      G_MOD_ENV_TO_FILTER_FC)

    fc_cents = int(round(1200 * np.log2(500 / 8.176)))
    atk = int(round(1200 * np.log2(0.5)))
    path = _noise_font(str(tmp_path / "sweep.sf2"),
                       {G_INITIAL_FILTER_FC: fc_cents,
                        G_MOD_ENV_TO_FILTER_FC: 4800,
                        G_ATTACK_MOD_ENV: atk})
    audio = Sf2Synth(path).render_midi(_midi([(60, 127, 0.0, 1.2)]), sr=SR,
                                       min_seconds=1.3)
    early = audio[int(0.02 * SR): int(0.12 * SR)]
    late = audio[int(0.80 * SR): int(1.10 * SR)]
    hi_ratio = _band_energy(late, 3000, 6000) / _band_energy(early, 3000, 6000)
    lo_ratio = _band_energy(late, 100, 400) / _band_energy(early, 100, 400)
    assert hi_ratio > 5.0          # the sweep opened the high band
    assert 0.25 < lo_ratio < 4.0   # the passband didn't move with it


def test_filter_lfo_wah(tmp_path):
    """modLfoToFilterFc (gen 10): the cutoff tracks the triangle LFO —
    the 2-5 kHz band breathes at the LFO rate (open at tri = +1, shut at
    tri = -1)."""
    from gandes_tpu.music.sf2 import (G_FREQ_MOD_LFO, G_INITIAL_FILTER_FC,
                                      G_MOD_LFO_TO_FILTER_FC)

    fc_cents = int(round(1200 * np.log2(800 / 8.176)))
    f_lfo_cents = int(round(1200 * np.log2(2.0 / 8.176)))
    path = _noise_font(str(tmp_path / "wah.sf2"),
                       {G_INITIAL_FILTER_FC: fc_cents,
                        G_MOD_LFO_TO_FILTER_FC: 3600,
                        G_FREQ_MOD_LFO: f_lfo_cents})
    audio = Sf2Synth(path).render_midi(_midi([(60, 127, 0.0, 2.3)]), sr=SR)
    f_lfo = 8.176 * 2.0 ** (f_lfo_cents / 1200.0)

    def hi_energy_at(t):
        c = int(t * SR)
        w = int(0.04 * SR)
        return _band_energy(audio[c - w: c + w], 2000, 5000)

    peaks = [hi_energy_at((0.25 + p) / f_lfo) for p in range(1, 4)]
    troughs = [hi_energy_at((0.75 + p) / f_lfo) for p in range(1, 4)]
    assert np.mean(peaks) / np.mean(troughs) > 10.0


def test_filter_sweep_small_dynamic_window(tmp_path):
    """Low sample rates shrink the CPU path's dynamic W bucket below the
    2048-sample frame; the frame must shrink with it (W stays a whole
    number of hops) instead of failing the block reshape."""
    from gandes_tpu.music.sf2 import (G_ATTACK_MOD_ENV,
                                      G_INITIAL_FILTER_FC,
                                      G_MOD_ENV_TO_FILTER_FC)

    fc_cents = int(round(1200 * np.log2(400 / 8.176)))
    path = _noise_font(str(tmp_path / "lowsr.sf2"),
                       {G_INITIAL_FILTER_FC: fc_cents,
                        G_MOD_ENV_TO_FILTER_FC: 2400,
                        G_ATTACK_MOD_ENV: -1200})
    audio = Sf2Synth(path).render_midi(_midi([(60, 100, 0.0, 0.2)]), sr=1000)
    assert np.abs(audio).max() > 0.01


def test_zero_amount_filter_sweep_stays_on_static_program(tmp_path):
    """Sweep generators with zero amount must not engage the STFT path:
    bitwise equal to the static-filter render."""
    from gandes_tpu.music.sf2 import (G_INITIAL_FILTER_FC,
                                      G_MOD_ENV_TO_FILTER_FC,
                                      G_MOD_LFO_TO_FILTER_FC)

    fc_cents = int(round(1200 * np.log2(1500 / 8.176)))
    base = _noise_font(str(tmp_path / "b.sf2"), {G_INITIAL_FILTER_FC: fc_cents})
    zero = _noise_font(str(tmp_path / "z.sf2"),
                       {G_INITIAL_FILTER_FC: fc_cents,
                        G_MOD_ENV_TO_FILTER_FC: 0,
                        G_MOD_LFO_TO_FILTER_FC: 0})
    notes = [(60, 100, 0.0, 0.4)]
    a = Sf2Synth(base).render_midi(_midi(notes), sr=SR)
    b = Sf2Synth(zero).render_midi(_midi(notes), sr=SR)
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------- effects sends (15/16)


def test_reverb_send_adds_decaying_tail(tmp_path):
    """reverbEffectsSend (gen 16): a sent voice leaves a reverb tail after
    the dry sound is fully gone (note off + release cap), and that tail
    decays; a sendless font's render is silent there."""
    from gandes_tpu.music.sf2 import MAX_RELEASE_S, G_REVERB_SEND

    notes = [(60, 100, 0.0, 0.25)]
    dry = Sf2Synth(_sine_font(str(tmp_path / "d.sf2"), {})).render_midi(
        _midi(notes), sr=SR, min_seconds=2.0)
    wet = Sf2Synth(_sine_font(str(tmp_path / "w.sf2"),
                              {G_REVERB_SEND: 1000})).render_midi(
        _midi(notes), sr=SR, min_seconds=2.0)
    t0 = int((0.25 + MAX_RELEASE_S + 0.05) * SR)  # past any dry content
    assert np.abs(dry[t0:]).max() < 1e-6
    w = int(0.2 * SR)
    rms = [float(np.sqrt(np.mean(wet[t0 + i * w: t0 + (i + 1) * w] ** 2)))
           for i in range(4)]
    assert rms[0] > 1e-4  # audible tail where the dry render is silent
    assert rms[0] > rms[1] > rms[2] > rms[3]  # and it decays


def test_reverb_ir_dc_gain_closed_form():
    """Pin the IR construction against the network's closed-form DC gain
    (independent of the device==host convolution check, which would agree
    with a wrong IR): each comb has H(1) = 1/(1-feedback) regardless of
    damping, each Freeverb all-pass has H(1) = g/(1-g) = 1 at g = 0.5 —
    a DC null here would mean the all-pass dropped its (1+g) delayed-input
    term — so sum(ir) = (wet1+wet2)/2 * 2 sides * 8 combs * fixed_gain
    / (1 - feedback)."""
    from gandes_tpu.music import sf2 as m

    ir = m._freeverb_ir(SR)
    feedback = m._REVERB_ROOMSIZE * 0.28 + 0.7
    wet = m._REVERB_LEVEL * 3.0
    wet_mono = (wet * (m._REVERB_WIDTH / 2.0 + 0.5)
                + wet * ((1.0 - m._REVERB_WIDTH) / 2.0)) / 2.0
    expect = wet_mono * 2 * 8 * m._REVERB_FIXED_GAIN / (1.0 - feedback)
    assert float(np.sum(ir)) == pytest.approx(expect, rel=0.02)


def test_reverb_equals_host_ir_convolution(tmp_path):
    """The wet render is exactly dry + (send-weighted bus) * Freeverb IR:
    pin the device FFT convolution against scipy's on the host-cached IR."""
    from scipy.signal import fftconvolve

    from gandes_tpu.music.sf2 import G_REVERB_SEND, _freeverb_ir

    notes = [(60, 80, 0.0, 0.3)]
    dry = Sf2Synth(_sine_font(str(tmp_path / "d.sf2"), {})).render_midi(
        _midi(notes), sr=SR, min_seconds=2.0)
    send = 500  # 50%: the bus is half the voice signal
    wet = Sf2Synth(_sine_font(str(tmp_path / "w.sf2"),
                              {G_REVERB_SEND: send})).render_midi(
        _midi(notes), sr=SR, min_seconds=2.0)
    ir = _freeverb_ir(SR).astype(np.float64)
    # the wet render's crop is extended by the IR length so a note ending
    # near the piece end keeps its full ring-out — compare over that length
    # (the dry signal is silent well before 2.0 s, so zero-padding it is
    # exact)
    assert len(wet) > len(dry)
    dry_pad = np.concatenate([dry, np.zeros(len(wet) - len(dry))])
    expect = dry_pad + fftconvolve(dry * (send / 1000.0), ir)[: len(wet)]
    np.testing.assert_allclose(wet, expect, atol=2e-4)


def test_chorus_equals_host_mirror(tmp_path):
    """chorusEffectsSend (gen 15): the chorus is the documented 3-voice
    sine-modulated delay at FluidSynth's default speed/depth/level —
    replicated sample-for-sample on the host."""
    from gandes_tpu.music import sf2 as m
    from gandes_tpu.music.sf2 import G_CHORUS_SEND

    notes = [(60, 80, 0.0, 0.4)]
    dry = Sf2Synth(_sine_font(str(tmp_path / "d.sf2"), {})).render_midi(
        _midi(notes), sr=SR, min_seconds=1.0)
    wet = Sf2Synth(_sine_font(str(tmp_path / "c.sf2"),
                              {G_CHORUS_SEND: 1000})).render_midi(
        _midi(notes), sr=SR, min_seconds=1.0)
    L = len(dry)
    t = np.arange(L, dtype=np.float64)
    depth = m._CHORUS_DEPTH_MS * 1e-3 * SR
    acc = np.zeros(L)
    for k in range(m._CHORUS_N):
        d = 0.5 * depth * (1.0 + np.sin(
            2.0 * np.pi * (m._CHORUS_SPEED_HZ * t / SR + k / m._CHORUS_N)))
        pos = t - d
        p0 = np.floor(pos)
        frac = pos - p0
        g = lambda p: np.where(
            p >= 0.0, dry[np.clip(p, 0.0, L - 1).astype(np.int64)], 0.0)
        acc += g(p0) * (1.0 - frac) + g(p0 + 1.0) * frac
    expect = dry + m._CHORUS_LEVEL * acc / m._CHORUS_N
    np.testing.assert_allclose(wet, expect, atol=2e-3)
    # the modulated copies genuinely change the signal
    assert np.abs(wet - dry).max() > 0.01


def test_zero_send_gens_stay_on_no_fx_program(tmp_path):
    """Explicit zero sends must not engage the effects path: bitwise equal
    to the base font's render (same no-effects executable)."""
    from gandes_tpu.music.sf2 import G_CHORUS_SEND, G_REVERB_SEND

    notes = [(60, 90, 0.0, 0.3)]
    base = Sf2Synth(_sine_font(str(tmp_path / "b.sf2"), {})).render_midi(
        _midi(notes), sr=SR)
    zero = Sf2Synth(_sine_font(str(tmp_path / "z.sf2"),
                               {G_REVERB_SEND: 0, G_CHORUS_SEND: 0})
                    ).render_midi(_midi(notes), sr=SR)
    np.testing.assert_array_equal(base, zero)


@pytest.mark.parametrize("fuzz_seed", range(8))
def test_sf2_random_font_render_fuzz(tmp_path, fuzz_seed):
    """Random fonts across the whole generator matrix (envelopes, LFOs,
    mod env, static + swept filter, pan, sends, loop modes, tunings) with
    random polyphonic MIDI: every combination must render finite,
    peak-bounded audio — interaction bugs surface as NaN/Inf or silence
    where a voice was selected."""
    from gandes_tpu.music import sf2 as m

    rng = np.random.RandomState(1000 + fuzz_seed)
    n = int(rng.randint(800, 6000))
    wave_kind = rng.randint(3)
    tt = np.arange(n)
    data = (0.5 * np.sin(2 * np.pi * tt / rng.randint(20, 200)) if wave_kind == 0
            else rng.uniform(-0.5, 0.5, n) if wave_kind == 1
            else 0.4 * ((tt % 64) / 32.0 - 1.0)).astype(np.float32)
    gens = {m.G_SAMPLE_MODES: int(rng.randint(0, 2)),
            m.G_HOLD_VOL: int(rng.randint(-4000, 3000)),
            m.G_ATTACK_VOL: int(rng.randint(-12000, -1000)),
            m.G_DECAY_VOL: int(rng.randint(-4000, 2000)),
            m.G_SUSTAIN_VOL: int(rng.randint(0, 800)),
            m.G_RELEASE_VOL: int(rng.randint(-6000, 0)),
            m.G_PAN: int(rng.randint(-500, 501)),
            m.G_COARSE_TUNE: int(rng.randint(-4, 5)),
            m.G_FINE_TUNE: int(rng.randint(-99, 100)),
            m.G_INITIAL_ATT: int(rng.randint(0, 300))}
    if rng.rand() < 0.6:
        gens[m.G_INITIAL_FILTER_FC] = int(rng.randint(1200, 15000))
        gens[m.G_INITIAL_FILTER_Q] = int(rng.randint(0, 960))
    if rng.rand() < 0.5:
        gens[m.G_VIB_LFO_TO_PITCH] = int(rng.randint(-400, 401))
        gens[m.G_FREQ_VIB_LFO] = int(rng.randint(-3000, 2000))
    if rng.rand() < 0.5:
        gens[m.G_MOD_LFO_TO_VOL] = int(rng.randint(-300, 301))
        gens[m.G_MOD_LFO_TO_PITCH] = int(rng.randint(-400, 401))
        gens[m.G_FREQ_MOD_LFO] = int(rng.randint(-3000, 2000))
    if rng.rand() < 0.5:
        gens[m.G_MOD_ENV_TO_PITCH] = int(rng.randint(-1500, 1500))
        gens[m.G_ATTACK_MOD_ENV] = int(rng.randint(-8000, 0))
        gens[m.G_DECAY_MOD_ENV] = int(rng.randint(-8000, 0))
        gens[m.G_SUSTAIN_MOD_ENV] = int(rng.randint(0, 1000))
        gens[m.G_RELEASE_MOD_ENV] = int(rng.randint(-8000, 0))
    if rng.rand() < 0.4:
        gens[m.G_MOD_ENV_TO_FILTER_FC] = int(rng.randint(-6000, 6000))
        gens[m.G_MOD_LFO_TO_FILTER_FC] = int(rng.randint(-4000, 4000))
    if rng.rand() < 0.5:
        gens[m.G_REVERB_SEND] = int(rng.randint(0, 1001))
        gens[m.G_CHORUS_SEND] = int(rng.randint(0, 1001))
    if rng.rand() < 0.3:
        gens[m.G_EXCLUSIVE_CLASS] = 1
    if rng.rand() < 0.2:
        gens[m.G_KEYNUM] = int(rng.randint(0, 128))
    if rng.rand() < 0.2:
        # floor 32 keeps the end-of-test "actually sounded" floor honest
        # under the worst random att/tremolo stack
        gens[m.G_VELOCITY] = int(rng.randint(32, 128))
    mods = []
    if rng.rand() < 0.6:
        # random custom modulators over the modulatable destinations: any
        # source shape x any live/initialized source index
        dests = sorted(m._MODULATABLE)
        for _ in range(rng.randint(1, 4)):
            src = (int(rng.choice([0, 2, 3, 14, 0x80 | 7, 0x80 | 11]))
                   | (int(rng.randint(0, 4)) << 10)
                   | (int(rng.randint(0, 2)) << 8) | (int(rng.randint(0, 2)) << 9))
            amt_src = int(rng.choice([0, 2, 0x80 | 10]))
            mods.append((src, int(rng.choice(dests)),
                         int(rng.randint(-1000, 1001)), amt_src,
                         int(rng.choice([0, 2]))))
    path = str(tmp_path / "fuzz.sf2")
    build_sf2(path, samples=[{"name": "s", "data": data, "sample_rate": SR,
                              "original_pitch": int(rng.randint(40, 80)),
                              "loop_start": int(rng.randint(0, n // 4)),
                              "loop_end": int(rng.randint(n // 2, n))}],
              instruments=[{"name": "i", "zones": [
                  {"sample": 0, "gens": gens, "mods": mods}]}],
              presets=[{"name": "p", "program": 0, "zones": [{"instrument": 0}]}])
    notes = [(int(rng.randint(30, 100)), int(rng.randint(20, 128)),
              float(rng.uniform(0, 1.0)), 0.0) for _ in range(rng.randint(1, 6))]
    notes = [(k, v, on, on + float(rng.uniform(0.05, 1.5))) for k, v, on, _ in notes]
    audio = Sf2Synth(path).render_midi(_midi(notes), sr=SR, min_seconds=2.0)
    assert np.all(np.isfinite(audio))
    assert np.abs(audio).max() <= 1.0 + 1e-6
    assert np.abs(audio).max() > 1e-5  # the selected voices actually sounded


def test_sf2_compiled_on_tpu_matches_cpu(tmp_path):
    """Compiled-kernel check on real TPU hardware: the fixed-bucket device
    render (cubic + LFO + filter paths all engaged) must agree with this
    process's CPU render of the same piece. Auto-skips without a TPU; a
    degraded relay window skips rather than failing (CLAUDE.md)."""
    import os
    import subprocess
    import sys

    from gandes_tpu.music.sf2 import (G_ATTACK_MOD_ENV, G_CHORUS_SEND,
                                      G_FREQ_VIB_LFO, G_HOLD_VOL,
                                      G_INITIAL_FILTER_FC,
                                      G_MOD_ENV_TO_FILTER_FC,
                                      G_MOD_ENV_TO_PITCH, G_REVERB_SEND,
                                      G_SAMPLE_MODES, G_VIB_LFO_TO_PITCH)

    fc = int(round(1200 * np.log2(3000 / 8.176)))
    path = _sine_font(str(tmp_path / "tpu.sf2"),
                      {G_VIB_LFO_TO_PITCH: 100, G_FREQ_VIB_LFO: -1200,
                       G_INITIAL_FILTER_FC: fc,
                       G_REVERB_SEND: 300, G_CHORUS_SEND: 200,
                       G_MOD_ENV_TO_PITCH: 50, G_ATTACK_MOD_ENV: -1200})
    # a second font on the OTHER filter program (swept -> block-wise STFT)
    path2 = _sine_font(str(tmp_path / "tpu2.sf2"),
                       {G_INITIAL_FILTER_FC: fc, G_MOD_ENV_TO_FILTER_FC: 1200,
                        G_ATTACK_MOD_ENV: -1200})
    notes = [(64, 110, 0.0, 1.25), (60, 90, 0.4, 1.0)]
    mid_path = str(tmp_path / "piece.mid")
    _midi(notes).save(mid_path)
    ref = Sf2Synth(path).render_midi(_midi(notes), sr=SR)
    np.save(str(tmp_path / "ref.npy"), ref)
    ref2 = Sf2Synth(path2).render_midi(_midi(notes), sr=SR)
    np.save(str(tmp_path / "ref2.npy"), ref2)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, env.get("PYTHONPATH", "")] if p
    )
    body = (
        "import jax\n"
        "if jax.devices()[0].platform == 'cpu':\n"
        "    print('NO_TPU'); raise SystemExit(0)\n"
        "import numpy as np\n"
        "from gandes_tpu.music.sf2 import Sf2Synth\n"
        f"got = Sf2Synth({str(path)!r}).render_midi({mid_path!r}, sr={SR})\n"
        f"ref = np.load({str(tmp_path / 'ref.npy')!r})\n"
        "m = min(len(got), len(ref))\n"
        "np.testing.assert_allclose(got[:m], ref[:m], atol=2e-4)\n"
        f"got2 = Sf2Synth({str(path2)!r}).render_midi({mid_path!r}, sr={SR})\n"
        f"ref2 = np.load({str(tmp_path / 'ref2.npy')!r})\n"
        "m2 = min(len(got2), len(ref2))\n"
        "np.testing.assert_allclose(got2[:m2], ref2[:m2], atol=2e-4)\n"
        "print('TPU_SF2_OK')\n"
    )
    try:
        proc = subprocess.run([sys.executable, "-c", body], env=env, text=True,
                              capture_output=True, timeout=420)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU subprocess exceeded 420 s (degraded relay)")
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU attached in subprocess")
    if proc.returncode != 0 and "Unable to initialize backend" in (
            proc.stdout + proc.stderr):
        pytest.skip("TPU backend failed to initialize (degraded relay)")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "TPU_SF2_OK" in proc.stdout


# ------------------------------------------- custom modulators (spec 9.5)
#
# imod/pmod records evaluated at note-on (the pipelines' MIDI carries no
# CC / wheel / aftertouch traffic, so every source is static per voice).
# Each modulator collapses to an offset on its destination generator, so
# most checks below are EQUIVALENCE checks: a font carrying a modulator
# must render identically to a font with the offset folded into the
# generator itself.

# src enumerators (bits 0-6 index, 7 CC, 8 direction, 9 polarity,
# 10-15 curve): "no controller" full-scale linear unipolar positive = 0;
# the default velocity->attenuation source (concave unipolar negative
# note-on velocity) = 0x0502.
_SRC_UNITY = 0
_SRC_VEL_CONCAVE_NEG = 0x0502
_SRC_VEL_LINEAR = 0x0002


def _mod_font(path, zone_mods=(), global_mods=None, preset_mods=(),
              extra_gens=None):
    """Looped-sine font carrying modulators at the instrument zone /
    instrument global zone / preset zone levels."""
    from gandes_tpu.music.sf2 import G_HOLD_VOL as HOLD, G_SAMPLE_MODES as MODES

    n = SR
    data = (0.5 * np.sin(2 * np.pi * 441.0 * np.arange(n) / SR)).astype(np.float32)
    gens = {MODES: 1, HOLD: 2786}
    gens.update(extra_gens or {})
    zones = []
    if global_mods is not None:
        zones.append({"mods": list(global_mods)})  # global zone: no 'sample'
    zones.append({"sample": 0, "gens": gens, "mods": list(zone_mods)})
    build_sf2(path, samples=[{"name": "sine", "data": data, "sample_rate": SR,
                              "original_pitch": 60, "loop_start": 0,
                              "loop_end": n}],
              instruments=[{"name": "i", "zones": zones}],
              presets=[{"name": "p", "program": 0, "zones": [
                  {"instrument": 0, "mods": list(preset_mods)}]}])
    return path


def test_mod_roundtrip_through_build(tmp_path):
    """build_sf2 writes imod/pmod records that parse back field-for-field,
    at all three carrier levels (zone, instrument global zone, preset)."""
    from gandes_tpu.music.sf2 import G_INITIAL_ATT, G_INITIAL_FILTER_FC, Mod

    zm = (_SRC_VEL_CONCAVE_NEG, G_INITIAL_ATT, 480, 0, 0)
    gm = (_SRC_UNITY, G_INITIAL_FILTER_FC, -1200, _SRC_VEL_LINEAR, 2)
    pm = (_SRC_UNITY, G_INITIAL_ATT, 60, 0, 0)
    path = _mod_font(str(tmp_path / "rt.sf2"), zone_mods=[zm],
                     global_mods=[gm], preset_mods=[pm])
    font = Sf2Font(path)
    inst = font.instruments[0]
    assert inst.global_zone.mods == [Mod(*gm)]
    assert inst.zones[0].mods == [Mod(*zm)]
    assert font.presets[(0, 0)].zones[0].mods == [Mod(*pm)]


def test_mod_equivalent_to_folded_generator(tmp_path):
    """A unity-source modulator is exactly a generator offset: attenuation,
    coarse tune and filter cutoff destinations all render identically to
    fonts with the amount folded into the generator."""
    from gandes_tpu.music.sf2 import (G_COARSE_TUNE, G_INITIAL_ATT,
                                      G_INITIAL_FILTER_FC)

    notes = [(60, 100, 0.0, 0.6)]
    fc = int(round(1200 * np.log2(3000 / 8.176)))
    cases = [
        ({G_INITIAL_ATT: 200}, (_SRC_UNITY, G_INITIAL_ATT, 200, 0, 0), {}),
        ({G_COARSE_TUNE: 7}, (_SRC_UNITY, G_COARSE_TUNE, 7, 0, 0), {}),
        ({G_INITIAL_FILTER_FC: fc - 1200},
         (_SRC_UNITY, G_INITIAL_FILTER_FC, -1200, 0, 0),
         {G_INITIAL_FILTER_FC: fc}),
    ]
    for k, (folded, mod, base) in enumerate(cases):
        ref = Sf2Synth(_mod_font(str(tmp_path / f"f{k}.sf2"),
                                 extra_gens={**base, **folded})
                       ).render_midi(_midi(notes), sr=SR)
        got = Sf2Synth(_mod_font(str(tmp_path / f"m{k}.sf2"), zone_mods=[mod],
                                 extra_gens=base)).render_midi(_midi(notes), sr=SR)
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=f"case {k}")


def test_mod_preset_level_is_additive(tmp_path):
    """Preset-level modulators add on top of instrument-level ones (spec
    9.5.1): 200 cB at each level = 400 cB total = -40 dB."""
    from gandes_tpu.music.sf2 import G_INITIAL_ATT

    notes = [(60, 127, 0.0, 0.6)]
    m = (_SRC_UNITY, G_INITIAL_ATT, 200, 0, 0)
    base = Sf2Synth(_mod_font(str(tmp_path / "b.sf2"))).render_midi(
        _midi(notes), sr=SR)
    both = Sf2Synth(_mod_font(str(tmp_path / "ip.sf2"), zone_mods=[m],
                              preset_mods=[m])).render_midi(_midi(notes), sr=SR)
    ratio = np.abs(both[2000:8000]).max() / np.abs(base[2000:8000]).max()
    assert ratio == pytest.approx(10 ** (-400 / 200), rel=0.02)


def test_mod_zone_supersedes_global(tmp_path):
    """A zone-local modulator with the same (src, dest, amt_src, trans)
    identity replaces the instrument-global one (spec 9.5.1) — the global
    1440 cB mute never applies."""
    from gandes_tpu.music.sf2 import G_INITIAL_ATT

    notes = [(60, 127, 0.0, 0.6)]
    mute = (_SRC_UNITY, G_INITIAL_ATT, 1440, 0, 0)
    quiet = (_SRC_UNITY, G_INITIAL_ATT, 200, 0, 0)
    base = Sf2Synth(_mod_font(str(tmp_path / "b.sf2"))).render_midi(
        _midi(notes), sr=SR)
    got = Sf2Synth(_mod_font(str(tmp_path / "s.sf2"), zone_mods=[quiet],
                             global_mods=[mute])).render_midi(_midi(notes), sr=SR)
    ratio = np.abs(got[2000:8000]).max() / np.abs(base[2000:8000]).max()
    assert ratio == pytest.approx(0.1, rel=0.02)


def test_mod_supersedes_default_vel_to_attenuation(tmp_path):
    """An instrument modulator with the default velocity->attenuation
    identity replaces the built-in (vel/127)^2 law: amount 0 makes gain
    velocity-independent; amount 960 reproduces the default exactly."""
    from gandes_tpu.music.sf2 import G_INITIAL_ATT

    flat = (_SRC_VEL_CONCAVE_NEG, G_INITIAL_ATT, 0, 0, 0)
    path = _mod_font(str(tmp_path / "flat.sf2"), zone_mods=[flat])
    synth = Sf2Synth(path)
    loud = synth.render_midi(_midi([(60, 127, 0.0, 0.6)]), sr=SR)
    soft = synth.render_midi(_midi([(60, 40, 0.0, 0.6)]), sr=SR)
    np.testing.assert_allclose(soft, loud, atol=1e-6)

    dflt = (_SRC_VEL_CONCAVE_NEG, G_INITIAL_ATT, 960, 0, 0)
    p_mod = _mod_font(str(tmp_path / "dflt.sf2"), zone_mods=[dflt])
    p_none = _mod_font(str(tmp_path / "none.sf2"))
    for vel in (127, 64, 33):
        a = Sf2Synth(p_mod).render_midi(_midi([(60, vel, 0.0, 0.4)]), sr=SR)
        b = Sf2Synth(p_none).render_midi(_midi([(60, vel, 0.0, 0.4)]), sr=SR)
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_mod_amount_source_scales(tmp_path):
    """A secondary amount source multiplies the primary: unity primary x
    linear-velocity secondary gives att = amount * vel/127."""
    from gandes_tpu.music.sf2 import G_INITIAL_ATT

    m = (_SRC_UNITY, G_INITIAL_ATT, 400, _SRC_VEL_LINEAR, 0)
    path = _mod_font(str(tmp_path / "amt.sf2"), zone_mods=[m])
    synth = Sf2Synth(path)
    loud = synth.render_midi(_midi([(60, 127, 0.0, 0.6)]), sr=SR)
    soft = synth.render_midi(_midi([(60, 64, 0.0, 0.6)]), sr=SR)
    ratio = np.abs(soft[2000:8000]).max() / np.abs(loud[2000:8000]).max()
    # default vel curve (64/127)^2 times the modulator's att difference
    want = (64 / 127) ** 2 * 10 ** (-(400 * 64 / 127 - 400 * 127 / 127) / 200)
    assert ratio == pytest.approx(want, rel=0.02)


def test_mod_ignored_cases(tmp_path):
    """Per spec: modulators targeting non-modulatable (structural)
    generators, with unknown/link sources, or reading a centered pitch
    wheel through a bipolar map all leave the render unchanged."""
    from gandes_tpu.music.sf2 import G_FINE_TUNE, G_SAMPLE_ID

    notes = [(60, 100, 0.0, 0.6)]
    base = Sf2Synth(_mod_font(str(tmp_path / "b.sf2"))).render_midi(
        _midi(notes), sr=SR)
    cases = [
        (_SRC_UNITY, G_SAMPLE_ID, 32767, 0, 0),      # structural dest
        (127, G_FINE_TUNE, 12000, 0, 0),             # link source
        (20 | 0x80, G_FINE_TUNE, 12000, 0, 0),       # undefined CC inits to 0
        (0x20E, G_FINE_TUNE, 12000, 0, 0),           # centered wheel, bipolar
    ]
    for k, mod in enumerate(cases):
        got = Sf2Synth(_mod_font(str(tmp_path / f"m{k}.sf2"), zone_mods=[mod])
                       ).render_midi(_midi(notes), sr=SR)
        np.testing.assert_allclose(got, base, atol=1e-9, err_msg=f"case {k}")


def test_mod_identity_excludes_transform(tmp_path):
    """Supersession identity is (src, dest, amt_src) ONLY (spec 9.5.1 /
    fluid_mod_test_identity): a font modulator that matches the default
    velocity->attenuation identity but uses the abs transform still
    supersedes it — with amount 0 the render goes velocity-independent
    instead of attenuating twice."""
    from gandes_tpu.music.sf2 import G_INITIAL_ATT

    m = (_SRC_VEL_CONCAVE_NEG, G_INITIAL_ATT, 0, 0, 2)  # trans = |x|
    path = _mod_font(str(tmp_path / "abs.sf2"), zone_mods=[m])
    synth = Sf2Synth(path)
    loud = synth.render_midi(_midi([(60, 127, 0.0, 0.5)]), sr=SR)
    soft = synth.render_midi(_midi([(60, 40, 0.0, 0.5)]), sr=SR)
    np.testing.assert_allclose(soft, loud, atol=1e-6)


def test_mod_unknown_trans_and_curve_ignored(tmp_path):
    """Unknown transform or curve enumerators make the WHOLE modulator
    ignored (spec 9.5.2), not applied as linear."""
    from gandes_tpu.music.sf2 import G_FINE_TUNE

    notes = [(60, 100, 0.0, 0.5)]
    base = Sf2Synth(_mod_font(str(tmp_path / "b.sf2"))).render_midi(
        _midi(notes), sr=SR)
    cases = [
        (_SRC_UNITY, G_FINE_TUNE, 1200, 0, 4),        # unknown transform
        ((7 << 10), G_FINE_TUNE, 1200, 0, 0),         # unknown curve, src
        (_SRC_UNITY, G_FINE_TUNE, 1200, (9 << 10) | 2, 0),  # ... amt_src
    ]
    for k, mod in enumerate(cases):
        got = Sf2Synth(_mod_font(str(tmp_path / f"m{k}.sf2"), zone_mods=[mod])
                       ).render_midi(_midi(notes), sr=SR)
        np.testing.assert_allclose(got, base, atol=1e-9, err_msg=f"case {k}")


def test_mod_curve_closed_forms():
    """The 16 source shapes: endpoint values, monotonicity, and the
    FluidSynth table identity convex(v) == 1 - concave(127 - v)."""
    from gandes_tpu.music.sf2 import (_mod_concave, _mod_convex,
                                      _mod_transform_source)

    v = np.linspace(0.0, 127.0, 255)
    con = np.array([_mod_concave(x) for x in v])
    cvx = np.array([_mod_convex(x) for x in v])
    assert con[0] == 0.0 and con[-1] == 1.0
    assert cvx[0] == 0.0 and cvx[-1] == 1.0
    assert np.all(np.diff(con) >= 0) and np.all(np.diff(cvx) >= 0)
    np.testing.assert_allclose(
        cvx, 1.0 - np.array([_mod_concave(127.0 - x) for x in v]), atol=1e-12)
    # linear unipolar positive / negative; bipolar endpoints
    assert _mod_transform_source(127.0, 0x000) == 1.0
    assert _mod_transform_source(0.0, 0x100) == 1.0
    assert _mod_transform_source(0.0, 0x200) == -1.0
    assert _mod_transform_source(127.0, 0x200) == 1.0
    assert _mod_transform_source(63.5, 0x200) == 0.0
    # switch curve (3): threshold at 64
    sw = 3 << 10
    assert _mod_transform_source(63.0, sw) == 0.0
    assert _mod_transform_source(64.0, sw) == 1.0
    assert _mod_transform_source(64.0, sw | 0x100) == 0.0
    assert _mod_transform_source(63.0, sw | 0x100) == 1.0
    assert _mod_transform_source(63.0, sw | 0x200) == -1.0
    # every shape stays in [-1, 1]
    for curve in range(4):
        for bits in (0, 0x100, 0x200, 0x300):
            e = (curve << 10) | bits
            vals = [_mod_transform_source(x, e) for x in v]
            assert all(-1.0 <= y <= 1.0 for y in vals), hex(e)


def test_mod_invalid_superseder_keeps_default_vel_curve(tmp_path):
    """An INVALID modulator (unknown transform) that matches the default
    velocity->attenuation identity is ignored entirely (spec 9.5.2): the
    default velocity curve must survive, not be silently deleted."""
    from gandes_tpu.music.sf2 import G_INITIAL_ATT

    m = (_SRC_VEL_CONCAVE_NEG, G_INITIAL_ATT, 960, 0, 1)  # unknown transform
    path = _mod_font(str(tmp_path / "inv.sf2"), zone_mods=[m])
    synth = Sf2Synth(path)
    loud = synth.render_midi(_midi([(60, 127, 0.0, 0.5)]), sr=SR)
    soft = synth.render_midi(_midi([(60, 64, 0.0, 0.5)]), sr=SR)
    ratio = np.abs(soft).max() / np.abs(loud).max()
    assert ratio == pytest.approx((64 / 127) ** 2, rel=0.05)


def test_mod_forbidden_cc_sources_ignored(tmp_path):
    """CC indexes spec 8.2.1 forbids as sources (bank select, data entry,
    (N)RPN selects, channel-mode 120-127) invalidate the whole modulator
    instead of reading as a zero-value controller."""
    from gandes_tpu.music.sf2 import G_FINE_TUNE, G_INITIAL_ATT

    notes = [(60, 100, 0.0, 0.5)]
    base = Sf2Synth(_mod_font(str(tmp_path / "b.sf2"))).render_midi(
        _midi(notes), sr=SR)
    cases = [
        # CC121 negative linear: raw 0 -> 1.0 -> would add 960 cB (silence)
        (0x80 | 121 | 0x100, G_INITIAL_ATT, 960, 0, 0),
        (0x80 | 0, G_FINE_TUNE, 1200, 0, 0),            # bank select MSB
        (_SRC_UNITY, G_FINE_TUNE, 1200, 0x80 | 38, 0),  # data entry LSB amt
    ]
    for k, mod in enumerate(cases):
        got = Sf2Synth(_mod_font(str(tmp_path / f"m{k}.sf2"), zone_mods=[mod])
                       ).render_midi(_midi(notes), sr=SR)
        np.testing.assert_allclose(got, base, atol=1e-9, err_msg=f"case {k}")


def test_mod_amount_source_index0_unity_despite_flags(tmp_path):
    """A 'no controller' amount source (index 0, CC clear) is unity even
    with direction/polarity/curve bits set — FluidSynth forces v2 = 1.0
    before any transform (negative-linear bits would otherwise zero it)."""
    from gandes_tpu.music.sf2 import G_INITIAL_ATT

    notes = [(60, 100, 0.0, 0.5)]
    plain = (_SRC_UNITY, G_INITIAL_ATT, 200, 0, 0)
    flagged = (_SRC_UNITY, G_INITIAL_ATT, 200, 0x0100, 0)
    want = Sf2Synth(_mod_font(str(tmp_path / "p.sf2"), zone_mods=[plain])
                    ).render_midi(_midi(notes), sr=SR)
    got = Sf2Synth(_mod_font(str(tmp_path / "f.sf2"), zone_mods=[flagged])
                   ).render_midi(_midi(notes), sr=SR)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_mod_centered_wheel_switch_and_bipolar_curves():
    """The centered pitch wheel (63.5 on the 0..127 scale) reads HIGH
    through the switch curve (FluidSynth: 8192 >= 16384/2) and exactly 0
    through bipolar concave/convex; integer CC behavior is unchanged."""
    from gandes_tpu.music.sf2 import _mod_concave, _mod_transform_source

    sw = 3 << 10
    assert _mod_transform_source(63.5, sw) == 1.0
    assert _mod_transform_source(63.5, sw | 0x100) == 0.0
    assert _mod_transform_source(63.0, sw) == 0.0  # integer pins hold
    assert _mod_transform_source(64.0, sw) == 1.0
    for curve in (1 << 10, 2 << 10):  # concave, convex
        assert _mod_transform_source(63.5, curve | 0x200) == 0.0
    # bipolar concave at integer v matches FluidSynth's concave(2v - 127)
    assert _mod_transform_source(64.0, (1 << 10) | 0x200) == pytest.approx(
        _mod_concave(1.0))
    assert _mod_transform_source(63.0, (1 << 10) | 0x200) == pytest.approx(
        -_mod_concave(1.0))


# ---------------------------- keynum/velocity/exclusiveClass, 24-bit banks


def test_keynum_velocity_force_gens(tmp_path):
    """keynum/velocity (gens 46/47) substitute for the MIDI values
    downstream of zone selection: a forced font renders key 72 / vel 40
    exactly as the plain font renders key 60 / vel 127."""
    from gandes_tpu.music.sf2 import G_KEYNUM, G_VELOCITY

    plain = _sine_font(str(tmp_path / "p.sf2"), {})
    forced = _sine_font(str(tmp_path / "f.sf2"),
                        {G_KEYNUM: 60, G_VELOCITY: 127})
    ref = Sf2Synth(plain).render_midi(_midi([(60, 127, 0.0, 0.6)]), sr=SR)
    got = Sf2Synth(forced).render_midi(_midi([(72, 40, 0.0, 0.6)]), sr=SR)
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_exclusive_class_chokes_same_class_voice(tmp_path):
    """exclusiveClass (gen 57): a later same-class note-on sends the
    sounding voice into a quick release, so past the choke point the mix
    equals the new note alone; without the class both notes ring."""
    from gandes_tpu.music.sf2 import G_EXCLUSIVE_CLASS

    notes_a = [(60, 100, 0.0, 2.0)]
    notes_b = [(64, 100, 0.5, 2.0)]
    both = notes_a + notes_b
    sl = slice(int(1.2 * SR), int(1.8 * SR))

    excl = _sine_font(str(tmp_path / "x.sf2"), {G_EXCLUSIVE_CLASS: 1})
    sx = Sf2Synth(excl)
    mix = sx.render_midi(_midi(both), sr=SR)
    b_alone = sx.render_midi(_midi(notes_b), sr=SR)
    a_alone = sx.render_midi(_midi(notes_a), sr=SR)
    assert np.abs(a_alone[sl]).max() > 0.05      # A alone still sounds there
    m = min(len(mix), len(b_alone))
    np.testing.assert_allclose(mix[sl], b_alone[:m][sl], atol=1e-6)

    plain = _sine_font(str(tmp_path / "n.sf2"), {})
    sp = Sf2Synth(plain)
    mix_p = sp.render_midi(_midi(both), sr=SR)
    b_p = sp.render_midi(_midi(notes_b), sr=SR)
    mp = min(len(mix_p), len(b_p))
    assert np.abs(mix_p[sl] - b_p[:mp][sl]).max() > 0.05  # no choke: A rings


def test_exclusive_class_chokes_across_program_change(tmp_path):
    """exclusiveClass scope survives a mid-stream program change: two
    programs resolving to the same preset (GM first-preset fallback) still
    choke each other — FluidSynth scopes the choke per channel, not per
    program, and this stream is one channel."""
    from gandes_tpu.music.sf2 import G_EXCLUSIVE_CLASS

    sx = Sf2Synth(_sine_font(str(tmp_path / "x.sf2"), {G_EXCLUSIVE_CLASS: 1}))
    mid = MidiFile(type=0, ticks_per_beat=480)
    tr = MidiTrack()
    tr.append(MetaMessage("set_tempo", tempo=500000, time=0))
    tr.append(Message("note_on", note=60, velocity=100, time=0))
    tr.append(Message("program_change", program=5, time=480))   # t = 0.5 s
    tr.append(Message("note_on", note=64, velocity=100, time=0))
    tr.append(Message("note_off", note=60, velocity=0, time=1440))  # t = 2 s
    tr.append(Message("note_off", note=64, velocity=0, time=0))
    tr.append(MetaMessage("end_of_track", time=0))
    mid.tracks.append(tr)

    sl = slice(int(1.2 * SR), int(1.8 * SR))
    mix = sx.render_midi(mid, sr=SR)
    b_alone = sx.render_midi(_midi([(64, 100, 0.5, 2.0)]), sr=SR)
    a_alone = sx.render_midi(_midi([(60, 100, 0.0, 2.0)]), sr=SR)
    assert np.abs(a_alone[sl]).max() > 0.05  # A alone still sounds there
    m = min(len(mix), len(b_alone))
    np.testing.assert_allclose(mix[sl], b_alone[:m][sl], atol=1e-6)


def test_sm24_bank_24bit_precision(tmp_path):
    """A 24-bit font (smpl + sm24, spec 6.2) parses to s24/2^23 samples —
    strictly finer than any 16-bit quantization — and renders them."""
    n = 4000
    rng = np.random.RandomState(3)
    data = (rng.uniform(-1, 1, n) * 0.001).astype(np.float64)  # tiny: needs 24-bit
    kw = dict(
        samples=[{"name": "s", "data": data, "sample_rate": SR,
                  "original_pitch": 60, "loop_start": 0, "loop_end": n}],
        instruments=[{"name": "i", "zones": [{"sample": 0, "gens": {
            sf2mod.G_SAMPLE_MODES: 1, sf2mod.G_HOLD_VOL: 2786}}]}],
        presets=[{"name": "p", "program": 0, "zones": [{"instrument": 0}]}])
    p24 = str(tmp_path / "b24.sf2")
    p16 = str(tmp_path / "b16.sf2")
    build_sf2(p24, sample_bits=24, **kw)
    build_sf2(p16, **kw)
    f24, f16 = Sf2Font(p24), Sf2Font(p16)
    np.testing.assert_allclose(f24.bank[:n], data, atol=1.0 / (1 << 23))
    err16 = np.abs(f16.bank[:n] - data).max()
    err24 = np.abs(f24.bank[:n] - data).max()
    assert err24 < err16 / 50  # 8 extra bits = 256x finer grid
    # and the render plays the 24-bit samples verbatim at the root key
    audio = Sf2Synth(p24).render_midi(_midi([(60, 127, 0.0, 0.05)]), sr=SR)
    np.testing.assert_allclose(audio[:1000], data[:1000], atol=2e-7)
