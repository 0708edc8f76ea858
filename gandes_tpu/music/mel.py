"""Mel spectrograms in JAX (librosa- and torchaudio-compatible variants).

Re-implements the reference's feature extractors (`GAN_DES/util.py:7-100`,
identical copy in `MMGAN_MIDI_DES/util.py`) without librosa/torchaudio:

* ``melspectrogram_db`` — librosa semantics: centered reflect-padded STFT
  (hann, periodic), power spectrum, *slaney*-scale mel filterbank with
  slaney area normalization, ``power_to_db(ref=1.0, top_db)``.
* ``melspectrogram_db_ref_max`` — the ``_from_file`` variant's
  ``power_to_db(ref=np.max)``.
* ``melspectrogram_db_tensor`` — torchaudio semantics: *htk* mel scale,
  no filter normalization, ``AmplitudeToDB(stype='power', top_db)`` whose
  floor is relative to the global max; dynamic hop
  ``len(wav) // (mel_length - 1)`` with the wave cropped to
  ``mel_length * hop`` (reference :40-44 — forcing a fixed frame count).
* ``melspectrogram_power_tensor`` — the ``_maestro`` variant quirk that
  returns the *power* mel, not dB (reference util.py:87).

The compute path is jit-compiled: framing is a strided gather, the rFFT
runs on device, and the mel projection is a single (n_freq x n_mels)
matmul that XLA places on the MXU. Hop lengths are static per (length,
mel_length) pair — fixed 5 s windows give one compilation.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

_AMIN = 1e-10


# ------------------------------------------------------------- filterbanks


def _hz_to_mel(f, htk: bool):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def _mel_to_hz(m, htk: bool):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=32)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
                   htk: bool, norm_slaney: bool) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) triangular filterbank.

    htk=False + norm_slaney=True == librosa defaults;
    htk=True + norm_slaney=False == torchaudio MelSpectrogram defaults.
    """
    n_freqs = 1 + n_fft // 2
    all_freqs = np.linspace(0, sr / 2, n_freqs)
    m_min, m_max = _hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, htk)

    fdiff = np.diff(f_pts)
    ramps = f_pts.reshape(-1, 1) - all_freqs.reshape(1, -1)
    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    fb = np.maximum(0.0, np.minimum(lower, upper))
    if norm_slaney:
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm.reshape(-1, 1)
    return fb.astype(np.float32)


# ------------------------------------------------------------------- STFT


def _hann_periodic(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def frame_signal(wav, n_fft: int, hop_length: int):
    """(n_frames, n_fft) overlapping frames.

    hop >= n_fft (the dynamic-hop long-audio case): a reshape + slice —
    zero-copy layout work. Otherwise conv patches (a plain XLA gather
    compiles pathologically slowly on TPU for this access pattern, and the
    conv's cost scales with the full input length, which is ruinous for
    multi-minute renders)."""
    n_frames = 1 + (wav.shape[0] - n_fft) // hop_length
    if hop_length >= n_fft:
        # last reshape row runs past the buffer; its tail is sliced away
        # (the final frame's n_fft samples are in bounds by construction)
        need = n_frames * hop_length
        if need > wav.shape[0]:
            wav = jnp.pad(wav, (0, need - wav.shape[0]))
        return wav[:need].reshape(n_frames, hop_length)[:, :n_fft]
    usable = (n_frames - 1) * hop_length + n_fft
    # HIGHEST precision: patches lower to a real MXU conv (identity filter),
    # and the MXU's DEFAULT pass rounds the INPUT to bf16 — i.e. every
    # extracted sample loses 16 mantissa bits before the FFT (measured
    # 1.9e-3 abs on a 0.3-amplitude wave, the whole 0.67-1.1 dB mel-parity
    # delta of round 3). With HIGHEST the bf16x3 passes reproduce the f32
    # samples exactly (x * 1.0 with 24 mantissa bits split 8+8+8).
    p = jax.lax.conv_general_dilated_patches(
        wav[None, :usable, None], filter_shape=(n_fft,), window_strides=(hop_length,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return p[0]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def power_spectrogram(wav, n_fft: int = 2048, hop_length: int = 512, center: bool = True):
    """|STFT|^2 with hann window; (1 + n_fft//2, n_frames)."""
    wav = jnp.asarray(wav, jnp.float32)
    if center:
        wav = jnp.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
    frames = frame_signal(wav, n_fft, hop_length) * jnp.asarray(_hann_periodic(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    return (spec.real**2 + spec.imag**2).T


def _mel_project(power_spec, sr, n_fft, n_mels, fmin, fmax, htk, norm_slaney):
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm_slaney))
    return jnp.dot(fb, power_spec, preferred_element_type=jnp.float32)


# -------------------------------------------------------- librosa variants


def melspectrogram(wav, sr, n_fft=2048, hop_length=512, n_mels=128, fmin=20, fmax=8300):
    s = power_spectrogram(wav, n_fft=n_fft, hop_length=hop_length)
    return _mel_project(s, sr, n_fft, n_mels, fmin, fmax, htk=False, norm_slaney=True)


def power_to_db(S, ref=1.0, amin=_AMIN, top_db=80.0):
    """librosa.power_to_db semantics (ref scalar or 'max')."""
    S = jnp.asarray(S)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    if isinstance(ref, str) and ref == "max":
        ref_value = jnp.max(S)
    else:
        ref_value = jnp.asarray(ref, S.dtype)
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def melspectrogram_db(wav, sr, n_fft=2048, hop_length=512, n_mels=128, fmin=20,
                      fmax=8300, top_db=80):
    """== reference ``get_melspectrogram_db`` (util.py:7-25)."""
    return power_to_db(melspectrogram(wav, sr, n_fft, hop_length, n_mels, fmin, fmax),
                       top_db=top_db)


def melspectrogram_db_ref_max(wav, sr=44100, n_fft=2048, hop_length=512, n_mels=128,
                              fmin=20, fmax=8300, top_db=80):
    """== reference ``get_melspectrogram_db_from_file`` body (util.py:28-34):
    power_to_db(ref=max) — note the reference passes no top_db there, so the
    default 80 applies."""
    return power_to_db(melspectrogram(wav, sr, n_fft, hop_length, n_mels, fmin, fmax),
                       ref="max", top_db=top_db)


def melspectrogram_db_from_file(file_path, sr=44100, n_fft=2048, hop_length=512,
                                n_mels=128, fmin=20, fmax=8300, top_db=80):
    """== reference ``get_melspectrogram_db_from_file`` (util.py:28-34):
    load mono at ``sr``, slaney mel, power_to_db(ref=max). QUIRK preserved:
    the reference accepts ``top_db`` but never passes it on — librosa's
    default 80 always applies. Resampling when the file rate differs is
    polyphase (librosa.load uses soxr; functionally equivalent, not
    bit-identical)."""
    from gandes_tpu.data.audio import load_wav

    del top_db  # accepted but unused, like the reference
    wav, file_sr = load_wav(file_path, normalize=True, mono=True)
    if sr is not None and file_sr != sr:
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(int(sr), int(file_sr))
        wav = resample_poly(np.asarray(wav), int(sr) // g, int(file_sr) // g)
    return melspectrogram_db_ref_max(wav, sr or file_sr, n_fft, hop_length,
                                     n_mels, fmin, fmax)


# ------------------------------------------------------ torchaudio variants


def amplitude_to_db_torch(S, top_db=80.0):
    """torchaudio AmplitudeToDB(stype='power'): 10log10(clamp(S, 1e-10)),
    floored at global max - top_db."""
    S = jnp.asarray(S)
    db = 10.0 * jnp.log10(jnp.clip(S, _AMIN, None))
    if top_db is not None:
        db = jnp.maximum(db, jnp.max(db) - top_db)
    return db


def _mel_power_backend(waveform, sr, n_fft, hop_length, n_mels, fmin, fmax,
                       htk, norm_slaney, use_pallas):
    """Power mel via the fused Pallas kernel (TPU default — ~16x faster
    than the XLA rfft path on v5e) or the XLA path (CPU default; also the
    bit-reference for the kernel's parity tests)."""
    if use_pallas is None:
        import jax as _jax

        use_pallas = _jax.devices()[0].platform != "cpu"
    if use_pallas:
        from gandes_tpu.ops.pallas_mel import mel_power_pallas

        try:
            return mel_power_pallas(waveform, sr, n_fft=n_fft, hop_length=hop_length,
                                    n_mels=n_mels, fmin=fmin, fmax=fmax, htk=htk,
                                    norm_slaney=norm_slaney)
        except Exception:
            # compile environments vary (remote-attached TPUs can refuse a
            # layout); the XLA path is numerically equivalent
            pass
    s = power_spectrogram(jnp.asarray(waveform, jnp.float32), n_fft=n_fft,
                          hop_length=hop_length)
    return _mel_project(s, sr, n_fft, n_mels, fmin, fmax, htk, norm_slaney)


def melspectrogram_db_tensor(waveform, sr=44100, n_fft=2048, hop_length=512,
                             n_mels=128, fmin=20, fmax=8300, top_db=80,
                             mel_length=216, use_pallas=None):
    """== reference ``get_melspectrogram_db_tensor`` (util.py:37-61):
    dynamic hop forcing ~mel_length frames, htk mel, power dB. Accepts
    device-resident arrays without forcing a host transfer."""
    if not hasattr(waveform, "shape") or isinstance(waveform, np.ndarray):
        waveform = np.asarray(waveform)
    hop_length = int(waveform.shape[0]) // (mel_length - 1)
    new_audio_length = mel_length * hop_length
    waveform = waveform[:new_audio_length]
    mel = _mel_power_backend(waveform, sr, n_fft, hop_length, n_mels, fmin, fmax,
                             True, False, use_pallas)
    return amplitude_to_db_torch(mel, top_db=top_db)


def melspectrogram_power_tensor(waveform, sr=44100, n_fft=2048, hop_length=512,
                                n_mels=128, fmin=20, fmax=8300, top_db=80,
                                mel_length=216, use_pallas=None):
    """== reference ``get_melspectrogram_db_tensor_maestro`` (util.py:63-87)
    QUIRK: computes the dB transform then returns the *power* mel."""
    waveform = np.asarray(waveform)
    hop_length = len(waveform) // (mel_length - 1)
    new_audio_length = mel_length * hop_length
    waveform = waveform[:new_audio_length]
    return _mel_power_backend(waveform, sr, n_fft, hop_length, n_mels, fmin, fmax,
                              True, False, use_pallas)


def melspectrogram_db_tensor_from_file(file_path):
    """== reference ``get_melspectrogram_db_tensor_from_file`` (util.py:89-100):
    load, mono-mean, dynamic-hop torchaudio-style mel dB."""
    from gandes_tpu.data.audio import load_wav

    waveform, sample_rate = load_wav(file_path, normalize=True, mono=True)
    return melspectrogram_db_tensor(waveform, sample_rate)
