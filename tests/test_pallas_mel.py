"""Fused Pallas mel kernel: parity with the XLA path (interpret mode on
CPU; the same comparison runs compiled on TPU in perf sweeps)."""

import numpy as np
import pytest

from gandes_tpu.music.mel import _mel_project, melspectrogram_db_tensor, power_spectrogram
from gandes_tpu.ops.pallas_mel import mel_power_pallas


@pytest.mark.parametrize("hop,n", [(512, 44100), (1025, 5 * 44100)])
def test_pallas_mel_matches_xla(hop, n):
    sr = 44100
    rng = np.random.RandomState(0)
    wav = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / sr) + 0.1 * rng.randn(n)).astype(np.float32)
    ours = np.asarray(mel_power_pallas(wav, sr, hop_length=hop))
    s = power_spectrogram(wav, n_fft=2048, hop_length=hop)
    ref = np.asarray(_mel_project(s, sr, 2048, 128, 20, 8300, True, False))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)


def test_mel_tensor_pallas_flag():
    sr = 44100
    wav = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    a = np.asarray(melspectrogram_db_tensor(wav, sr=sr, use_pallas=True))
    b = np.asarray(melspectrogram_db_tensor(wav, sr=sr, use_pallas=False))
    assert a.shape == b.shape == (128, 216)
    np.testing.assert_allclose(a, b, atol=0.05)  # dB domain
