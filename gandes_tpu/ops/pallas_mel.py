"""Fused mel-spectrogram Pallas kernel (frame + window + DFT + power + mel).

One kernel computes the whole front-end the reference assembles from
librosa/torchaudio calls (`GAN_DES/util.py:37-61`): gather overlapping
frames from the waveform, apply the hann window, evaluate the real DFT as
two MXU matmuls against cos/sin bases, square to power, and project onto
the mel filterbank — all without materializing the (n_frames x n_fft)
frame matrix or the (n_freqs x n_frames) spectrogram in HBM.

Layout: grid = (frame_blocks, freq_tiles). Each program windows a block of
FRAMES_PER_BLOCK frames (dynamic slices from the VMEM-resident padded
wave), contracts it with a (n_fft, FREQ_TILE) slice of the cos/sin bases,
and accumulates the mel projection of the tile's power into the output
block — the freq axis is the innermost grid dimension, so the output block
stays resident across the accumulation (standard revisiting pattern).
The frequency axis is zero-padded to a tile multiple: padded DFT columns
produce zero power and zero-padded mel rows ignore them, so the result is
exact.

VMEM budget per program: frames (~1.8 MB for 216 frames) + 2 x (2048 x 128)
base tiles (1 MB each, double-buffered) + small blocks — low enough that
the grid pipeline keeps DMA overlapped (256-wide tiles oversubscribed
VMEM and serialized the pipeline).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gandes_tpu.music.mel import _hann_periodic, mel_filterbank

FRAMES_PER_BLOCK = 8
FREQ_TILE = 128


@lru_cache(maxsize=8)
def _bases(n_fft: int, n_freqs_padded: int):
    """Windowed cos/sin DFT bases, zero-padded on the freq axis."""
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    win = _hann_periodic(n_fft)[:, None]
    cos = np.zeros((n_fft, n_freqs_padded), np.float32)
    sin = np.zeros((n_fft, n_freqs_padded), np.float32)
    cos[:, :n_freqs] = (np.cos(ang) * win).astype(np.float32)
    sin[:, :n_freqs] = (-np.sin(ang) * win).astype(np.float32)
    return cos, sin


def _kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref, acc_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    frames = frames_ref[:]  # (F, n_fft) — windowing is folded into bases
    # HIGHEST precision: the DFT contraction cancels heavily; bf16-input
    # MXU passes (DEFAULT) corrupt low-power bins
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im  # (F, FREQ_TILE)
    acc_ref[:] += jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32, precision=hi)

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "n_frames", "sr", "n_mels",
                                   "fmin", "fmax", "htk", "norm_slaney", "interpret"))
def _mel_power_pallas(wav_padded, n_fft, hop_length, n_frames, sr, n_mels, fmin,
                      fmax, htk, norm_slaney, interpret):
    n_freqs = n_fft // 2 + 1
    n_freqs_padded = -(-n_freqs // FREQ_TILE) * FREQ_TILE
    cos, sin = _bases(n_fft, n_freqs_padded)
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm_slaney)
    mel_t = np.zeros((n_freqs_padded, n_mels), np.float32)
    mel_t[:n_freqs] = fb.T

    from gandes_tpu.music.mel import frame_signal

    F = -(-n_frames // FRAMES_PER_BLOCK) * FRAMES_PER_BLOCK
    # framing stays in XLA as conv patches (Mosaic can't vector-load at
    # arbitrary 1-D offsets, and XLA gathers compile pathologically here);
    # window/DFT/power/mel fuse in the kernel
    needed = (F - 1) * hop_length + n_fft
    wav_padded = jnp.pad(wav_padded, (0, max(0, needed - wav_padded.shape[0])))
    frames = frame_signal(wav_padded, n_fft, hop_length)

    n_tiles = n_freqs_padded // FREQ_TILE
    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((F, n_fft), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, FREQ_TILE), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, FREQ_TILE), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_TILE, n_mels), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, n_mels), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, n_mels), jnp.float32),
        scratch_shapes=[pltpu.VMEM((F, n_mels), jnp.float32)],
        interpret=interpret,
    )(frames, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(mel_t))
    return out[:n_frames].T  # (n_mels, n_frames)


def mel_power_pallas(wav, sr, n_fft=2048, hop_length=512, n_mels=128, fmin=20,
                     fmax=8300, htk=True, norm_slaney=False, center=True,
                     interpret=None):
    """Power mel spectrogram (n_mels, n_frames) via the fused kernel.

    Matches ``music.mel.power_spectrogram`` + mel projection; interpret
    mode is auto-enabled off-TPU so tests run anywhere.
    """
    if interpret is None:
        # compiled everywhere except CPU (TPU platforms include plugin
        # names like 'axon'; only the CPU backend needs the interpreter)
        interpret = jax.devices()[0].platform == "cpu"
    wav = jnp.asarray(wav, jnp.float32)
    if center:
        wav = jnp.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (wav.shape[0] - n_fft) // hop_length
    return _mel_power_pallas(wav, n_fft, hop_length, n_frames, sr, n_mels,
                             fmin, fmax, htk, norm_slaney, interpret)
