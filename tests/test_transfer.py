"""compact_put: uint8-compacted host->device transfers are bit-identical
to plain float32 transfers (they exist to shrink the bytes moved per step
— the axon client leaks every h2d transfer's byte size, core/transfer.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gandes_tpu.core.transfer import _COMPACT_MIN_ELEMS, compact_put, is_u8_lossless


def test_is_u8_lossless():
    assert is_u8_lossless(np.zeros((4, 4), np.uint8))
    assert is_u8_lossless(np.arange(256, dtype=np.float32))
    assert is_u8_lossless(np.arange(200, dtype=np.int64))
    assert not is_u8_lossless(np.array([0.5], np.float32))
    assert not is_u8_lossless(np.array([-1.0], np.float32))
    assert not is_u8_lossless(np.array([256.0], np.float32))
    assert not is_u8_lossless(np.array([300], np.int32))
    assert not is_u8_lossless(np.array(["a"]))


@pytest.mark.parametrize("case", ["roll", "fractional", "negative", "big",
                                  "u8", "u16", "huge"])
def test_compact_put_bitwise(case):
    rng = np.random.default_rng(0)
    n = _COMPACT_MIN_ELEMS
    a = {
        # piano-roll-like: integer velocities + binary channel
        "roll": np.stack([rng.integers(0, 127, (128, 64)).astype(np.float32),
                          rng.integers(0, 2, (128, 64)).astype(np.float32)]),
        "fractional": rng.standard_normal(n).astype(np.float32),
        "negative": -rng.integers(0, 100, n).astype(np.float32),
        # the MM-GAN real-batch shape: velocities u8-safe, durations up to
        # ~300 (the 300-step pre-window roll) — rides the u16 tier
        "big": rng.integers(0, 10_000, n).astype(np.float32),
        "u8": rng.integers(0, 256, n).astype(np.uint8),
        "u16": rng.integers(0, 300, n).astype(np.float32),
        "huge": rng.integers(0, 100_000, n).astype(np.float32),
    }[case]
    got = compact_put(a)
    want = jnp.asarray(a, jnp.float32)
    assert got.dtype in (jnp.float32, jnp.uint8, jnp.uint16)
    assert got.shape == want.shape
    if case in ("roll", "u8"):  # the compact path must actually engage
        assert got.dtype == jnp.uint8
    if case in ("big", "u16"):
        assert got.dtype == jnp.uint16
    if case == "huge":  # > 65535: exactness not guaranteed, stay f32
        assert got.dtype == jnp.float32
    # the in-step decode (cast_f32_args) must reproduce the f32 transfer
    decoded = jax.jit(lambda x: jnp.asarray(x, jnp.float32))(got)
    np.testing.assert_array_equal(np.asarray(decoded), np.asarray(want))


def test_transfer_bytes_counter():
    """The leak-accounting counter reports exactly the bytes moved."""
    from gandes_tpu.core.transfer import reset_transfer_bytes, transfer_bytes

    n = _COMPACT_MIN_ELEMS
    reset_transfer_bytes()
    compact_put(np.zeros(n, np.float32))            # u8 tier: n bytes
    assert transfer_bytes() == n
    compact_put(np.full(n, 300.0, np.float32))      # u16 tier: 2n
    assert transfer_bytes() == 3 * n
    compact_put(np.full(n, 0.5, np.float32))        # f32 fallthrough: 4n
    assert transfer_bytes() == 7 * n
    reset_transfer_bytes()
    assert transfer_bytes() == 0


def test_compact_put_device_array_passthrough():
    x = jnp.linspace(0.0, 1.0, 32)
    assert compact_put(x) is x  # no host round trip for device arrays
    u = jnp.arange(32, dtype=jnp.uint8)
    assert compact_put(u) is u  # already compact
    y = jnp.arange(32, dtype=jnp.int32)
    out = compact_put(y)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.arange(32, dtype=np.float32))


def test_cast_f32_args_wrapper():
    from gandes_tpu.core.transfer import cast_f32_args

    def f(a, b, c=None):
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        return a.sum() + b.sum()

    g = jax.jit(cast_f32_args(f, 0, 1))
    out = g(jnp.arange(4, dtype=jnp.uint8), jnp.ones((4,), jnp.float32))
    assert float(out) == 10.0


def test_mmgan_loop_bitwise_with_and_without_compaction(
        midi_fixture_dir, tmp_path, monkeypatch):
    """The training loop's losses are bit-identical whether batch
    transfers ride uint8 or float32 (batch 2 rolls = 65,536 elems, above
    the compaction threshold, and integer-valued -> the uint8 path is
    actually exercised)."""
    from gandes_tpu.data.datasets import MaestroDatasetPickle, build_window_pickle
    from gandes_tpu.train import mmgan_loop
    from gandes_tpu.train.mmgan_loop import MMGANConfig, train_mmgan

    out = str(tmp_path / "w.pkl")
    build_window_pickle(str(midi_fixture_dir), out, sequence_length=50)
    ds = MaestroDatasetPickle(out, data_dir=".")
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs", exist_ok=True)

    def run(tag, plain):
        if plain:
            monkeypatch.setattr(
                mmgan_loop, "compact_put",
                lambda a, dtype=jnp.float32, allow_compact=True:
                    jnp.asarray(a, dtype))
        else:
            monkeypatch.setattr(mmgan_loop, "compact_put", compact_put)
        cfg = MMGANConfig(batch_size=2, num_epochs=1, start=0,
                          sequence_length=50, seed=1, resume=False,
                          models_dir=str(tmp_path / f"models_{tag}"),
                          losses_dir=str(tmp_path / f"losses_{tag}"))
        np.random.seed(0)
        _, hist = train_mmgan(ds, cfg, max_batches=2)
        return hist

    h_compact = run("c", plain=False)
    h_plain = run("p", plain=True)
    assert h_compact["disc"] == h_plain["disc"]
    assert h_compact["gen"] == h_plain["gen"]
