"""Importing the reference's committed trained checkpoints.

Loads the author's real `.pth`/`.pt` weights into our flax models and
asserts forward-pass equivalence against the same weights running in torch
(reference architectures) — the strongest migration guarantee: a reference
user's trained models produce the same outputs here.
"""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

MMGAN_CKPT = "/root/reference/MMGAN_MIDI_DES/models/MAE_loss/mmgan_64_64_epoch_35.pth"
GANDES_CKPTS = sorted(glob.glob("/root/reference/GAN_DES/models/*.pt"))


@pytest.mark.skipif(not os.path.exists(MMGAN_CKPT), reason="checkpoint not committed")
def test_export_mmgan_torch_checkpoint_roundtrip(tmp_path):
    """export -> import round-trips to identical trees, and the exported
    file carries exactly the reference checkpoint's key/shape layout (so a
    strict torch load_state_dict into the reference classes succeeds)."""
    import torch

    from gandes_tpu.train.mmgan_loop import MMGANConfig, init_state_for_config
    from gandes_tpu.train.torch_import import (
        export_mmgan_torch_checkpoint,
        load_mmgan_torch_checkpoint,
    )

    cfg = MMGANConfig(start=100, sequence_length=50, seed=7)
    state, _, _ = init_state_for_config(cfg, batch_size=2)
    out = str(tmp_path / "exported.pth")
    export_mmgan_torch_checkpoint(state, out)

    ref_sd = torch.load(MMGAN_CKPT, map_location="cpu", weights_only=True)
    got_sd = torch.load(out, map_location="cpu", weights_only=True)
    assert set(got_sd) == set(ref_sd)
    for k in ref_sd:
        assert got_sd[k].shape == ref_sd[k].shape, k
        assert got_sd[k].dtype == ref_sd[k].dtype, k

    state2, _, _ = init_state_for_config(MMGANConfig(seed=0), batch_size=2)
    state2 = load_mmgan_torch_checkpoint(out, state2)
    for a, b in zip(jax.tree.leaves((state.g_params, state.g_stats, state.d_params)),
                    jax.tree.leaves((state2.g_params, state2.g_stats, state2.d_params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not GANDES_CKPTS, reason="checkpoint not committed")
def test_export_gandes_torch_checkpoint_roundtrip(tmp_path):
    import torch

    from gandes_tpu.train.gandes_loop import GanDesConfig
    from gandes_tpu.train.steps import init_gandes_state
    from gandes_tpu.models.gan_des import DCGANGenerator, MelDiscriminator
    from gandes_tpu.train.torch_import import (
        export_gandes_torch_checkpoint,
        load_gandes_torch_checkpoint,
    )

    cfg = GanDesConfig()
    tx = optax.adam(cfg.lr)
    state = init_gandes_state(DCGANGenerator(), MelDiscriminator(),
                              jax.random.key(3), batch_size=2, g_tx=tx, d_tx=tx)
    out = str(tmp_path / "exported.pt")
    export_gandes_torch_checkpoint(state, out)

    ref_sd = torch.load(GANDES_CKPTS[0], map_location="cpu", weights_only=True)
    got_sd = torch.load(out, map_location="cpu", weights_only=True)
    assert set(got_sd) == set(ref_sd)
    for k in ref_sd:
        assert got_sd[k].shape == ref_sd[k].shape, k

    state2 = init_gandes_state(DCGANGenerator(), MelDiscriminator(),
                               jax.random.key(0), batch_size=2, g_tx=tx, d_tx=tx)
    state2 = load_gandes_torch_checkpoint(out, state2)
    for a, b in zip(jax.tree.leaves((state.g_params, state.g_stats)),
                    jax.tree.leaves((state2.g_params, state2.g_stats))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not os.path.exists(MMGAN_CKPT), reason="checkpoint not committed")
def test_import_mmgan_checkpoint_forward_equivalence():
    import torch
    from torch import nn as tnn

    from gandes_tpu.train.mmgan_loop import MMGANConfig, init_state_for_config
    from gandes_tpu.train.torch_import import load_mmgan_torch_checkpoint

    cfg = MMGANConfig(start=100, sequence_length=50)
    state, (g1, g2, d), _ = init_state_for_config(cfg, batch_size=2)
    state = load_mmgan_torch_checkpoint(MMGAN_CKPT, state)

    rng = np.random.RandomState(0)
    noise = rng.randn(2, 50).astype(np.float32)
    aux = rng.randn(2, 50).astype(np.float32)
    roll = (rng.rand(2, 2, 128, 50) * 60).astype(np.float32)

    out1 = np.asarray(g1.apply(
        {"params": state.g_params["g1"], "batch_stats": state.g_stats["g1"]},
        jnp.asarray(noise), jnp.asarray(aux), False))
    out2 = np.asarray(g2.apply(
        {"params": state.g_params["g2"], "batch_stats": state.g_stats["g2"]},
        jnp.asarray(noise), jnp.asarray(aux), False))
    logits = np.asarray(d.apply({"params": state.d_params}, jnp.asarray(roll)))

    # the same weights in torch (reference architecture)
    sd = torch.load(MMGAN_CKPT, map_location="cpu", weights_only=True)

    def torch_mlp(prefix, widths, x):
        for i, w in enumerate(widths):
            lin = tnn.Linear(x.shape[1], w)
            lin.weight.data = sd[f"{prefix}.gen.{i}.0.weight"]
            lin.bias.data = sd[f"{prefix}.gen.{i}.0.bias"]
            bn = tnn.BatchNorm1d(w)
            bn.weight.data = sd[f"{prefix}.gen.{i}.1.weight"]
            bn.bias.data = sd[f"{prefix}.gen.{i}.1.bias"]
            bn.running_mean.data = sd[f"{prefix}.gen.{i}.1.running_mean"]
            bn.running_var.data = sd[f"{prefix}.gen.{i}.1.running_var"]
            bn.eval()
            with torch.no_grad():
                x = torch.sigmoid(bn(lin(x)))
        return x

    xin = torch.from_numpy(np.concatenate([noise, aux], axis=1))
    t1 = torch_mlp("generator1", (256, 128, 64, 4096), xin).numpy().reshape(2, 64, 64)
    t2 = torch_mlp("generator2", (256, 128, 64, 20), xin).numpy()
    np.testing.assert_allclose(out1, t1, atol=2e-4)
    np.testing.assert_allclose(out2, t2, atol=2e-4)

    c1 = tnn.Conv2d(2, 16, 4, 2, 1); c2 = tnn.Conv2d(16, 32, 4, 2, 1)
    fc = tnn.Linear(32 * 32 * 12, 1)
    c1.weight.data = sd["discriminator.conv1.weight"]; c1.bias.data = sd["discriminator.conv1.bias"]
    c2.weight.data = sd["discriminator.conv2.weight"]; c2.bias.data = sd["discriminator.conv2.bias"]
    fc.weight.data = sd["discriminator.fc.weight"]; fc.bias.data = sd["discriminator.fc.bias"]
    act = tnn.LeakyReLU(0.2)
    with torch.no_grad():
        x = torch.from_numpy(roll)
        tl = fc(act(c2(act(c1(x)))).reshape(2, -1)).numpy()
    np.testing.assert_allclose(logits, tl, atol=2e-4)


@pytest.mark.skipif(not GANDES_CKPTS, reason="checkpoint not committed")
def test_import_gandes_checkpoint_and_generate():
    import torch
    from torch import nn as tnn

    from gandes_tpu.models.gan_des import DCGANGenerator
    from gandes_tpu.train.steps import init_gandes_state
    from gandes_tpu.train.torch_import import load_gandes_torch_checkpoint
    from gandes_tpu.models.gan_des import MelDiscriminator

    gen = DCGANGenerator()
    disc = MelDiscriminator()
    tx = optax.adam(1e-4)
    state = init_gandes_state(gen, disc, jax.random.key(0), batch_size=2,
                              g_tx=tx, d_tx=tx)
    state = load_gandes_torch_checkpoint(GANDES_CKPTS[0], state)

    z = np.random.RandomState(1).randn(2, 100).astype(np.float32)
    out = np.asarray(gen.apply(
        {"params": state.g_params, "batch_stats": state.g_stats},
        jnp.asarray(z), False))
    assert out.shape == (2, 20, 20)

    sd = torch.load(GANDES_CKPTS[0], map_location="cpu", weights_only=True)
    convs = [tnn.ConvTranspose2d(100, 128, 4, 1, 0, bias=False),
             tnn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False),
             tnn.ConvTranspose2d(64, 32, 4, 2, 1, bias=False),
             tnn.ConvTranspose2d(32, 1, 5, 1, 0, bias=False)]
    bns = [tnn.BatchNorm2d(128), tnn.BatchNorm2d(64), tnn.BatchNorm2d(32)]
    for c, name in zip(convs, ["conv1", "conv2", "conv3", "conv4"]):
        c.weight.data = sd[name + ".weight"]
    for b, name in zip(bns, ["batch_norm1", "batch_norm2", "batch_norm3"]):
        b.weight.data = sd[name + ".weight"]; b.bias.data = sd[name + ".bias"]
        b.running_mean.data = sd[name + ".running_mean"]
        b.running_var.data = sd[name + ".running_var"]
        b.eval()
    with torch.no_grad():
        x = torch.from_numpy(z).reshape(2, 100, 1, 1)
        for c, b in zip(convs[:3], bns):
            x = torch.relu(b(c(x)))
        ref = torch.sigmoid(convs[3](x)).numpy()[:, 0]
    np.testing.assert_allclose(out, ref, atol=2e-4)
