"""Architectural parity: flax models == torch reference architectures.

Builds the reference's model definitions in torch (standard layers, per
`GAN_DES/SIMNN.py` / `MMGAN_MIDI_DES/network_tests.py`), copies the flax
parameters into them, and compares forward passes. This pins conv/pool
padding semantics, layer ordering, activation placement, and BN eval
behavior — the things shape tests can't see.
"""

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from gandes_tpu.models import (
    BeatGenerator,
    DCGANGenerator,
    DiscriminatorCNN,
    MelDiscriminator,
    MLPGenerator,
)

ATOL = 2e-4


def t(x):
    # .copy(): jax exports non-writable arrays; torch warns on those
    return torch.from_numpy(np.ascontiguousarray(x).copy())


def conv_w(kern):  # flax (kh,kw,in,out) -> torch Conv2d (out,in,kh,kw)
    return t(np.asarray(kern).transpose(3, 2, 0, 1))


def convt_w(kern):  # flax ConvTranspose -> torch ConvTranspose2d: flip + (in,out,kh,kw)
    return t(np.asarray(kern)[::-1, ::-1].transpose(2, 3, 0, 1))


def dense_w(kern):  # flax (in,out) -> torch Linear (out,in)
    return t(np.asarray(kern).T)


def copy_bn(torch_bn, params, stats):
    torch_bn.weight.data = t(np.asarray(params["scale"]))
    torch_bn.bias.data = t(np.asarray(params["bias"]))
    torch_bn.running_mean.data = t(np.asarray(stats["mean"]))
    torch_bn.running_var.data = t(np.asarray(stats["var"]))


def test_dcgan_generator_forward_parity():
    gen = DCGANGenerator()
    z = np.random.RandomState(0).randn(3, 100).astype(np.float32)
    v = gen.init(jax.random.key(1), jnp.asarray(z), True)
    # eval mode (running stats) for a deterministic comparison
    out_flax = np.asarray(gen.apply(v, jnp.asarray(z), False))

    p, s = v["params"], v["batch_stats"]
    tg = tnn.Sequential()  # reference SIMNN.py:62-112 structure
    convs = [tnn.ConvTranspose2d(100, 128, 4, 1, 0, bias=False),
             tnn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False),
             tnn.ConvTranspose2d(64, 32, 4, 2, 1, bias=False),
             tnn.ConvTranspose2d(32, 1, 5, 1, 0, bias=False)]
    bns = [tnn.BatchNorm2d(128), tnn.BatchNorm2d(64), tnn.BatchNorm2d(32)]
    for i, c in enumerate(convs):
        c.weight.data = convt_w(p[f"ConvTranspose_{i}"]["kernel"])
    for i, b in enumerate(bns):
        copy_bn(b, p[f"BatchNorm_{i}"], s[f"BatchNorm_{i}"])

    x = torch.from_numpy(z).reshape(3, 100, 1, 1)
    with torch.no_grad():
        for c, b in zip(convs[:3], bns):
            b.eval()
            x = torch.relu(b(c(x)))
        x = torch.sigmoid(convs[3](x))
    out_torch = x.numpy()[:, 0]
    np.testing.assert_allclose(out_flax, out_torch, atol=ATOL)


def test_mel_discriminator_forward_parity():
    d = MelDiscriminator()
    mel = np.random.RandomState(1).randn(2, 128, 216).astype(np.float32)
    v = d.init(jax.random.key(2), jnp.asarray(mel))
    out_flax = np.asarray(d.apply(v, jnp.asarray(mel)))

    p = v["params"]
    c1 = tnn.Conv2d(1, 16, 2, 1, 1)
    c2 = tnn.Conv2d(16, 32, 3, 1, 1)
    fc1 = tnn.Linear(32 * 32 * 54, 128)
    fc2 = tnn.Linear(128, 1)
    c1.weight.data = conv_w(p["Conv_0"]["kernel"]); c1.bias.data = t(np.asarray(p["Conv_0"]["bias"]))
    c2.weight.data = conv_w(p["Conv_1"]["kernel"]); c2.bias.data = t(np.asarray(p["Conv_1"]["bias"]))
    fc2.weight.data = dense_w(p["Dense_1"]["kernel"]); fc2.bias.data = t(np.asarray(p["Dense_1"]["bias"]))
    # flax flattens NHWC, torch flattens NCHW: permute fc1's input layout
    k = np.asarray(p["Dense_0"]["kernel"]).reshape(32, 54, 32, 128)  # (H,W,C,out)
    fc1.weight.data = t(k.transpose(2, 0, 1, 3).reshape(32 * 32 * 54, 128).T)
    fc1.bias.data = t(np.asarray(p["Dense_0"]["bias"]))

    pool = tnn.MaxPool2d(2, 2)
    with torch.no_grad():
        x = torch.from_numpy(mel).unsqueeze(1)
        x = pool(torch.relu(c1(x)))
        x = pool(torch.relu(c2(x)))
        x = x.reshape(-1, 32 * 32 * 54)
        x = torch.relu(fc1(x))
        out_torch = torch.sigmoid(fc2(x)).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=ATOL)


def test_adam_update_matches_torch():
    """One D training step (BCE fake+real, Adam lr=0.01) produces the same
    updated weights as torch — pins optimizer beta/eps conventions and the
    gradient path end to end."""
    import optax

    import jax
    import jax.numpy as jnp

    from gandes_tpu.models import DiscriminatorCNN
    from gandes_tpu.train.losses import bce_with_logits

    d = DiscriminatorCNN(roll_size=(2, 128, 50))
    rng = np.random.RandomState(7)
    real = rng.rand(4, 2, 128, 50).astype(np.float32)
    fake = rng.rand(4, 2, 128, 50).astype(np.float32)
    v = d.init(jax.random.key(0), jnp.asarray(real))

    def loss_fn(params):
        lf = d.apply({"params": params}, jnp.asarray(fake)).squeeze()
        lr_ = d.apply({"params": params}, jnp.asarray(real)).squeeze()
        return bce_with_logits(lf, 0.0) + bce_with_logits(lr_, 1.0)

    tx = optax.adam(0.01)
    opt = tx.init(v["params"])
    loss, grads = jax.value_and_grad(loss_fn)(v["params"])
    updates, _ = tx.update(grads, opt, v["params"])
    new_params = optax.apply_updates(v["params"], updates)

    # torch mirror with copied weights
    c1 = tnn.Conv2d(2, 16, 4, 2, 1)
    c2 = tnn.Conv2d(16, 32, 4, 2, 1)
    fc = tnn.Linear(32 * 32 * 12, 1)
    p = v["params"]
    c1.weight.data = conv_w(p["Conv_0"]["kernel"]); c1.bias.data = t(np.asarray(p["Conv_0"]["bias"]))
    c2.weight.data = conv_w(p["Conv_1"]["kernel"]); c2.bias.data = t(np.asarray(p["Conv_1"]["bias"]))
    k = np.asarray(p["Dense_0"]["kernel"]).reshape(32, 12, 32, 1)
    fc.weight.data = t(k.transpose(2, 0, 1, 3).reshape(-1, 1).T)
    fc.bias.data = t(np.asarray(p["Dense_0"]["bias"]))

    act = tnn.LeakyReLU(0.2)
    crit = tnn.BCEWithLogitsLoss()

    def fwd(x):
        h = act(c2(act(c1(torch.from_numpy(x)))))
        return fc(h.reshape(len(x), -1)).squeeze()

    opt_t = torch.optim.Adam(list(c1.parameters()) + list(c2.parameters()) + list(fc.parameters()), lr=0.01)
    opt_t.zero_grad()
    loss_t = crit(fwd(fake), torch.zeros(4)) + crit(fwd(real), torch.ones(4))
    loss_t.backward()
    opt_t.step()

    np.testing.assert_allclose(float(loss), float(loss_t.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["Conv_0"]["kernel"]).transpose(3, 2, 0, 1),
        c1.weight.detach().numpy(), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(new_params["Conv_0"]["bias"]), c1.bias.detach().numpy(), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(new_params["Dense_0"]["bias"]), fc.bias.detach().numpy(), atol=2e-6)


class _TorchGenBlock(tnn.Sequential):
    def __init__(self, i, o):
        super().__init__(tnn.Linear(i, o), tnn.BatchNorm1d(o), tnn.Sigmoid())


def _copy_mlp(torch_blocks, params, stats):
    for bi, block in enumerate(torch_blocks):
        bp = params[f"_GenBlock_{bi}"]
        bs = stats[f"_GenBlock_{bi}"]
        block[0].weight.data = dense_w(bp["Dense_0"]["kernel"])
        block[0].bias.data = t(np.asarray(bp["Dense_0"]["bias"]))
        copy_bn(block[1], bp["BatchNorm_0"], bs["BatchNorm_0"])
        block[1].eval()


def test_mmgan_generators_forward_parity():
    g1 = MLPGenerator(adj_size=(64, 64))
    g2 = BeatGenerator(output_dim=20)
    rng = np.random.RandomState(2)
    noise = rng.randn(4, 50).astype(np.float32)
    aux = rng.randn(4, 50).astype(np.float32)
    v1 = g1.init({"params": jax.random.key(0), "aux": jax.random.key(1)},
                 jnp.asarray(noise), jnp.asarray(aux), True)
    v2 = g2.init({"params": jax.random.key(2), "aux": jax.random.key(1)},
                 jnp.asarray(noise), jnp.asarray(aux), True)
    out1 = np.asarray(g1.apply(v1, jnp.asarray(noise), jnp.asarray(aux), False))
    out2 = np.asarray(g2.apply(v2, jnp.asarray(noise), jnp.asarray(aux), False))

    for v, out, widths in ((v1, out1, (256, 128, 64, 64 * 64)),
                           (v2, out2, (256, 128, 64, 20))):
        dims = (100, *widths[:-1])
        blocks = [_TorchGenBlock(dims[i], widths[i]) for i in range(4)]
        _copy_mlp(blocks, v["params"], v["batch_stats"])
        with torch.no_grad():
            x = torch.from_numpy(np.concatenate([noise, aux], axis=1))
            for b in blocks:
                x = b(x)
        ref = x.numpy().reshape(out.shape)
        np.testing.assert_allclose(out, ref, atol=ATOL)


def test_discriminator_cnn_forward_parity():
    d = DiscriminatorCNN(roll_size=(2, 128, 50))
    roll = np.random.RandomState(3).rand(2, 2, 128, 50).astype(np.float32) * 50
    v = d.init(jax.random.key(0), jnp.asarray(roll))
    out_flax = np.asarray(d.apply(v, jnp.asarray(roll)))

    p = v["params"]
    c1 = tnn.Conv2d(2, 16, 4, 2, 1)
    c2 = tnn.Conv2d(16, 32, 4, 2, 1)
    fc = tnn.Linear(32 * 32 * 12, 1)
    c1.weight.data = conv_w(p["Conv_0"]["kernel"]); c1.bias.data = t(np.asarray(p["Conv_0"]["bias"]))
    c2.weight.data = conv_w(p["Conv_1"]["kernel"]); c2.bias.data = t(np.asarray(p["Conv_1"]["bias"]))
    k = np.asarray(p["Dense_0"]["kernel"]).reshape(32, 12, 32, 1)  # (H,W,C,out)
    fc.weight.data = t(k.transpose(2, 0, 1, 3).reshape(-1, 1).T)
    fc.bias.data = t(np.asarray(p["Dense_0"]["bias"]))

    act = tnn.LeakyReLU(0.2)
    with torch.no_grad():
        x = torch.from_numpy(roll)
        x = act(c1(x))
        x = act(c2(x))
        out_torch = fc(x.reshape(len(x), -1)).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=ATOL)
