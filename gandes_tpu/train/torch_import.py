"""Import the reference's torch checkpoints into this framework.

The reference repo ships trained ``state_dict`` checkpoints
(`MMGAN_MIDI_DES/models/**/mmgan_64_64_epoch_*.pth`,
`GAN_DES/models/gen_<step>_<ts>.pt`); these loaders map them onto our flax
parameter trees so a reference user's trained models keep working:

* Linear: torch (out, in) -> flax (in, out);
* Conv2d: torch (out, in, kh, kw) -> flax (kh, kw, in, out);
* ConvTranspose2d: torch (in, out, kh, kw) -> flax kernel spatially
  flipped (lax.conv_transpose correlates on the dilated input where torch
  convolves, see tests/test_torch_forward_parity.py);
* flatten-adjacent Linears: torch flattens NCHW, flax NHWC — the kernel's
  input axis is permuted accordingly;
* BatchNorm: weight/bias -> scale/bias params, running stats -> batch_stats.

Forward-pass equivalence on the author's real weights is asserted in
tests/test_torch_import.py.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    return t.detach().cpu().numpy()


def _linear(sd, prefix):
    return {"kernel": _np(sd[prefix + ".weight"]).T.copy(),
            "bias": _np(sd[prefix + ".bias"]).copy()}


def _conv(sd, prefix):
    return {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0).copy(),
            "bias": _np(sd[prefix + ".bias"]).copy()}


def _convt_kernel(sd, prefix):
    w = _np(sd[prefix + ".weight"]).transpose(2, 3, 0, 1)  # (kh,kw,in,out)
    return {"kernel": w[::-1, ::-1].copy()}


def _bn(sd, prefix):
    params = {"scale": _np(sd[prefix + ".weight"]).copy(),
              "bias": _np(sd[prefix + ".bias"]).copy()}
    stats = {"mean": _np(sd[prefix + ".running_mean"]).copy(),
             "var": _np(sd[prefix + ".running_var"]).copy()}
    return params, stats


def _flatten_linear_nchw_to_nhwc(sd, prefix, c, h, w):
    """Linear following a torch NCHW flatten -> flax NHWC flatten."""
    weight = _np(sd[prefix + ".weight"])  # (out, c*h*w)
    out = weight.shape[0]
    k = weight.reshape(out, c, h, w).transpose(2, 3, 1, 0).reshape(h * w * c, out)
    return {"kernel": k.copy(), "bias": _np(sd[prefix + ".bias"]).copy()}


def _mlp_generator(sd, prefix):
    """Reference MLP generator (4x [Linear, BatchNorm1d, Sigmoid] under
    ``gen``) -> MLPGenerator/BeatGenerator param + stats trees."""
    params, stats = {}, {}
    for i in range(4):
        bn_p, bn_s = _bn(sd, f"{prefix}.gen.{i}.1")
        params[f"_GenBlock_{i}"] = {"Dense_0": _linear(sd, f"{prefix}.gen.{i}.0"),
                                    "BatchNorm_0": bn_p}
        stats[f"_GenBlock_{i}"] = {"BatchNorm_0": bn_s}
    return params, stats


def load_mmgan_torch_checkpoint(path, state):
    """Load a reference MultiModalGAN ``state_dict`` (.pth) into a GANState
    (optimizer state left at init — the reference never saved it)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    g1_p, g1_s = _mlp_generator(sd, "generator1")
    g2_p, g2_s = _mlp_generator(sd, "generator2")

    # DiscriminatorCNN: conv1, conv2, fc over an NCHW flatten of
    # (32, H/4, W/4); our DiscriminatorCNN flattens NHWC
    fc_in = _np(sd["discriminator.fc.weight"]).shape[1]
    h = 32  # 128 // 4
    w = fc_in // (32 * h)
    d_p = {
        "Conv_0": _conv(sd, "discriminator.conv1"),
        "Conv_1": _conv(sd, "discriminator.conv2"),
        "Dense_0": _flatten_linear_nchw_to_nhwc(sd, "discriminator.fc", 32, h, w),
    }
    return state.__class__(**{
        **state.__dict__,
        "g_params": {"g1": g1_p, "g2": g2_p},
        "g_stats": {"g1": g1_s, "g2": g2_s},
        "d_params": d_p,
    })


def _t(a):
    import torch

    # copy: jax arrays export as non-writable buffers, which torch rejects
    return torch.from_numpy(np.array(a, copy=True))


def _export_mlp_generator(sd, prefix, params, stats, step):
    import torch

    for i in range(4):
        blk_p, blk_s = params[f"_GenBlock_{i}"], stats[f"_GenBlock_{i}"]
        sd[f"{prefix}.gen.{i}.0.weight"] = _t(np.asarray(blk_p["Dense_0"]["kernel"]).T)
        sd[f"{prefix}.gen.{i}.0.bias"] = _t(blk_p["Dense_0"]["bias"])
        sd[f"{prefix}.gen.{i}.1.weight"] = _t(blk_p["BatchNorm_0"]["scale"])
        sd[f"{prefix}.gen.{i}.1.bias"] = _t(blk_p["BatchNorm_0"]["bias"])
        sd[f"{prefix}.gen.{i}.1.running_mean"] = _t(blk_s["BatchNorm_0"]["mean"])
        sd[f"{prefix}.gen.{i}.1.running_var"] = _t(blk_s["BatchNorm_0"]["var"])
        sd[f"{prefix}.gen.{i}.1.num_batches_tracked"] = torch.tensor(step,
                                                                     dtype=torch.int64)


def export_mmgan_torch_checkpoint(state, path):
    """Inverse of :func:`load_mmgan_torch_checkpoint`: write a reference-
    loadable ``MultiModalGAN`` state_dict (.pth) — the same 62 keys/shapes
    as the author's committed checkpoints, so models trained here load into
    the reference's torch classes (`network_tests.py:240-245`) unchanged.
    Round-trip identity is pinned in tests/test_torch_import.py."""
    import torch

    step = int(state.step)
    sd = {}
    _export_mlp_generator(sd, "generator1", state.g_params["g1"],
                          state.g_stats["g1"], step)
    _export_mlp_generator(sd, "generator2", state.g_params["g2"],
                          state.g_stats["g2"], step)
    for i, name in enumerate(["conv1", "conv2"]):
        k = np.asarray(state.d_params[f"Conv_{i}"]["kernel"])  # (kh,kw,in,out)
        sd[f"discriminator.{name}.weight"] = _t(k.transpose(3, 2, 0, 1))
        sd[f"discriminator.{name}.bias"] = _t(state.d_params[f"Conv_{i}"]["bias"])
    k = np.asarray(state.d_params["Dense_0"]["kernel"])  # (h*w*c, out), NHWC flatten
    c, h = 32, 32
    w = k.shape[0] // (c * h)
    out = k.shape[1]
    sd["discriminator.fc.weight"] = _t(
        k.reshape(h, w, c, out).transpose(3, 2, 0, 1).reshape(out, c * h * w))
    sd["discriminator.fc.bias"] = _t(state.d_params["Dense_0"]["bias"])
    torch.save(sd, path)
    return sd


def export_gandes_torch_checkpoint(state, path):
    """Inverse of :func:`load_gandes_torch_checkpoint`: write a reference-
    loadable GAN-DES generator state_dict (.pt) — generator only, like the
    reference's own ``torch.save(gen.state_dict())`` (SIMNN.py:344-347)."""
    import torch

    sd = {}
    for i, name in enumerate(["conv1", "conv2", "conv3", "conv4"]):
        k = np.asarray(state.g_params[f"ConvTranspose_{i}"]["kernel"])
        sd[f"{name}.weight"] = _t(k[::-1, ::-1].transpose(2, 3, 0, 1))
    for i, name in enumerate(["batch_norm1", "batch_norm2", "batch_norm3"]):
        sd[f"{name}.weight"] = _t(state.g_params[f"BatchNorm_{i}"]["scale"])
        sd[f"{name}.bias"] = _t(state.g_params[f"BatchNorm_{i}"]["bias"])
        sd[f"{name}.running_mean"] = _t(state.g_stats[f"BatchNorm_{i}"]["mean"])
        sd[f"{name}.running_var"] = _t(state.g_stats[f"BatchNorm_{i}"]["var"])
        sd[f"{name}.num_batches_tracked"] = torch.tensor(int(state.step),
                                                         dtype=torch.int64)
    torch.save(sd, path)
    return sd


def load_gandes_torch_checkpoint(path, state):
    """Load a reference GAN-DES generator ``state_dict`` (.pt) into a
    GANState (generator only — the reference saves only `gen`)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    g_params, g_stats = {}, {}
    for i, name in enumerate(["conv1", "conv2", "conv3", "conv4"]):
        g_params[f"ConvTranspose_{i}"] = _convt_kernel(sd, name)
    for i, name in enumerate(["batch_norm1", "batch_norm2", "batch_norm3"]):
        bn_p, bn_s = _bn(sd, name)
        g_params[f"BatchNorm_{i}"] = bn_p
        g_stats[f"BatchNorm_{i}"] = bn_s
    return state.__class__(**{
        **state.__dict__, "g_params": g_params, "g_stats": g_stats,
    })
