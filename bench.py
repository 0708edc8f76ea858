"""Headline benchmark: fused MM-GAN train steps/sec on TPU vs the
reference's PyTorch-CPU math.

Measures the per-step device work of MM-GAN training (G1+G2 forward, D
update on real+fake piano rolls, post-update G loss — the reference's
`network_tests.py:276-348` inner loop minus the host DES, which is identical
for both sides) at the reference's configuration: batch 16, 64x64 adjacency,
(2,128,50) rolls. The baseline is the same math in torch on CPU (the
reference's only execution mode; it publishes no numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH, T, ADJ, ZDIM = 16, 50, 64, 50


def bench_jax(iters: int = 100) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from gandes_tpu.models import BeatGenerator, DiscriminatorCNN, MLPGenerator
    from gandes_tpu.train.steps import (
        init_mmgan_state,
        make_mmgan_step_and_next_forward,
    )

    g1 = MLPGenerator(adj_size=(ADJ, ADJ))
    g2 = BeatGenerator(output_dim=20)
    d = DiscriminatorCNN(roll_size=(2, 128, T))
    g_tx, d_tx = optax.adam(0.01), optax.adam(0.01)
    state = init_mmgan_state(g1, g2, d, jax.random.key(0), batch_size=BATCH,
                             z_dim=ZDIM, beat_dim=50, roll_size=(2, 128, T),
                             g_tx=g_tx, d_tx=d_tx)

    # D update (batch N) + G1/G2 forward (batch N+1) share one launch — the
    # loop's dispatch-adjacent pair (see make_mmgan_step_and_next_forward);
    # per step this is still the full device math: both BCE terms, D grads +
    # Adam, post-update G loss, G1+G2 forward with BN stat mutation.
    one = jax.jit(make_mmgan_step_and_next_forward(g1, g2, d, g_tx, d_tx),
                  donate_argnums=(0,))

    key = jax.random.key(1)
    noise1 = jax.random.normal(key, (BATCH, ZDIM))
    noise2 = jax.random.normal(key, (BATCH, ZDIM))
    beats = jnp.zeros((BATCH, 50))
    real = jax.random.uniform(key, (BATCH, 2, 128, T)) * 100.0
    fake = jax.random.uniform(key, (BATCH, 2, 128, T)) * 100.0

    def fresh():
        import jax as _jax
        return _jax.tree.map(jnp.copy, state)

    # warmup/compile
    s, mats, vec, metrics = one(fresh(), real, fake, noise1, noise2, beats)
    jax.block_until_ready((s.d_params, mats, metrics))

    s = fresh()
    t0 = time.perf_counter()
    for _ in range(iters):
        s, mats, vec, metrics = one(s, real, fake, noise1, noise2, beats)
    jax.block_until_ready((s.d_params, mats, metrics))
    dt = time.perf_counter() - t0
    return iters / dt


def bench_torch_cpu(iters: int = 20) -> float:
    import torch
    from torch import nn

    class GenBlock(nn.Sequential):
        def __init__(self, i, o):
            super().__init__(nn.Linear(i, o), nn.BatchNorm1d(o), nn.Sigmoid())

    class G(nn.Module):
        def __init__(self, out):
            super().__init__()
            self.net = nn.Sequential(GenBlock(100, 256), GenBlock(256, 128),
                                     GenBlock(128, 64), GenBlock(64, out))

        def forward(self, x):
            return self.net(x)

    class DCNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(2, 16, 4, 2, 1)
            self.c2 = nn.Conv2d(16, 32, 4, 2, 1)
            self.act = nn.LeakyReLU(0.2)
            self.fc = nn.Linear(32 * 32 * (T // 4), 1)

        def forward(self, x):
            x = self.act(self.c1(x))
            x = self.act(self.c2(x))
            return self.fc(x.reshape(len(x), -1))

    torch.manual_seed(0)
    torch.set_num_threads(max(1, torch.get_num_threads()))
    g1, g2, d = G(ADJ * ADJ), G(20), DCNN()
    gopt = torch.optim.Adam(list(g1.parameters()) + list(g2.parameters()), lr=0.01)
    dopt = torch.optim.Adam(d.parameters(), lr=0.01)
    crit = nn.BCEWithLogitsLoss()

    noise = torch.randn(BATCH, 100)
    real = torch.rand(BATCH, 2, 128, T) * 100
    fake = torch.rand(BATCH, 2, 128, T) * 100
    ones, zeros = torch.ones(BATCH), torch.zeros(BATCH)

    def one():
        m = g1(noise).view(BATCH, ADJ, ADJ)
        v = g2(noise)
        dopt.zero_grad()
        loss = crit(d(fake.detach()).squeeze(), zeros) + crit(d(real).squeeze(), ones)
        loss.backward()
        dopt.step()
        gopt.zero_grad()
        gl = crit(d(fake).squeeze(), ones)
        gl.backward()
        gopt.step()
        return m, v

    one()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one()
    return iters / (time.perf_counter() - t0)


def main():
    from gandes_tpu.core.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    # best-of-3 on both sides: the TPU is behind a shared relay and the CPU
    # baseline is load-sensitive — the max is the least-noisy estimator of
    # each side's attainable rate
    jax_rate = max(bench_jax(iters=60) for _ in range(3))
    torch_rate = max(bench_torch_cpu(iters=10) for _ in range(3))
    print(
        json.dumps(
            {
                "metric": "mmgan_fused_train_steps_per_sec",
                "value": round(jax_rate, 2),
                "unit": "steps/s",
                "vs_baseline": round(jax_rate / torch_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
