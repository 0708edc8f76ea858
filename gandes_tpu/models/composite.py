"""Composite MM-GAN (API parity with the reference ``MultiModalGAN``,
`MMGAN_MIDI_DES/network_tests.py:163-206`) and the experimental SimNN.

``MultiModalGAN.forward`` is G1+G2 -> host DES round-trip
(``matrix_to_midi``) -> DiscriminatorCNN, returning (logits,
failed_sim_count) exactly like the reference (whose generator outputs are
detached before the DES, so this composite is non-differentiable through
the simulator by construction). Training uses the fused steps in
``train/``; this class is the object-style inference/demo surface.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gandes_tpu.bridge.mmgan_decode import matrix_to_midi
from gandes_tpu.models.mmgan import BeatGenerator, DiscriminatorCNN, MLPGenerator
from gandes_tpu.train.steps import init_mmgan_state, make_mmgan_gen_forward


class MultiModalGAN:
    def __init__(self, z_dim=100, hidden_dim=64, adj_size=(28, 28),
                 roll_size=(2, 128, 50), input_dim=50, output_dim=16,
                 instrument=None, start=30, end=80, device="cpu", seed=0,
                 log_path="logs/", out_dir="./adj_sim_outputs/midi"):
        self.z_dim = z_dim
        self.adj_size = adj_size
        self.roll_size = roll_size
        self.instrument = instrument
        self.start = start
        self.end = end
        self.log_path = log_path
        self.out_dir = out_dir

        self.generator1 = MLPGenerator(z_dim=z_dim, hidden_dim=hidden_dim,
                                       adj_size=adj_size, input_dim=z_dim)
        self.generator2 = BeatGenerator(z_dim=z_dim, hidden_dim=hidden_dim,
                                        input_dim=input_dim, output_dim=output_dim)
        self.discriminator = DiscriminatorCNN(roll_size=roll_size)

        tx = optax.adam(0.01)
        self.state = init_mmgan_state(
            self.generator1, self.generator2, self.discriminator,
            jax.random.key(seed), batch_size=2, z_dim=z_dim,
            beat_dim=input_dim, roll_size=roll_size, g_tx=tx, d_tx=tx,
        )
        self._gen_forward = jax.jit(make_mmgan_gen_forward(self.generator1, self.generator2))
        self._disc_apply = jax.jit(
            lambda p, x: self.discriminator.apply({"params": p}, x)
        )
        self._train = True

    def train(self):
        self._train = True

    def eval(self):
        self._train = False

    def _generate(self, noise1, noise2, input_tensor, generate, count=0):
        if self._train:
            out1, out2, new_stats = self._gen_forward(
                self.state, jnp.asarray(noise1), jnp.asarray(noise2),
                jnp.asarray(input_tensor), jax.random.key(count),
            )
            self.state = self.state.__class__(**{**self.state.__dict__, "g_stats": new_stats})
        else:
            out1 = self.generator1.apply(
                {"params": self.state.g_params["g1"], "batch_stats": self.state.g_stats["g1"]},
                jnp.asarray(noise1), None, False, rngs={"aux": jax.random.key(count)},
            )
            out2 = self.generator2.apply(
                {"params": self.state.g_params["g2"], "batch_stats": self.state.g_stats["g2"]},
                jnp.asarray(noise2), jnp.asarray(input_tensor), False,
            )
        return matrix_to_midi(
            np.asarray(out1)[:, None], np.asarray(out2), adj_size=self.adj_size,
            instrument=self.instrument, start=self.start, end=self.end,
            count=count, generate=generate, log_path=self.log_path,
            out_dir=self.out_dir,
        )

    def forward(self, noise1, noise2, input_tensor, count=0, make_dot_png=False):
        sim_output, failed = self._generate(noise1, noise2, input_tensor, False, count)
        rolls = jnp.asarray(np.stack(sim_output), jnp.float32)
        return self._disc_apply(self.state.d_params, rolls), failed

    __call__ = forward

    def generate_midi(self, noise1, noise2, input_tensor):
        self.eval()
        sim_output, _ = self._generate(noise1, noise2, input_tensor, True)
        return sim_output


class SimNN:
    """Experimental multi-head CNN (`GAN_DES/SIMNN.py:145-198`), never used
    by the reference training; provided as a flax module for completeness."""

    def __init__(self, n: int):
        import flax.linen as nn

        self.n = n

        class _Net(nn.Module):
            n: int

            @nn.compact
            def __call__(self, x):  # x: (B, 1, H, W) NCHW boundary
                x = jnp.transpose(x, (0, 2, 3, 1))
                x = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)))(x))
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)))(x))
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = x.reshape(x.shape[0], -1)
                x = nn.relu(nn.Dense(512)(x))
                out = nn.Dense(self.n * self.n + 4 * self.n)(x)
                n = self.n
                matrix = out[:, : n * n].reshape(-1, n, n)
                arrays = [out[:, n * n + k * n: n * n + (k + 1) * n] for k in range(4)]
                return (matrix, *arrays)

        self.module = _Net(n)

    def init(self, key, x):
        return self.module.init(key, x)

    def apply(self, variables, x):
        return self.module.apply(variables, x)

    @staticmethod
    def create_model(n: int) -> "SimNN":
        """== reference ``SimNN.create_model`` (GAN_DES/SIMNN.py:171-173)."""
        return SimNN(n)

    def pretrain_model(self, variables, pretrain_data, num_epochs: int = 5,
                       lr: float = 1e-3):
        """Working version of reference ``SimNN.pretrain_model``
        (GAN_DES/SIMNN.py:175-191): MSE-regress the 5 heads onto target
        arrays over ``pretrain_data`` batches of ``(spectrograms, targets)``
        with Adam. The reference's loop is a dead placeholder (it calls
        ``error_system.simulate`` on a function and regresses onto ``None``);
        this is the only runnable semantics. Returns ``(variables, losses)``.
        """
        tx = optax.adam(lr)
        opt_state = tx.init(variables["params"])

        @jax.jit
        def step(params, opt_state, x, targets):
            def loss_fn(p):
                outs = self.module.apply({"params": p}, x)
                return sum(jnp.mean((o - t) ** 2) for o, t in zip(outs, targets))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params, losses = variables["params"], []
        for _ in range(num_epochs):
            for spectrograms, targets in pretrain_data:
                params, opt_state, loss = step(params, opt_state,
                                               jnp.asarray(spectrograms),
                                               tuple(map(jnp.asarray, targets)))
                losses.append(float(loss))
        return {"params": params}, losses

    @staticmethod
    def error_system(output):
        """== reference ``SimNN.error_system`` (GAN_DES/SIMNN.py:193-198): an
        acknowledged placeholder — returns ``None`` (the reference also runs
        ``matrix_to_wav([output])`` on an incompatible head slice, which can
        only crash; nothing ever calls it)."""
        return None
