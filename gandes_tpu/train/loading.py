"""Checkpoint-to-inference-state loading, shared by the CLI and the server.

One definition of the load precedence (reference torch state_dict beats
orbax dir) and of the GAN-DES model/optimizer template, so
`cli.py generate-*` and `serve.GenerationService` cannot drift apart on
identical seeds/checkpoints.
"""

from __future__ import annotations


def load_mmgan_state(cfg, checkpoint: str | None = None,
                     torch_checkpoint: str | None = None, batch_size: int = 1):
    """MM-GAN inference state from an orbax dir or a reference .pth."""
    from gandes_tpu.train import checkpoint as ckpt
    from gandes_tpu.train.mmgan_loop import init_state_for_config

    state, _, _ = init_state_for_config(cfg, batch_size=batch_size)
    if torch_checkpoint:
        from gandes_tpu.train.torch_import import load_mmgan_torch_checkpoint

        return load_mmgan_torch_checkpoint(torch_checkpoint, state)
    if checkpoint:
        return ckpt.restore_state(checkpoint, state)
    return state


_GANDES_FORWARDS: dict = {}


def gandes_eval_forward(gen):
    """Jitted eval-mode DCGAN forward, cached per generator module — one
    definition for the CLI, ``generate_song`` and the server (eager per-op
    dispatch costs minutes on a remote-attached TPU)."""
    fwd = _GANDES_FORWARDS.get(gen)
    if fwd is None:
        import jax

        fwd = _GANDES_FORWARDS[gen] = jax.jit(lambda p, s, z: gen.apply(
            {"params": p, "batch_stats": s}, z, False))
    return fwd


def load_gandes_state(cfg, checkpoint: str | None = None,
                      torch_checkpoint: str | None = None, batch_size: int = 1):
    """GAN-DES inference state; returns ``(state, generator_module)``."""
    import jax
    import optax

    from gandes_tpu.models.gan_des import DCGANGenerator, MelDiscriminator
    from gandes_tpu.train import checkpoint as ckpt
    from gandes_tpu.train.steps import init_gandes_state

    gen = DCGANGenerator(noise_dim=cfg.z_dim)
    tx = optax.adam(cfg.lr, b1=0.5)
    state = init_gandes_state(gen, MelDiscriminator(), jax.random.key(0),
                              batch_size=batch_size, z_dim=cfg.z_dim,
                              g_tx=tx, d_tx=tx)
    if torch_checkpoint:
        from gandes_tpu.train.torch_import import load_gandes_torch_checkpoint

        return load_gandes_torch_checkpoint(torch_checkpoint, state), gen
    if checkpoint:
        return ckpt.restore_state(checkpoint, state), gen
    return state, gen
