"""NSF-HiFiGAN vocoder GAN training — a capability the reference lacks.

The reference ships only a *pretrained* NSF-HiFiGAN and defines (but never
uses) the discriminators (nsf_hifigan/models.py:276-427, SURVEY.md §2.5).
This solver closes the loop so the whole stack can be trained end-to-end in
this framework: standard HiFiGAN recipe — LSGAN adversarial loss on MPD+MSD,
feature-matching loss, and a 45x L1 mel loss, with alternating jitted
generator/discriminator steps over the (data,) mesh.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.nsf_hifigan import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from .state import TrainState, create_train_state


class Discriminators(nn.Module):
    """MPD + MSD bundle: (y, y_hat) -> (reals, fakes, fmap_r, fmap_g).

    ``periods``/``msd_scales`` default to the HiFiGAN recipe; smaller sets
    are for tiny/dev configs (vocoder.discriminator_periods /
    vocoder.msd_scales in the train_vocoder config)."""

    periods: tuple = (2, 3, 5, 7, 11)
    msd_scales: int = 3

    @nn.compact
    def __call__(self, y, y_hat):
        pr, pg, pfr, pfg = MultiPeriodDiscriminator(
            periods=self.periods, name="mpd")(y, y_hat)
        sr, sg, sfr, sfg = MultiScaleDiscriminator(
            scales=self.msd_scales, name="msd")(y, y_hat)
        return pr + sr, pg + sg, pfr + sfr, pfg + sfg


def make_vocoder_train_steps(
    generator,
    discriminators: Discriminators,
    mel_fn: Callable,  # audio (B, L) -> mel (B, T, M)
    lambda_mel: float = 45.0,
    lambda_fm: float = 1.0,
):
    """Returns (disc_step, gen_step), both jitted.

    batch: {"audio": (B, L), "mel": (B, T, M), "f0": (B, T, 1)}.
    """

    def synth(gen_params, batch, key):
        return generator.apply(
            {"params": gen_params}, batch["mel"], batch["f0"][..., 0], key=key
        )

    def disc_loss_fn(d_params, gen_params, batch, key):
        y_hat = jax.lax.stop_gradient(synth(gen_params, batch, key))
        reals, fakes, _, _ = discriminators.apply(
            {"params": d_params}, batch["audio"], y_hat
        )
        return discriminator_loss(reals, fakes), ()

    def gen_loss_fn(gen_params, d_params, batch, key):
        y_hat = synth(gen_params, batch, key)
        _, fakes, fmap_r, fmap_g = discriminators.apply(
            {"params": d_params}, batch["audio"], y_hat
        )
        adv = generator_loss(fakes)
        fm = feature_loss(fmap_r, fmap_g)
        mel_l1 = jnp.mean(jnp.abs(mel_fn(y_hat) - mel_fn(batch["audio"])))
        loss = adv + lambda_fm * fm + lambda_mel * mel_l1
        return loss, {"adv": adv, "fm": fm, "mel_l1": mel_l1}

    @jax.jit
    def disc_step(state_d: TrainState, gen_params, batch, key):
        (loss, _), grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            state_d.params, gen_params, batch, key
        )
        return state_d.apply_gradients(grads), {"disc_loss": loss}

    @jax.jit
    def gen_step(state_g: TrainState, d_params, batch, key):
        (loss, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state_g.params, d_params, batch, key
        )
        metrics = {"gen_loss": loss, **aux}
        return state_g.apply_gradients(grads), metrics

    return disc_step, gen_step


def init_vocoder_training(
    generator, mel_example, f0_example, key, lr=2e-4, b1=0.8, b2=0.99,
    disc: Discriminators | None = None,
):
    """Initialize generator + discriminator TrainStates (AdamW betas per the
    HiFiGAN recipe). ``disc`` overrides the default full-recipe bundle."""
    import optax

    k1, k2, k3 = jax.random.split(key, 3)
    # jit the inits: one compiled graph instead of hundreds of eager op
    # dispatches (the torch-init convs + weight norms each cost an XLA
    # compile eagerly — measured 25 s -> 9 s for gen+disc on CPU)
    gen_params = jax.jit(lambda: generator.init(
        {"params": k1, "noise": k2}, mel_example, f0_example[..., 0], key=k2
    )["params"])()
    if disc is None:
        disc = Discriminators()
    b, t = mel_example.shape[0], mel_example.shape[1]
    upp = generator.upp
    audio_example = jnp.zeros((b, t * upp), jnp.float32)
    d_params = jax.jit(
        lambda: disc.init(k3, audio_example, audio_example)["params"]
    )()

    def mk_state(module, params):
        tx = optax.adamw(lr, b1=b1, b2=b2)
        return TrainState(
            step=jnp.asarray(0, jnp.int32), params=params, opt_state=tx.init(params),
            apply_fn=module.apply, tx=tx,
        )

    return mk_state(generator, gen_params), mk_state(disc, d_params), disc
