"""Rectified flow (flow matching) on mel (reference: reflow/reflow.py).

Training: v-prediction at t ~ t_start + (1-t_start)*U with the l2_lognorm
weighting; inference: Euler or RK4 ODE from the shallow start
x = t_start*norm_spec + (1-t_start)*noise. Mel layout is feature-last
(B, T, M); step counts are static so the ODE loop unrolls into `infer_step`
velocity-net calls with scalar coefficients folded at trace time.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class RectifiedFlow(nn.Module):
    velocity_fn: nn.Module
    out_dims: int = 128
    spec_min: float = -12.0
    spec_max: float = 2.0

    def norm_spec(self, x):
        return (x - self.spec_min) / (self.spec_max - self.spec_min) * 2.0 - 1.0

    def denorm_spec(self, x):
        return (x + 1.0) / 2.0 * (self.spec_max - self.spec_min) + self.spec_min

    @nn.compact
    def __call__(
        self,
        condition,  # (B, T, H)
        gt_spec=None,  # (B, T, M)
        infer: bool = True,
        infer_step: int = 10,
        sampler: str = "euler",
        t_start: float = 0.0,
        key: jax.Array | None = None,
        use_tqdm: bool = False,
        deterministic: bool = True,
        loss_type: str = "l2_lognorm",
        init_noise=None,  # streaming: blocking-invariant initial noise
        velocity_wrapper=None,  # streaming: wraps v_fn (halo exchange)
    ):
        if key is None:
            key = self.make_rng("diffusion")
        b, t_frames = condition.shape[0], condition.shape[1]
        t_start = max(float(t_start), 0.0)

        def v_fn(x, t):
            """velocity: x (B,T,M), t (B,) in [0,1] -> scaled 1000t for the net."""
            return self.velocity_fn(
                x, 1000.0 * t, condition, deterministic=deterministic
            )

        if velocity_wrapper is not None:
            v_fn = velocity_wrapper(v_fn)

        if not infer:
            x_1 = self.norm_spec(gt_spec)
            key_t, key_n = jax.random.split(key)
            t = t_start + (1.0 - t_start) * jax.random.uniform(key_t, (b,), x_1.dtype)
            t = jnp.clip(t, 1e-7, 1.0 - 1e-7)
            x_0 = jax.random.normal(key_n, x_1.shape, x_1.dtype)
            x_t = x_0 + t[:, None, None] * (x_1 - x_0)
            v_pred = v_fn(x_t, t)
            target = x_1 - x_0
            if loss_type == "l1":
                return jnp.mean(jnp.abs(target - v_pred))
            if loss_type == "l2":
                return jnp.mean((target - v_pred) ** 2)
            if loss_type == "l2_lognorm":
                w = (
                    0.398942
                    / t
                    / (1.0 - t)
                    * jnp.exp(-0.5 * jnp.log(t / (1.0 - t)) ** 2)
                )
                return jnp.mean(w[:, None, None] * (target - v_pred) ** 2)
            raise NotImplementedError(loss_type)

        # ---------------- inference (ODE) ----------------
        shape = (b, t_frames, self.out_dims)
        noise = init_noise if init_noise is not None else jax.random.normal(
            key, shape
        )
        if gt_spec is None:
            x = noise
            t0, dt = 0.0, 1.0 / infer_step
        else:
            norm = self.norm_spec(gt_spec)
            x = t_start * norm + (1.0 - t_start) * noise.astype(norm.dtype)
            t0, dt = t_start, (1.0 - t_start) / infer_step

        def tb(tv):
            return jnp.full((b,), tv, x.dtype)

        t = t0
        if sampler == "euler":
            for _ in range(infer_step):
                x = x + v_fn(x, tb(t)) * dt
                t += dt
        elif sampler == "rk4":
            for _ in range(infer_step):
                k1 = v_fn(x, tb(t))
                k2 = v_fn(x + 0.5 * k1 * dt, tb(t + 0.5 * dt))
                k3 = v_fn(x + 0.5 * k2 * dt, tb(t + 0.5 * dt))
                k4 = v_fn(x + k3 * dt, tb(t + dt))
                x = x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) * dt / 6.0
                t += dt
        else:
            raise NotImplementedError(sampler)
        return self.denorm_spec(x)
