"""NSF-HiFiGAN neural vocoder (reference: nsf_hifigan/models.py).

Generator: sine-excited HiFiGAN — mel (B,T,M) + f0 (B,T) -> audio (B, L).
The sine source comes from ops/source.sine_gen (phase-continuous, f32-safe);
each upsample stage injects a strided-conv downsample of the merged source.

Feature-last layout throughout: transposed convs and resblocks are XLA convs
(MXU); weight norm matches torch's (g = ||v||) for from-scratch training and
is folded away by the weight converter at inference load.

Discriminators (MPD/MSD) and the GAN losses are included for full vocoder
training capability (defined in the reference at nsf_hifigan/models.py:276-427
but unused there, since its vocoder is pretrained externally).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.source import sine_gen
from .nn import Conv1d, Conv2d, ConvTranspose1d, Dense, leaky_relu

LRELU_SLOPE = 0.1


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    weight_norm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, fold_only: bool = False):
        folded = []
        for i, d in enumerate(self.dilation):
            c1 = Conv1d(
                self.channels, self.kernel_size, padding=get_padding(self.kernel_size, d),
                dilation=d, weight_norm=self.weight_norm, dtype=self.dtype,
                name=f"convs1_{i}",
            )
            c2 = Conv1d(
                self.channels, self.kernel_size, padding=get_padding(self.kernel_size, 1),
                weight_norm=self.weight_norm, dtype=self.dtype, name=f"convs2_{i}",
            )
            if fold_only:
                # declare the identical params, return folded (kernel, bias)
                # pairs in chain order for ops/pallas_resblock
                folded.append(c1(x, fold_only=True))
                folded.append(c2(x, fold_only=True))
                continue
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = c1(xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = c2(xt)
            x = xt + x
        return folded if fold_only else x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    weight_norm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(
                self.channels, self.kernel_size, padding=get_padding(self.kernel_size, d),
                dilation=d, weight_norm=self.weight_norm, dtype=self.dtype,
                name=f"convs_{i}",
            )(xt)
            x = xt + x
        return x


class SourceModuleHnNSF(nn.Module):
    """Sine bank -> Linear(h+1, 1) -> tanh merged excitation
    (nsf_hifigan/models.py:168-204)."""

    sampling_rate: int
    harmonic_num: int = 8
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0, upp: int, key, sine_kwargs=None):
        sines = sine_gen(
            f0,
            upp,
            self.sampling_rate,
            self.harmonic_num,
            key,
            sine_amp=self.sine_amp,
            noise_std=self.add_noise_std,
            voiced_threshold=self.voiced_threshold,
            **(sine_kwargs or {}),
        )
        sines = jax.lax.stop_gradient(sines)  # reference SineGen is @no_grad
        merged = Dense(1, name="l_linear")(sines)
        return jnp.tanh(merged)  # (B, T*upp, 1)


class Generator(nn.Module):
    """NSF-HiFiGAN generator: mel (B,T,M), f0 (B,T) -> audio (B, T*upp)."""

    sampling_rate: int
    num_mels: int = 128
    upsample_rates: Sequence[int] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4, 4)
    upsample_initial_channel: int = 512
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    weight_norm: bool = True
    dtype: jnp.dtype | None = None
    # subpixel upsamplers: same math/params as the lhs-dilated transposed
    # conv (see models/nn.py ConvTranspose1d.subpixel) but lowered as dense
    # matmul + depth-to-space — no zero-dilated input on the MXU. Measured
    # TPU A/B (bench_suite nsf_subpixel): 154x vs 286x f32, 225x vs 363x
    # bf16 — the dilated lowering WINS on v5e (XLA's native conv_transpose
    # beats the phase-packed matmul at these channel widths), so this stays
    # off; kept for layout experiments (equivalence proven on hardware,
    # TPU_CHECKS.json nsf_subpixel).
    subpixel_upsample: bool = False
    # fused Pallas resblock stages (ops/pallas_resblock): all 18 same-convs
    # + leaky_relus + residual adds of a stage run in one VMEM-resident
    # kernel (2 reads + 1 write of HBM instead of ~40 passes). Applies to
    # stages with channels <= 128 (94 % of the resblock traffic); the
    # C=256 first stage and the transposed convs stay on XLA. Carries a
    # custom VJP (backward = equivalent jnp conv chain), so it works under
    # jax.grad — a measured win at inference sizes (PERF.md), a wash at
    # GAN-training crop sizes (train_vocoder_fused), hence opt-in.
    use_pallas_resblock: bool = False
    pallas_interpret: bool = False  # CPU-test hook

    @property
    def upp(self) -> int:
        return int(np.prod(self.upsample_rates))

    @nn.compact
    def __call__(self, mel, f0, key=None, sine_kwargs=None):
        if key is None and sine_kwargs is None:
            key = self.make_rng("noise")
        num_kernels = len(self.resblock_kernel_sizes)
        num_upsamples = len(self.upsample_rates)
        assert self.upsample_initial_channel >= 2 ** num_upsamples, (
            "upsample_initial_channel too small: channels halve per stage"
        )
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2

        har_source = SourceModuleHnNSF(
            self.sampling_rate, harmonic_num=8, name="m_source"
        )(f0, self.upp, key, sine_kwargs=sine_kwargs)  # (B, T*upp, 1)

        x = Conv1d(
            self.upsample_initial_channel, 7, padding=3,
            weight_norm=self.weight_norm, dtype=self.dtype, name="conv_pre",
        )(mel)

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            c_cur = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(
                c_cur, k, stride=u, padding=(k - u) // 2,
                weight_norm=self.weight_norm, dtype=self.dtype, name=f"ups_{i}",
                subpixel=self.subpixel_upsample,
            )(x)
            if i + 1 < num_upsamples:
                stride_f0 = int(np.prod(self.upsample_rates[i + 1 :]))
                x_source = Conv1d(
                    c_cur, kernel_size=stride_f0 * 2, stride=stride_f0,
                    padding=stride_f0 // 2, dtype=self.dtype, name=f"noise_convs_{i}",
                )(har_source)
            else:
                x_source = Conv1d(c_cur, 1, dtype=self.dtype, name=f"noise_convs_{i}")(
                    har_source
                )
            x = x + x_source
            blocks = [
                res_cls(
                    c_cur, rk, tuple(rd), weight_norm=self.weight_norm,
                    dtype=self.dtype, name=f"resblocks_{i * num_kernels + j}",
                )
                for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
                )
            ]
            use_fused = (
                self.use_pallas_resblock
                and self.resblock == "1"
                and c_cur <= 128
                and 128 % c_cur == 0
                # param shapes/names are identical either way; skip the
                # kernel while initializing (init often runs on CPU)
                and not self.is_initializing()
            )
            if use_fused:
                from ..ops.pallas_resblock import fused_resblock_group

                folded = [blk(x, fold_only=True) for blk in blocks]
                x = fused_resblock_group(
                    x, folded, self.resblock_kernel_sizes,
                    self.resblock_dilation_sizes,
                    interpret=self.pallas_interpret,
                )
            else:
                xs = 0.0
                for blk in blocks:
                    xs = xs + blk(x)
                x = xs / num_kernels
        x = leaky_relu(x)  # default slope 0.01 (nsf_hifigan/models.py:260)
        x = Conv1d(
            1, 7, padding=3, weight_norm=self.weight_norm, dtype=self.dtype,
            name="conv_post",
        )(x)
        return jnp.tanh(x)[..., 0]  # (B, L)


# ---------------------------------------------------------------------------
# Discriminators + GAN losses (nsf_hifigan/models.py:276-427)
# ---------------------------------------------------------------------------


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        """x: (B, L) -> (score (B, n), fmap list). Weight-normed torch-init
        Conv2d stack (nsf_hifigan/models.py:276-289 norm_f semantics)."""
        wn, sn = not self.use_spectral_norm, self.use_spectral_norm
        fmap = []
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1)  # NHWC
        chans = [32, 128, 512, 1024]
        for i, c in enumerate(chans):
            x = Conv2d(
                c, (self.kernel_size, 1), stride=(self.stride, 1),
                padding=((get_padding(5, 1), get_padding(5, 1)), (0, 0)),
                weight_norm=wn, spectral_norm=sn,
                dtype=self.dtype, name=f"convs_{i}",
            )(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2d(
            1024, (self.kernel_size, 1), padding=((2, 2), (0, 0)),
            weight_norm=wn, spectral_norm=sn,
            dtype=self.dtype, name="convs_4",
        )(x)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2d(1, (3, 1), padding=((1, 1), (0, 0)),
                   weight_norm=wn, spectral_norm=sn,
                   dtype=self.dtype, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, dtype=self.dtype, name=f"disc_{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(nn.Module):
    use_spectral_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        """x: (B, L) -> (score, fmap). Weight-normed convs; the MSD's first
        scale uses spectral norm (nsf_hifigan/models.py:336-349 norm_f)."""
        wn, sn = not self.use_spectral_norm, self.use_spectral_norm
        fmap = []
        x = x[..., None]  # (B, L, 1)
        specs = [
            (128, 15, 1, 1, 7),
            (128, 41, 2, 4, 20),
            (256, 41, 2, 16, 20),
            (512, 41, 4, 16, 20),
            (1024, 41, 4, 16, 20),
            (1024, 41, 1, 16, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (c, k, s, g, p) in enumerate(specs):
            x = Conv1d(c, k, stride=s, padding=p, groups=g,
                       weight_norm=wn, spectral_norm=sn, dtype=self.dtype,
                       name=f"convs_{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(1, 3, padding=1, weight_norm=wn, spectral_norm=sn,
                   dtype=self.dtype, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiScaleDiscriminator(nn.Module):
    dtype: jnp.dtype | None = None
    scales: int = 3  # reference uses 3; fewer for tiny/dev recipes

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(self.scales):
            if i != 0:
                # AvgPool1d(4, 2, padding=2)
                def pool(v):
                    vp = jnp.pad(v, ((0, 0), (2, 2)))
                    return jax.lax.reduce_window(
                        vp, 0.0, jax.lax.add, (1, 4), (1, 2), "VALID"
                    ) / 4.0
                y, y_hat = pool(y), pool(y_hat)
            d = DiscriminatorS(use_spectral_norm=(i == 0),
                               dtype=self.dtype, name=f"disc_{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    loss = 0.0
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg**2)
    return loss


def generator_loss(disc_outputs):
    loss = 0.0
    for dg in disc_outputs:
        loss += jnp.mean((1.0 - dg) ** 2)
    return loss
