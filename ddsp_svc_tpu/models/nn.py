"""Building blocks with torch-compatible semantics, in flax.linen.

All sequence modules operate feature-last (B, T, C) — the natural layout for
XLA on TPU (the channel dim maps to lanes). Torch layout conversions happen
only at weight-conversion time (convert/).

Blocks:
  - Conv1d: torch.nn.Conv1d semantics (explicit int padding, dilation,
    groups) on (B, T, C).
  - ConvTranspose1d: torch.nn.ConvTranspose1d semantics via lhs-dilated conv.
  - WNDense / WNConv1d: weight-normalized variants with torch's
    g = ||v|| initialization so from-scratch training dynamics match.
  - GroupNorm/LayerNorm thin aliases with torch eps.
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _kaiming_uniform_torch(fan_in: int):
    """torch's default conv/linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    via kaiming_uniform(a=sqrt(5))."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _spectral_normalize(kernel, out_features: int, n_iter: int = 5):
    """torch.nn.utils.spectral_norm equivalent, jit-stateless: power
    iteration from a fixed start vector every forward. torch warm-starts a
    persistent ``u`` with one step per forward; a 5-step cold start from a
    fixed vector estimates the same sigma without mutable state."""
    w = kernel.reshape(-1, out_features).T  # (out, fan_in), torch's view
    u = jax.random.normal(jax.random.PRNGKey(0), (w.shape[0],), kernel.dtype)

    def _l2(x):
        return x / (jnp.linalg.norm(x) + 1e-12)

    u = _l2(u)
    v = _l2(w.T @ u)
    for _ in range(n_iter):
        v = _l2(w.T @ u)
        u = _l2(w @ v)
    sigma = u @ (w @ v)
    return kernel / sigma


class Conv1d(nn.Module):
    """torch.nn.Conv1d on (B, T, C_in) -> (B, T_out, C_out)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int | tuple[int, int] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    kernel_init: Callable | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, fold_only: bool = False):
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * self.kernel_size
        kinit = self.kernel_init or _kaiming_uniform_torch(fan_in)
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        if self.weight_norm:
            v = self.param("kernel_v", kinit, kshape)
            g = self.param(
                "kernel_g",
                lambda rng: jnp.linalg.norm(v.reshape(-1, self.features), axis=0),
            )
            kernel = v * (g / (jnp.linalg.norm(v.reshape(-1, self.features), axis=0) + 1e-12))
        else:
            kernel = self.param("kernel", kinit, kshape)
            if self.spectral_norm:
                kernel = _spectral_normalize(kernel, self.features)
        if fold_only:
            # weight accessor for fused kernels (ops/pallas_resblock):
            # declares the exact same params, returns the folded weights
            bias = (
                self.param("bias", _kaiming_uniform_torch(fan_in), (self.features,))
                if self.use_bias
                else jnp.zeros((self.features,), kernel.dtype)
            )
            return kernel, bias
        pad = self.padding if isinstance(self.padding, tuple) else (self.padding, self.padding)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(self.stride,),
            padding=[pad],
            rhs_dilation=(self.dilation,),
            feature_group_count=self.groups,
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            bias = self.param("bias", _kaiming_uniform_torch(fan_in), (self.features,))
            y = y + bias.astype(dtype)
        return y


class Conv2d(nn.Module):
    """torch.nn.Conv2d on (B, H, W, C_in) -> (B, H', W', C_out), with
    torch's kaiming-uniform init and optional weight/spectral norm
    (the MPD discriminator's conv type, nsf_hifigan/models.py:276-289)."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0))
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = in_ch * kh * kw
        kinit = _kaiming_uniform_torch(fan_in)
        kshape = (kh, kw, in_ch, self.features)
        if self.weight_norm:
            v = self.param("kernel_v", kinit, kshape)
            g = self.param(
                "kernel_g",
                lambda rng: jnp.linalg.norm(v.reshape(-1, self.features), axis=0),
            )
            kernel = v * (
                g / (jnp.linalg.norm(v.reshape(-1, self.features), axis=0) + 1e-12)
            )
        else:
            kernel = self.param("kernel", kinit, kshape)
            if self.spectral_norm:
                kernel = _spectral_normalize(kernel, self.features)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=self.stride,
            padding=list(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", _kaiming_uniform_torch(fan_in), (self.features,))
            y = y + bias.astype(dtype)
        return y


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d on (B, T, C): out_len = (T-1)*stride - 2*pad + k.

    Implemented as an lhs-dilated conv with the flipped kernel — the exact
    transpose-conv equivalence, XLA lowers it to a single conv HLO.

    ``subpixel=True`` computes the SAME function (same parameters, so
    checkpoints/converters are unchanged) as one stride-1 conv producing
    stride*features channels followed by depth-to-space. The lhs-dilated
    form makes the MXU convolve a kernel of length k over an input that is
    (stride-1)/stride zeros; the subpixel form is a dense
    (taps*in) x (stride*out) matmul per frame — the standard TPU-friendly
    lowering for big-stride upsamplers (NSF-HiFiGAN Generator stages,
    k=2*stride).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    dtype: jnp.dtype | None = None
    subpixel: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch convT weight is (in, out, k); fan_in for init = out * k / groups?
        # torch uses kaiming_uniform on weight with fan_in = in_ch * k (dim 1,2
        # of (in,out,k)) — actually _calculate_fan_in_and_fan_out on (in,out,k)
        # gives fan_in = out*k; bias bound uses the same.
        fan_in = self.features * self.kernel_size
        kinit = _kaiming_uniform_torch(fan_in)
        kshape = (self.kernel_size, in_ch, self.features)  # (k, in, out), conv layout
        if self.weight_norm:
            # torch weight_norm(ConvTranspose1d) norms over dims (1,2) of
            # (in,out,k) i.e. per-input-channel: axis (0,2) in (k,in,out).
            v = self.param("kernel_v", kinit, kshape)
            norm = jnp.linalg.norm(v.transpose(1, 0, 2).reshape(in_ch, -1), axis=1)
            g = self.param("kernel_g", lambda rng: norm)
            kernel = v * (g / (norm + 1e-12))[None, :, None]
        else:
            kernel = self.param("kernel", kinit, kshape)
        dtype = self.dtype or x.dtype
        k, s, p = self.kernel_size, self.stride, self.padding
        if self.subpixel and s > 1:
            y = self._subpixel(x, kernel, dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                jnp.flip(kernel, 0).astype(dtype),
                window_strides=(1,),
                padding=[(k - 1 - p, k - 1 - p)],
                lhs_dilation=(s,),
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if self.use_bias:
            bias = self.param("bias", _kaiming_uniform_torch(fan_in), (self.features,))
            y = y + bias.astype(dtype)
        return y

    def _subpixel(self, x, kernel, dtype):
        """Equivalent subpixel form. Derivation: the transposed conv is
        y[q*s + r] = sum_i K[r + p + i*s] * x[q - i]  (K zero outside [0, k)),
        so each output phase r is a stride-1 correlation of x with the
        phase's subsampled taps; one conv emits all s phases as channel
        blocks and a reshape interleaves them."""
        t_in, in_ch = x.shape[1], x.shape[2]
        k, s, p, c = self.kernel_size, self.stride, self.padding, self.features
        i_max = (k - 1 - p) // s
        i_min = -((s - 1 + p) // s)
        n_t = i_max - i_min + 1
        # W[d, cin, r*c + cout] = K[r + p + (i_max - d)*s] (0 when outside)
        zero = jnp.zeros((in_ch, c), kernel.dtype)
        rows = []
        for d in range(n_t):
            i = i_max - d
            taps = []
            for r in range(s):
                j = r + p + i * s
                taps.append(kernel[j] if 0 <= j < k else zero)
            rows.append(jnp.concatenate(taps, axis=-1))  # (in, s*c)
        w = jnp.stack(rows, axis=0)  # (n_t, in, s*c)
        out_len = (t_in - 1) * s - 2 * p + k
        q_n = -(-out_len // s)  # ceil: interleaved frames needed
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=(1,),
            padding=[(i_max, q_n - t_in - i_min)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )  # (B, q_n, s*c)
        y = y.reshape(y.shape[0], q_n * s, c)
        return y[:, :out_len]


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d on (B, H, W, C):
    out = (in-1)*stride - 2*pad + k + output_padding per spatial dim.

    Same lhs-dilated-conv-with-flipped-kernel equivalence as ConvTranspose1d
    above (flax's nn.ConvTranspose does not flip the kernel and uses
    different padding arithmetic, so it cannot host converted torch
    weights). Kernel layout (kh, kw, in, out)."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    output_padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = self.features * kh * kw  # torch fan_in on (in,out,kh,kw)
        kshape = (kh, kw, in_ch, self.features)
        kernel = self.param("kernel", _kaiming_uniform_torch(fan_in), kshape)
        dtype = self.dtype or x.dtype
        (sh, sw) = self.stride
        (ph, pw) = self.padding
        (oh, ow) = self.output_padding
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            jnp.flip(kernel, (0, 1)).astype(dtype),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph + oh),
                     (kw - 1 - pw, kw - 1 - pw + ow)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", _kaiming_uniform_torch(fan_in),
                              (self.features,))
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module):
    """torch.nn.Linear-initialized dense layer (optionally weight-normed)."""

    features: int
    use_bias: bool = True
    weight_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kinit = _kaiming_uniform_torch(in_ch)
        if self.weight_norm:
            v = self.param("kernel_v", kinit, (in_ch, self.features))
            g = self.param("kernel_g", lambda rng: jnp.linalg.norm(v, axis=0))
            kernel = v * (g / (jnp.linalg.norm(v, axis=0) + 1e-12))
        else:
            kernel = self.param("kernel", kinit, (in_ch, self.features))
        dtype = self.dtype or x.dtype
        y = x.astype(dtype) @ kernel.astype(dtype)
        if self.use_bias:
            bias = self.param("bias", _kaiming_uniform_torch(in_ch), (self.features,))
            y = y + bias.astype(dtype)
        return y


class LayerNorm(nn.Module):
    """torch eps=1e-5 LayerNorm over the last axis."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm on (B, T, C) (normalizes over (T, C-within-group)).

    Streaming support: torch GroupNorm statistics span the whole time axis,
    so a time-sharded forward must reduce stats globally. Pass ``frame_mask``
    (B, T, 1; 1 = own frame, 0 = halo) and ``axis_name`` (the shard_map time
    axis): masked local sums are psum'd over the axis so every device
    normalizes with the exact global statistics.
    """

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, frame_mask=None, axis_name=None):
        b, t, c = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(b, t, g, c // g)
        if frame_mask is None and axis_name is None:
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.var(xg, axis=(1, 3), keepdims=True)
        else:
            m = (
                jnp.ones((b, t, 1, 1), x.dtype)
                if frame_mask is None
                else frame_mask.reshape(b, t, 1, 1).astype(x.dtype)
            )
            # two-pass (mean, then centered second moment): matches jnp.var's
            # formula, so streamed stats differ from the whole-utterance path
            # only by reduction order (ulp-level; see BASELINE.md contract)
            cnt = jnp.sum(m, axis=1, keepdims=True) * (c // g)
            s1 = jnp.sum(xg * m, axis=(1, 3), keepdims=True)
            if axis_name is not None:
                cnt = jax.lax.psum(cnt, axis_name)
                s1 = jax.lax.psum(s1, axis_name)
            mean = s1 / cnt
            d2 = jnp.sum((xg - mean) * (xg - mean) * m, axis=(1, 3), keepdims=True)
            if axis_name is not None:
                d2 = jax.lax.psum(d2, axis_name)
            var = d2 / cnt
        y = ((xg - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(b, t, c)
        return y * scale + bias


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, negative_slope * x)
