"""Golden-value tests: excitation sources vs the reference torch formulas."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ddsp_svc_tpu.ops import fast_source_gen, cumsum_phase_source, sine_gen


def torch_fast_source_gen(f0_frames, sampling_rate, block_size):
    # CombSubSuperFast.fast_source_gen (ddsp/vocoder.py:639-651), torch golden
    n = torch.arange(block_size)
    s0 = f0_frames / sampling_rate
    ds0 = F.pad(s0[:, 1:, :] - s0[:, :-1, :], (0, 0, 0, 1))
    rad = s0 * (n + 1) + 0.5 * ds0 * n * (n + 1) / block_size
    s0 = s0 + ds0 * n / block_size
    rad2 = torch.fmod(rad[..., -1:].float() + 0.5, 1.0) - 0.5
    rad_acc = rad2.cumsum(dim=1).fmod(1.0).to(f0_frames)
    rad += F.pad(rad_acc[:, :-1, :], (0, 0, 1, 0))
    rad -= torch.round(rad)
    combtooth = torch.sinc(rad / (s0 + 1e-5)).reshape(f0_frames.shape[0], -1)
    phase_frames = 2 * np.pi * rad[:, :, :1]
    return combtooth, phase_frames


def _f0_track(b=2, t=40, seed=0):
    rng = np.random.default_rng(seed)
    f0 = 220.0 * 2 ** (rng.standard_normal((b, t, 1)).cumsum(1) * 0.01)
    f0[0, 5:9] = 0.0  # unvoiced run
    return f0.astype(np.float32)


def test_fast_source_gen_matches_torch():
    f0 = _f0_track()
    sr, block = 44100, 512
    ours_ct, ours_ph = fast_source_gen(jnp.asarray(f0), sr, block)
    gold_ct, gold_ph = torch_fast_source_gen(torch.from_numpy(f0), sr, block)
    # fp32 fmod/rounding order differs slightly between XLA and torch; the
    # sinc comb amplifies phase ULPs near zero-crossings — bound abs error.
    np.testing.assert_allclose(np.asarray(ours_ct), gold_ct.numpy(), rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ours_ph), gold_ph.numpy(), rtol=0, atol=2e-3)


def test_cumsum_phase_matches_torch_double():
    # the reference computes phase with a float64 cumsum at inference
    # (ddsp/vocoder.py:745); our f32 carry formulation must match it closely
    # even for long signals.
    f0 = np.full((1, 200, 1), 441.0, np.float32)
    f0 += np.random.default_rng(0).standard_normal(f0.shape).astype(np.float32)
    sr, block = 44100, 512
    f0_up = np.repeat(f0, block, axis=1)

    x_gold = torch.cumsum(torch.from_numpy(f0_up).double() / sr, dim=1)
    x_gold = x_gold - torch.round(x_gold)
    x_ours = np.asarray(cumsum_phase_source(jnp.asarray(f0_up), sr, block))

    # compare sinc-comb outputs (phase wraps can differ by one ULP near 0.5)
    ct_gold = torch.sinc(sr * x_gold.float() / torch.from_numpy(f0_up + 1e-3)).numpy()
    ct_ours = np.asarray(jnp.sinc(sr * jnp.asarray(x_ours) / jnp.asarray(f0_up + 1e-3)))
    err = np.abs(ct_gold - ct_ours)
    assert np.quantile(err, 0.999) < 5e-3, err.max()


def test_sine_gen_phase_continuity_and_shape():
    f0 = np.abs(_f0_track(1, 30, 1))
    out = sine_gen(
        jnp.asarray(f0[:, :, 0]), upp=512, sampling_rate=44100, n_harmonics=8,
        key=jax.random.PRNGKey(0), noise_std=0.0, sine_amp=1.0,
    )
    assert out.shape == (1, 30 * 512, 9)
    # fundamental must be a clean sine over voiced regions: check spectral purity
    seg = np.asarray(out[0, 10 * 512 : 20 * 512, 0])
    win = np.hanning(len(seg))
    spec = np.abs(np.fft.rfft(seg * win))
    peak = spec.max()
    assert peak > 0.2 * len(seg) / 4  # strong tone present
    # energy concentrated near the peak bin (no phase discontinuities)
    k = spec.argmax()
    side = np.concatenate([spec[: max(k - 20, 0)], spec[k + 21 :]])
    assert side.max() < 0.05 * peak
