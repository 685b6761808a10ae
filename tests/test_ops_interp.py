"""Golden-value tests: interpolation ops vs torch reference semantics."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ddsp_svc_tpu.ops import upsample, remove_above_fmax, masked_avg_pool_1d, median_pool_1d


def torch_upsample(signal, factor):
    # ddsp/core.py:66-70 semantics, executed with torch as golden
    signal = signal.permute(0, 2, 1)
    signal = F.interpolate(
        torch.cat((signal, signal[:, :, -1:]), 2),
        size=signal.shape[-1] * factor + 1,
        mode="linear",
        align_corners=True,
    )
    signal = signal[:, :, :-1]
    return signal.permute(0, 2, 1)


def test_upsample_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 17, 3)).astype(np.float32)
    for factor in (4, 512):
        ours = np.asarray(upsample(jnp.asarray(x), factor))
        golden = torch_upsample(torch.from_numpy(x), factor).numpy()
        np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_remove_above_fmax():
    rng = np.random.default_rng(1)
    amp = rng.random((2, 5, 8)).astype(np.float32)
    pitch = (200 + 400 * rng.random((2, 5, 1))).astype(np.float32)
    fmax = 22050 / 2

    ours = np.asarray(remove_above_fmax(jnp.asarray(amp), jnp.asarray(pitch), fmax))
    n_harm = amp.shape[-1]
    pitches = pitch * np.arange(1, n_harm + 1)
    golden = amp * ((pitches < fmax).astype(np.float32) + 1e-7)
    np.testing.assert_allclose(ours, golden, rtol=1e-6)


def test_masked_avg_pool_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 40)).astype(np.float32)
    x[0, 5:9] = np.nan
    x[1, 0] = np.nan
    k = 4

    xt = torch.from_numpy(x).unsqueeze(1)
    xt = F.pad(xt, ((k - 1) // 2, k // 2), mode="reflect")
    mask = ~torch.isnan(xt)
    masked = torch.where(mask, xt, torch.zeros_like(xt))
    ones = torch.ones(1, 1, k)
    s = F.conv1d(masked, ones)
    c = F.conv1d(mask.float(), ones).clamp(min=1)
    golden = (s / c).squeeze(1).numpy()

    ours = np.asarray(masked_avg_pool_1d(jnp.asarray(x), k))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


def test_median_pool_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 33)).astype(np.float32)
    k = 4
    xt = torch.from_numpy(x).unsqueeze(1)
    xt = F.pad(xt, ((k - 1) // 2, k // 2), mode="reflect").squeeze(1)
    win = xt.unfold(1, k, 1)
    golden = torch.sort(win, dim=-1)[0][:, :, (k - 1) // 2].numpy()
    ours = np.asarray(median_pool_1d(jnp.asarray(x), k))
    np.testing.assert_allclose(ours, golden, rtol=1e-6)
