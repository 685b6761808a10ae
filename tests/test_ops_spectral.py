"""Golden-value tests: STFT / iSTFT / spectrogram vs torch.stft/istft."""
import numpy as np
import jax.numpy as jnp
import torch

from ddsp_svc_tpu.ops import stft, istft, spectrogram, overlap_add
from ddsp_svc_tpu.ops.window import hann_window, bartlett_window


def test_hann_window_matches_torch():
    for n in (16, 255, 2048):
        np.testing.assert_allclose(
            hann_window(n), torch.hann_window(n).numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            bartlett_window(n), torch.bartlett_window(n).numpy(), rtol=1e-5, atol=1e-6
        )


def test_stft_matches_torch_center_reflect():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    n_fft, hop = 2048, 512
    golden = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        return_complex=True,
        pad_mode="reflect",
    ).numpy()
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=2e-3)


def test_stft_matches_torch_center_constant_small():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 512)).astype(np.float32)
    n_fft, hop = 2048, 512
    golden = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        return_complex=True,
        pad_mode="constant",
    ).numpy()
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, pad_mode="constant"))
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=2e-3)


def test_istft_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    n_fft, hop = 2048, 512
    spec_t = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        return_complex=True,
    )
    golden = torch.istft(
        spec_t, n_fft=n_fft, hop_length=hop, window=torch.hann_window(n_fft), center=True
    ).numpy()
    ours = np.asarray(istft(jnp.asarray(spec_t.numpy()), n_fft, hop))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=2e-3)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 512 * 16)).astype(np.float32)
    spec = stft(jnp.asarray(x), 2048, 512)
    y = np.asarray(istft(spec, 2048, 512))
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-4)


def test_spectrogram_matches_torch_normalized():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3000)).astype(np.float32)
    n_fft = 512
    w = torch.hann_window(n_fft)
    golden = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=n_fft,
        window=w,
        center=False,
        return_complex=True,
    ).abs() / w.pow(2).sum().sqrt()
    ours = np.asarray(spectrogram(jnp.asarray(x), n_fft, n_fft))
    np.testing.assert_allclose(ours, golden.numpy(), rtol=1e-3, atol=1e-4)


def test_overlap_add_general_matches_shifted():
    rng = np.random.default_rng(5)
    frames = rng.standard_normal((2, 7, 64)).astype(np.float32)
    a = np.asarray(overlap_add(jnp.asarray(frames), 16))  # divisible path
    # brute force
    out = np.zeros((2, 6 * 16 + 64), np.float32)
    for t in range(7):
        out[:, t * 16 : t * 16 + 64] += frames[:, t]
    np.testing.assert_allclose(a, out, rtol=1e-5, atol=1e-5)
    # non-divisible path
    b = np.asarray(overlap_add(jnp.asarray(frames), 48))
    out2 = np.zeros((2, 6 * 48 + 64), np.float32)
    for t in range(7):
        out2[:, t * 48 : t * 48 + 64] += frames[:, t]
    np.testing.assert_allclose(b, out2, rtol=1e-5, atol=1e-5)
