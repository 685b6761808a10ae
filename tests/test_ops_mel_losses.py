"""Tests: mel front-end (STFT part vs torch golden), filterbank invariants,
spectral losses, resample quality."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from ddsp_svc_tpu.ops import (
    LogMelSpectrogram,
    mel_filterbank,
    sss_loss,
    RSSLoss,
    mel_snr,
    mel_si_snr,
    mel_psnr,
    resample_audio,
)


def torch_get_mel(y, mel_basis, n_fft=2048, win_size=2048, hop=512, keyshift=0, speed=1,
                  clip_val=1e-5):
    # nvSTFT.get_mel (nsf_hifigan/nvSTFT.py:73-117) torch golden, mel basis injected
    factor = 2 ** (keyshift / 12)
    n_fft_new = int(np.round(n_fft * factor))
    win_size_new = int(np.round(win_size * factor))
    hop_new = int(np.round(hop * speed))
    window = torch.hann_window(win_size_new)
    pad_left = (win_size_new - hop_new) // 2
    pad_right = max((win_size_new - hop_new + 1) // 2, win_size_new - y.size(-1) - pad_left)
    mode = "reflect" if pad_right < y.size(-1) else "constant"
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad_left, pad_right), mode=mode).squeeze(1)
    spec = torch.stft(
        y, n_fft_new, hop_length=hop_new, win_length=win_size_new, window=window,
        center=False, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    spec = torch.sqrt(spec.real.pow(2) + spec.imag.pow(2) + 1e-9)
    if keyshift != 0:
        size = n_fft // 2 + 1
        resize = spec.size(1)
        if resize < size:
            spec = torch.nn.functional.pad(spec, (0, 0, 0, size - resize))
        spec = spec[:, :size, :] * win_size / win_size_new
    spec = torch.matmul(torch.from_numpy(mel_basis), spec)
    return torch.log(torch.clamp(spec, min=clip_val))


def test_logmel_matches_torch_stft_path():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 44100)).astype(np.float32) * 0.3
    mel = LogMelSpectrogram()
    basis = np.asarray(mel.mel_basis)
    for keyshift in (0, 3):
        ours = np.asarray(mel(jnp.asarray(x), keyshift=keyshift))
        gold = torch_get_mel(torch.from_numpy(x), basis, keyshift=keyshift).numpy()
        assert ours.shape == gold.shape
        np.testing.assert_allclose(ours, gold, rtol=1e-3, atol=2e-3)


def test_mel_filterbank_invariants():
    fb = mel_filterbank(44100, 2048, 128, 40.0, 16000.0)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    # every filter has support, triangles peak within the band
    assert (fb.max(axis=1) > 0).all()
    # slaney normalization: peak of filter m ~ 2/(width in Hz)
    freqs = np.linspace(0, 22050, 1025)
    centers = freqs[fb.argmax(axis=1)]
    assert centers[0] < 100 and centers[-1] > 14000
    assert (np.diff(centers) > 0).all()


def test_sss_loss_matches_torch():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((2, 4000)).astype(np.float32)
    b = (a + 0.1 * rng.standard_normal((2, 4000))).astype(np.float32)
    n_fft = 512

    w = torch.hann_window(n_fft)
    def tspec(x):
        s = torch.stft(torch.from_numpy(x), n_fft, hop_length=n_fft, window=w,
                       center=False, return_complex=True).abs()
        return s / w.pow(2).sum().sqrt() + 1e-7
    st, sp = tspec(a), tspec(b)
    converge = torch.mean(
        torch.linalg.norm(st - sp, dim=(1, 2)) / torch.linalg.norm(st + sp, dim=(1, 2))
    )
    log_term = torch.nn.functional.l1_loss(st.log(), sp.log())
    gold = (converge + log_term).item()

    ours = float(sss_loss(jnp.asarray(a), jnp.asarray(b), n_fft))
    np.testing.assert_allclose(ours, gold, rtol=1e-3)


def test_rss_loss_runs_and_is_positive():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    loss_fn = RSSLoss(256, 2048, n_scale=4)
    v1 = float(loss_fn(a, b, jax.random.PRNGKey(0)))
    v0 = float(loss_fn(a, a, jax.random.PRNGKey(0)))
    assert v1 > v0 >= 0.0
    # jit-compatible
    jitted = jax.jit(lambda x, y, k: loss_fn(x, y, k))
    v2 = float(jitted(a, b, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)


def test_mel_metrics_match_torch():
    rng = np.random.default_rng(3)
    gt = rng.standard_normal((4, 100, 128)).astype(np.float32)
    pred = (gt + 0.1 * rng.standard_normal(gt.shape)).astype(np.float32)
    gtt, predt = torch.from_numpy(gt), torch.from_numpy(pred)

    snr_gold = (10 * torch.log10(gtt.pow(2).mean() / (gtt - predt).var())).item()
    np.testing.assert_allclose(float(mel_snr(jnp.asarray(gt), jnp.asarray(pred))),
                               snr_gold, rtol=1e-4)
    scale = (gtt * predt).sum() / gtt.pow(2).sum()
    sisnr_gold = (10 * torch.log10(gtt.pow(2).mean() / (gtt - scale * predt).var())).item()
    np.testing.assert_allclose(float(mel_si_snr(jnp.asarray(gt), jnp.asarray(pred))),
                               sisnr_gold, rtol=1e-4)
    psnr_gold = (10 * torch.log10(gtt.max() ** 2 / (gtt - predt).pow(2).mean())).item()
    np.testing.assert_allclose(float(mel_psnr(jnp.asarray(gt), jnp.asarray(pred))),
                               psnr_gold, rtol=1e-4)


def test_resample_sine_preservation():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
    y = np.asarray(resample_audio(jnp.asarray(x), sr_in, sr_out))
    assert y.shape[1] == int(np.ceil(sr_out * x.shape[1] / sr_in))
    # compare against an ideal sine at the new rate (ignore filter edges)
    t2 = np.arange(y.shape[1]) / sr_out
    ref = np.sin(2 * np.pi * 440.0 * t2)
    seg = slice(2000, y.shape[1] - 2000)
    err = y[0, seg] - ref[seg]
    snr = 10 * np.log10(np.mean(ref[seg] ** 2) / np.mean(err**2))
    assert snr > 40.0, snr


def test_resample_block_matmul_vs_direct_conv():
    """Regression pin for the r4 block-matmul polyphase rewrite (ADVICE r4):
    resample() must equal the direct torchaudio formulation — pad
    (width, width + orig), stride-`orig` conv with the (new, kernel_len)
    phase bank, interleave, crop to ceil(new*L/orig) — across rate pairs
    and odd lengths."""
    import math

    from ddsp_svc_tpu.ops.resample import _sinc_resample_kernel

    def direct(x, orig_freq, new_freq):
        kernels, width, orig, new = _sinc_resample_kernel(orig_freq, new_freq)
        k = kernels[:, 0, :].astype(np.float64)  # (new, kernel_len)
        b, length = x.shape
        xp = np.pad(x.astype(np.float64), ((0, 0), (width, width + orig)))
        frames = length // orig + 1
        out = np.zeros((b, frames, new))
        for f in range(frames):
            out[:, f] = xp[:, f * orig:f * orig + k.shape[1]] @ k.T
        y = out.reshape(b, -1)
        return y[:, : int(math.ceil(new * length / orig))]

    rng = np.random.default_rng(11)
    for sr_in, sr_out in [(44100, 16000), (16000, 44100), (44100, 48000),
                          (32000, 16000), (24000, 44100)]:
        for length in (4096, 4410 + 7):
            x = rng.standard_normal((2, length)).astype(np.float32)
            got = np.asarray(resample_audio(jnp.asarray(x), sr_in, sr_out))
            want = direct(x, sr_in, sr_out)
            assert got.shape == want.shape, (sr_in, sr_out, length)
            denom = np.max(np.abs(want)) or 1.0
            rel = np.max(np.abs(got - want)) / denom
            assert rel < 1e-5, (sr_in, sr_out, length, rel)
