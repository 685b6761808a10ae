"""Golden-value tests: LTV-FIR frequency filtering vs torch reference formulas."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ddsp_svc_tpu.ops import (
    fft_convolve,
    frequency_filter,
    frequency_impulse_response,
    apply_window_to_impulse_response,
)


def torch_fft_convolve(audio, impulse_response):
    # ddsp/core.py:120-182 torch golden (fft_size = frame + ir - 1, not pow2;
    # the pow2 padding our implementation uses is numerically equivalent)
    if impulse_response.dim() == 2:
        impulse_response = impulse_response.unsqueeze(1)
    batch_size_ir, n_ir_frames, ir_size = impulse_response.size()
    batch_size, audio_size = audio.size()
    hop_size = int(audio_size / n_ir_frames)
    frame_size = 2 * hop_size
    audio_frames = F.pad(audio, (hop_size, hop_size)).unfold(1, frame_size, hop_size)
    window = torch.bartlett_window(frame_size).to(audio_frames)
    audio_frames = audio_frames * window
    fft_size = ir_size + frame_size - 1
    audio_fft = torch.fft.rfft(audio_frames, fft_size)
    ir_fft = torch.fft.rfft(
        torch.cat((impulse_response, impulse_response[:, -1:, :]), 1), fft_size
    )
    audio_frames_out = torch.fft.irfft(audio_fft * ir_fft, fft_size)
    batch_size, n_audio_frames, frame_size_out = audio_frames_out.size()
    fold = torch.nn.Fold(
        output_size=(1, (n_audio_frames - 1) * hop_size + frame_size_out),
        kernel_size=(1, frame_size_out),
        stride=(1, hop_size),
    )
    output_signal = fold(audio_frames_out.transpose(1, 2)).squeeze(1).squeeze(1)
    output_signal = output_signal[:, hop_size:]
    total = output_signal.shape[-1]
    crop = total - audio_size
    start = ir_size // 2
    end = crop - start
    return output_signal[:, start:-end]


def test_fft_convolve_ltv_matches_torch():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 4096)).astype(np.float32)
    ir = rng.standard_normal((2, 8, 510)).astype(np.float32) * 0.1
    ours = np.asarray(fft_convolve(jnp.asarray(audio), jnp.asarray(ir)))
    gold = torch_fft_convolve(torch.from_numpy(audio), torch.from_numpy(ir)).numpy()
    assert ours.shape == gold.shape
    np.testing.assert_allclose(ours, gold, rtol=1e-3, atol=1e-3)


def test_fft_convolve_lti_identity():
    # delta IR (peak at center) should reproduce the input
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((1, 2048)).astype(np.float32)
    ir = np.zeros((1, 64), np.float32)
    ir[0, 32] = 1.0  # center (group delay = ir_size//2 compensated)
    out = np.asarray(fft_convolve(jnp.asarray(audio), jnp.asarray(ir)))
    np.testing.assert_allclose(out, audio, rtol=1e-4, atol=1e-4)


def torch_apply_window_to_ir(impulse_response, window_size=0, causal=False):
    # ddsp/core.py:185-237 torch golden (padding==0 branch is the one used)
    ir_size = int(impulse_response.size(-1))
    if (window_size <= 0) or (window_size > ir_size):
        window_size = ir_size
    window = torch.hann_window(window_size)
    padding = ir_size - window_size
    if padding == 0:
        window = window.roll(window.size(-1) // 2, -1)
    impulse_response = impulse_response * window.unsqueeze(0)
    if padding == 0:
        impulse_response = impulse_response.roll(impulse_response.size(-1) // 2, -1)
    return impulse_response


def test_apply_window_to_ir_matches_torch():
    rng = np.random.default_rng(2)
    ir = rng.standard_normal((3, 128)).astype(np.float32)
    ours = np.asarray(apply_window_to_impulse_response(jnp.asarray(ir)))
    gold = torch_apply_window_to_ir(torch.from_numpy(ir)).numpy()
    np.testing.assert_allclose(ours, gold, rtol=1e-5, atol=1e-6)


def test_frequency_filter_matches_torch_complex_response():
    # Sins group-delay all-pass path: complex magnitudes, hann_window=False
    rng = np.random.default_rng(3)
    audio = rng.standard_normal((1, 4096)).astype(np.float32)
    gd = np.tanh(rng.standard_normal((1, 8, 128)).astype(np.float32)) * np.pi
    mags = np.exp(1j * np.cumsum(gd, axis=-1)).astype(np.complex64)

    ours = np.asarray(
        frequency_filter(jnp.asarray(audio), jnp.asarray(mags), hann_window_flag=False)
    )

    ir_t = torch.fft.irfft(torch.from_numpy(mags))
    ir_t = ir_t.roll(ir_t.size(-1) // 2, -1)
    gold = torch_fft_convolve(torch.from_numpy(audio), ir_t).numpy()
    np.testing.assert_allclose(ours, gold, rtol=1e-3, atol=1e-3)


def test_frequency_impulse_response_real_hann():
    rng = np.random.default_rng(4)
    mags = rng.random((1, 4, 65)).astype(np.float32)
    ours = np.asarray(frequency_impulse_response(jnp.asarray(mags) + 0j))
    ir_t = torch.fft.irfft(torch.from_numpy(mags))
    gold = torch_apply_window_to_ir(ir_t).numpy()
    np.testing.assert_allclose(ours, gold, rtol=1e-4, atol=1e-5)
