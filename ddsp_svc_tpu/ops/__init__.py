from .window import hann_window, sqrt_hann_window, bartlett_window
from .interp import upsample, remove_above_fmax, masked_avg_pool_1d, median_pool_1d
from .spectral import stft, istft, spectrogram, frame_signal, overlap_add
from .source import fast_source_gen, cumsum_phase_source, sine_gen
from .fir import (
    fft_convolve,
    frequency_filter,
    frequency_impulse_response,
    apply_window_to_impulse_response,
    apply_dynamic_window_to_impulse_response,
)
from .mel import mel_filterbank, LogMelSpectrogram
from .resample import resample as resample_audio
from .losses import sss_loss, rss_loss, RSSLoss, mel_snr, mel_si_snr, mel_psnr

__all__ = [
    "hann_window",
    "sqrt_hann_window",
    "bartlett_window",
    "upsample",
    "remove_above_fmax",
    "masked_avg_pool_1d",
    "median_pool_1d",
    "stft",
    "istft",
    "spectrogram",
    "frame_signal",
    "overlap_add",
    "fast_source_gen",
    "cumsum_phase_source",
    "sine_gen",
    "fft_convolve",
    "frequency_filter",
    "frequency_impulse_response",
    "apply_window_to_impulse_response",
    "apply_dynamic_window_to_impulse_response",
    "mel_filterbank",
    "LogMelSpectrogram",
    "resample_audio",
    "sss_loss",
    "rss_loss",
    "RSSLoss",
    "mel_snr",
    "mel_si_snr",
    "mel_psnr",
]
