"""Sequence-parallel streamed synthesis: overlap-save time blocks + ppermute
halo exchange, consistent with whole-utterance output.

This is the TPU-native replacement for the reference's sliding-window + SOLA
splicing (gui.py:393-456): instead of re-encoding a rolling context window
and hiding seams with cross-correlation splices, the utterance's time axis
is sharded over the mesh and every boundary quantity is exchanged explicitly
(SURVEY.md §2.9):

  - frame halos (48) for the Unit2Control conv stack + conv-only conformer
    (receptive field 47 frames), with ``edge_mask`` zeroing emulating the
    whole-utterance SAME-conv zero padding at the global edges;
  - GroupNorm statistics psum'd over the time axis (torch GroupNorm spans
    the whole sequence — see models/nn.py);
  - phase-accumulator carries as int32-quantized increments whose prefix
    sums are exactly associative, so blocked phases are bit-identical to the
    whole-utterance computation (ops/source.frame_phase_increments_q);
  - sample halos (3*hop + win/2) for the STFT/iSTFT overlap-add, with the
    global reflect padding (torch.stft center=True) reproduced at the edge
    devices;
  - noise generated per hop-block from split keys, so every device draws
    the identical samples the whole-utterance pass draws.

The consistency contract: interior arithmetic is identical op-for-op; the
only cross-device reductions (GroupNorm stats, int carries) are integer-
exact or differ from the single-device reduction only in float summation
order. ``tests/test_stream.py`` asserts whole-vs-blocked agreement.
"""
from __future__ import annotations

from .stream_core import (  # noqa: F401  (public toolkit re-exports)
    DENOISER_HALO,
    FRAME_HALO,
    WAVENET_HALO,
    VOCODER_HALO,
    _JITTED,
    _blocked_logmel,
    _cached_jit,
    _carry_prefix_offset,
    _frame_halo,
    _sample_halo_reflect,
    _sine_noise_from_keys,
    _sine_rand_ini,
    blocked_noise,
    blocked_noise_frames,
    blocked_uniform,
)
from .stream_combsub import (  # noqa: F401
    _combsub_block,
    _combsubfast_block,
    streamed_combsub_fast_forward,
    streamed_combsub_forward,
    whole_utterance_reference,
)
from .stream_legacy import (  # noqa: F401
    _blocked_fft_convolve,
    streamed_combsub_old_forward,
    streamed_sins_forward,
)
from .stream_cascade import (  # noqa: F401
    streamed_cascade_mel,
    streamed_unit2mel,
    streamed_unit2wav_new_mel,
    whole_cascade_reference,
    whole_unit2wav_new_reference,
)
from .stream_vocoder import (  # noqa: F401
    nsf_hifigan_padded_forward,
    streamed_nsf_hifigan,
)

def streamed_forward(model, variables, units, f0, volume, key, mesh,
                     axis: str = "time", mel=None, spk_id=None, **kwargs):
    """Dispatch time-sharded synthesis by model class.

    DDSP synths return audio; cascades return refined mel (pass ``mel``,
    the LogMelSpectrogram whose hop == block_size). Chain with
    streamed_nsf_hifigan for audio out of the cascades.
    """
    from ..models.cascade import ReflowUnit2Wav, Unit2Mel, Unit2Wav, Unit2WavFast
    from ..models.ddsp import CombSub, CombSubFast, CombSubSuperFast, Sins

    if isinstance(model, CombSubSuperFast):
        return streamed_combsub_forward(
            model, variables, units, f0, volume, key, spk_id=spk_id,
            mesh=mesh, axis=axis,
        )
    if isinstance(model, Sins):
        return streamed_sins_forward(
            model, variables, units, f0, volume, key, spk_id=spk_id,
            mesh=mesh, axis=axis, **kwargs,
        )
    if isinstance(model, CombSub):
        return streamed_combsub_old_forward(
            model, variables, units, f0, volume, key, spk_id=spk_id,
            mesh=mesh, axis=axis,
        )
    if isinstance(model, CombSubFast):
        return streamed_combsub_fast_forward(
            model, variables, units, f0, volume, key, spk_id=spk_id,
            mesh=mesh, axis=axis,
        )
    if isinstance(model, (Unit2WavFast, ReflowUnit2Wav)):
        family = "reflow" if isinstance(model, ReflowUnit2Wav) else "diffusion"
        return streamed_cascade_mel(
            model, variables, units, f0, volume, key, mel, spk_id=spk_id,
            mesh=mesh, axis=axis, family=family, **kwargs,
        )
    if isinstance(model, Unit2Wav):
        return streamed_unit2wav_new_mel(
            model, variables, units, f0, volume, key, mel, spk_id=spk_id,
            mesh=mesh, axis=axis, **kwargs,
        )
    if isinstance(model, Unit2Mel):
        return streamed_unit2mel(
            model, variables, units, f0, volume,
            kwargs.pop("gt_spec", None), key, spk_id=spk_id, mesh=mesh,
            axis=axis, **kwargs,
        )
    raise NotImplementedError(type(model).__name__)
