"""Golden test: JAX CFNaiveMelPE (features/fcpe.py) vs a torch mirror.

The torchfcpe wheel is not in-image, but its encoder is the very module the
reference vendors at diffusion/model_conformer_naive.py (same author), so
the torch side here is: that reference ConformerNaiveEncoder + the published
CFNaiveMelPE input stack / head (Conv-GroupNorm-LeakyReLU-Conv, LayerNorm,
weight-norm Linear, sigmoid). Weights flow through convert/fcpe.py — the
same path a real torchfcpe checkpoint takes.
"""
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ddsp_svc_tpu.convert.fcpe import convert_fcpe_state_dict
from ddsp_svc_tpu.features.fcpe import CFNaiveMelPE, local_argmax_f0

REF = "/root/reference"

HIDDEN, LAYERS, HEADS, BINS = 64, 2, 8, 360


def _torch_mirror():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from diffusion.model_conformer_naive import ConformerNaiveEncoder

    class TorchCFNaiveMelPE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.input_stack = torch.nn.Sequential(
                torch.nn.Conv1d(128, HIDDEN, 3, 1, 1),
                torch.nn.GroupNorm(4, HIDDEN),
                torch.nn.LeakyReLU(),
                torch.nn.Conv1d(HIDDEN, HIDDEN, 3, 1, 1),
            )
            self.net = ConformerNaiveEncoder(
                num_layers=LAYERS, num_heads=HEADS, dim_model=HIDDEN,
                use_norm=False, conv_only=True,
            )
            self.norm = torch.nn.LayerNorm(HIDDEN)
            self.output_proj = torch.nn.utils.weight_norm(
                torch.nn.Linear(HIDDEN, BINS)
            )

        def forward(self, mel):
            x = self.input_stack(mel.transpose(-1, -2)).transpose(-1, -2)
            x = self.net(x)
            x = self.norm(x)
            x = self.output_proj(x)
            return torch.sigmoid(x)

    return TorchCFNaiveMelPE()


def test_fcpe_forward_golden():
    torch.manual_seed(0)
    ref = _torch_mirror().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_fcpe_state_dict(sd)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 48, 128)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel)).numpy()

    net = CFNaiveMelPE(hidden=HIDDEN, out_dims=BINS, n_layers=LAYERS,
                       n_heads=HEADS)
    got = np.asarray(net.apply(variables, jnp.asarray(mel)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_local_argmax_decode_matches_torch():
    """numpy decode == the torchfcpe latent2cents_local_decoder math."""
    from ddsp_svc_tpu.features.fcpe import N_BINS, cent_table

    rng = np.random.default_rng(2)
    probs = rng.random((40, N_BINS)).astype(np.float32) * 0.5
    probs[5] *= 0.01  # an unvoiced frame (peak below threshold)

    y = torch.from_numpy(probs)[None]
    ci = torch.from_numpy(cent_table())[None, None, :].expand(1, 40, -1)
    confident, max_index = torch.max(y, dim=-1, keepdim=True)
    local_idx = torch.clamp(
        torch.arange(9) - 4 + max_index, 0, N_BINS - 1
    )
    ci_l = torch.gather(ci, -1, local_idx)
    y_l = torch.gather(y, -1, local_idx)
    cents = torch.sum(ci_l * y_l, -1, keepdim=True) / torch.sum(
        y_l, -1, keepdim=True
    )
    mask = torch.ones_like(cents)
    mask[confident <= 0.006] = float("-inf")
    want = (10.0 * 2.0 ** (cents * mask / 1200.0)).squeeze().numpy()

    got = local_argmax_f0(probs, threshold=0.006)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got[5] == 0.0


def test_fcpe_extractor_end_to_end():
    """F0Extractor('fcpe', model_params=...) runs wheel-free on the synth hop
    grid and tracks a clean tone to within a few semitones even at random
    init scale (smoke: framing/regrid contract, not accuracy)."""
    from ddsp_svc_tpu.features.f0 import F0Extractor
    import jax

    net = CFNaiveMelPE()
    mel = jnp.zeros((1, 8, 128))
    variables = net.init(jax.random.PRNGKey(0), mel)
    ex = F0Extractor("fcpe", sample_rate=44100, hop_size=512,
                     model_params=variables)
    sr = 44100
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    f0 = ex.extract(audio, uv_interp=True)
    assert f0.shape == (len(audio) // 512 + 1,)
    assert np.isfinite(f0).all() and (f0 > 0).all()
