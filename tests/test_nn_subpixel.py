"""Subpixel transposed conv (models/nn.py ConvTranspose1d.subpixel): the
matmul + depth-to-space lowering must compute exactly the transposed-conv
function for the same parameters (reference semantics:
torch.nn.ConvTranspose1d, nsf_hifigan/models.py:222-232 upsample stages)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.models.nn import ConvTranspose1d


@pytest.mark.parametrize(
    "k,s,p",
    [
        (16, 8, 4),  # NSF-HiFiGAN stages 0-1 (k = 2*stride)
        (4, 2, 1),   # stages 2-4
        (3, 2, 0),   # out_len not a multiple of stride (tail trim)
        (7, 3, 2),
        (5, 4, 3),   # padding >= stride-1 (negative phase offsets)
        (10, 5, 1),
    ],
)
@pytest.mark.parametrize("weight_norm", [False, True])
def test_subpixel_matches_dilated(k, s, p, weight_norm):
    rng = np.random.default_rng(k * 100 + s * 10 + p)
    x = jnp.asarray(rng.standard_normal((2, 14, 6)), jnp.float32)
    ref = ConvTranspose1d(5, k, stride=s, padding=p, weight_norm=weight_norm)
    sub = ConvTranspose1d(5, k, stride=s, padding=p, weight_norm=weight_norm,
                          subpixel=True)
    params = ref.init(jax.random.PRNGKey(0), x)
    a = ref.apply(params, x)
    b = sub.apply(params, x)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_generator_subpixel_matches_dilated():
    """Full Generator forward: subpixel_upsample=True equals the
    lhs-dilated form (the default) on the same params."""
    from ddsp_svc_tpu.models.nsf_hifigan import Generator

    kw = dict(
        sampling_rate=16000, num_mels=16,
        upsample_rates=(8, 4, 2), upsample_kernel_sizes=(16, 8, 4),
        upsample_initial_channel=16, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    gen_sub = Generator(**kw, subpixel_upsample=True)
    gen_ref = Generator(**kw, subpixel_upsample=False)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 12, 16)), jnp.float32
    )
    f0 = 220.0 * jnp.ones((1, 12), jnp.float32)
    variables = gen_sub.init(
        {"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)},
        mel, f0,
    )
    key = jax.random.PRNGKey(9)
    a = gen_sub.apply(variables, mel, f0, key=key)
    b = gen_ref.apply(variables, mel, f0, key=key)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
