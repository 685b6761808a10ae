"""CREPE port: shapes, decode math, converter structure, F0Extractor path."""
import numpy as np

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.features.crepe import (
    CENTS_OFFSET,
    N_BINS,
    Crepe,
    CrepeInfer,
    weighted_argmax_f0,
)


def test_model_shapes():
    model = Crepe()
    frames = jnp.zeros((3, 1024))
    v = model.init(jax.random.PRNGKey(0), frames)
    out = model.apply(v, frames)
    assert out.shape == (3, N_BINS)
    assert ((np.asarray(out) >= 0) & (np.asarray(out) <= 1)).all()


def test_weighted_argmax_decode():
    sal = np.zeros((4, N_BINS), np.float32)
    k = 120
    sal[:, k] = 0.9
    f0, pd = weighted_argmax_f0(sal)
    np.testing.assert_allclose(f0, 10 * 2 ** ((20 * k + CENTS_OFFSET) / 1200),
                               rtol=1e-4)
    np.testing.assert_allclose(pd, 0.9)


def test_infer_grid():
    infer = CrepeInfer()
    f0, pd = infer.infer_from_audio(np.zeros(16000, np.float32), 16000)
    assert f0.shape == pd.shape == (16000 // 80 + 1,)


def test_converter_structure():
    from ddsp_svc_tpu.convert.common import check_tree_shapes
    from ddsp_svc_tpu.convert.crepe import convert_crepe_state_dict
    from ddsp_svc_tpu.features.crepe import FULL_CHANNELS

    rng = np.random.default_rng(0)

    def rand(s):
        return rng.standard_normal(s).astype(np.float32)

    sd = {}
    cin = 1
    for i, ch in enumerate(FULL_CHANNELS, start=1):
        k = 512 if i == 1 else 64
        sd[f"conv{i}.weight"] = rand((ch, cin, k, 1))
        sd[f"conv{i}.bias"] = rand((ch,))
        for n in ("weight", "bias", "running_mean"):
            sd[f"conv{i}_BN.{n}"] = rand((ch,))
        sd[f"conv{i}_BN.running_var"] = np.abs(rand((ch,))) + 0.5
        cin = ch
    sd["classifier.weight"] = rand((N_BINS, 2048))
    sd["classifier.bias"] = rand((N_BINS,))

    converted = convert_crepe_state_dict(sd)
    template = Crepe().init(jax.random.PRNGKey(0), jnp.zeros((1, 1024)))
    problems = check_tree_shapes(converted, jax.device_get(template))
    assert not problems, problems[:10]


def test_f0_extractor_crepe_path():
    from ddsp_svc_tpu.features.crepe import WINDOW_SIZE, Crepe
    from ddsp_svc_tpu.features.f0 import F0Extractor

    sr, hop = 16000, 160
    # explicit (random) weights exercise the crepe path; without weights
    # the extractor must NOT run a random net (see fallback test below)
    params = Crepe().init(jax.random.PRNGKey(0), jnp.zeros((1, WINDOW_SIZE)))
    fx = F0Extractor("crepe", sr, hop, model_params=params)
    assert fx.f0_extractor == "crepe"
    audio = 0.4 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    f0 = fx.extract(audio, uv_interp=True)
    assert f0.shape == (len(audio) // hop + 1,)
    assert np.isfinite(f0).all() and (f0 >= fx.f0_min).all()


def test_f0_extractor_no_weights_falls_back_to_yin():
    """Pretrained-net extractors must never run at random init: without
    converted weights the extractor degrades to the built-in YIN."""
    from ddsp_svc_tpu.features.f0 import F0Extractor

    sr, hop = 16000, 160
    fx = F0Extractor("crepe", sr, hop)  # no weights in this image
    assert fx.f0_extractor == "yin"
    audio = 0.4 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    f0 = fx.extract(audio, uv_interp=True)
    voiced = f0[5:-5]
    cents = 1200 * np.abs(np.log2(voiced / 220.0))
    assert np.median(cents) < 10  # actually tracks (a random net would not)
