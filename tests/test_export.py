"""StableHLO export CLI: serialize, deserialize, and re-execute."""
import numpy as np

import jax
import jax.numpy as jnp


def test_export_roundtrip(tmp_path):
    from ddsp_svc_tpu.cli.export import main
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
    from ddsp_svc_tpu.train.checkpoint import save_checkpoint
    from ddsp_svc_tpu.utils.config import save_config

    # a tiny checkpointed model + sibling config (load_model contract)
    model = CombSubSuperFast(16000, 64, 256, n_unit=8, n_spk=1)
    t = 16
    units = jnp.zeros((1, t, 8))
    f0 = 220.0 * jnp.ones((1, t, 1))
    vol = jnp.ones((1, t, 1))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        units, f0, vol,
    )["params"]
    save_checkpoint(str(tmp_path), 7, jax.device_get(params))
    save_config(
        tmp_path / "config.yaml",
        {
            "data": {
                "sampling_rate": 16000, "block_size": 64, "duration": 2,
                "encoder_out_channels": 8,
            },
            "model": {"type": "CombSubSuperFast", "win_length": 256, "n_spk": 1},
        },
    )

    out = tmp_path / "model.stablehlo"
    main(["-m", str(tmp_path / "model_7.ckpt"), "-o", str(out),
          "--seconds", "0.1"])
    assert out.exists() and out.stat().st_size > 0

    from jax import export as jexport

    with open(out, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    t2 = int(0.1 * 16000) // 64
    sig = exp.call(
        params,
        jnp.zeros((1, t2, 8), jnp.float32),
        220.0 * jnp.ones((1, t2, 1), jnp.float32),
        jnp.ones((1, t2, 1), jnp.float32),
        jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((2,), jnp.uint32),
    )
    assert np.isfinite(np.asarray(sig)).all()
    assert np.asarray(sig).shape == (1, t2 * 64)


def test_export_roundtrip_diffusion(tmp_path):
    """The non-ddsp branch: a tiny Unit2Mel (Diffusion family) exports and
    re-executes — samples a mel from gt_spec-conditioned shallow diffusion."""
    from ddsp_svc_tpu.cli.export import main
    from ddsp_svc_tpu.models.cascade import Unit2Mel
    from ddsp_svc_tpu.train.checkpoint import save_checkpoint
    from ddsp_svc_tpu.utils.config import save_config

    n_unit, t = 8, 8
    model = Unit2Mel(n_unit, 1, False, 16, n_layers=2, n_chans=8, n_hidden=8,
                     k_step_max=10)
    units = jnp.zeros((1, t, n_unit))
    f0 = 220.0 * jnp.ones((1, t, 1))
    vol = jnp.ones((1, t, 1))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        units, f0, vol, gt_spec=jnp.zeros((1, t, 16)), infer=False,
    )["params"]
    save_checkpoint(str(tmp_path), 3, jax.device_get(params))
    save_config(
        tmp_path / "config.yaml",
        {
            "data": {
                "sampling_rate": 16000, "block_size": 64, "duration": 2,
                "encoder_out_channels": n_unit,
            },
            "model": {"type": "Diffusion", "n_spk": 1,
                      "use_pitch_aug": False, "n_layers": 2, "n_chans": 8,
                      "n_hidden": 8, "k_step_max": 10, "out_dims": 16},
        },
    )

    out = tmp_path / "model.stablehlo"
    main(["-m", str(tmp_path / "model_3.ckpt"), "-o", str(out),
          "--seconds", str(8 * 64 / 16000)])
    assert out.exists() and out.stat().st_size > 0

    from jax import export as jexport

    with open(out, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    gt = jax.random.normal(jax.random.PRNGKey(5), (1, t, 16), jnp.float32)
    mel = exp.call(
        params,
        jnp.zeros((1, t, n_unit), jnp.float32),
        220.0 * jnp.ones((1, t, 1), jnp.float32),
        jnp.ones((1, t, 1), jnp.float32),
        jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((2,), jnp.uint32),
        gt,  # Unit2Mel's shallow-start input mel is a REAL export argument
    )
    assert np.isfinite(np.asarray(mel)).all()


def test_export_cascade_matches_direct_forward(tmp_path):
    """Regression: exported cascades must carry the mel extractor inside
    the graph — an earlier export substituted gt_spec=zeros for the DDSP
    mel, so the artifact denoised around silence and diverged from
    cli/infer on the same checkpoint."""
    from ddsp_svc_tpu.cli.common import build_mel_extractor
    from ddsp_svc_tpu.cli.export import main
    from ddsp_svc_tpu.models.cascade import Unit2WavFast
    from ddsp_svc_tpu.train.checkpoint import save_checkpoint
    from ddsp_svc_tpu.utils.config import load_config, save_config

    n_unit, t = 8, 8
    m = 128  # the CLI mel extractor emits 128 mels
    sr, hop = 16000, 64
    model = Unit2WavFast(sr, hop, 256, n_unit, 1, out_dims=m, n_layers=2,
                         n_chans=8, k_step_max=10)
    save_config(
        tmp_path / "config.yaml",
        {
            "data": {"sampling_rate": sr, "block_size": hop, "duration": 2,
                     "encoder_out_channels": n_unit},
            "model": {"type": "DiffusionFast", "n_spk": 1,
                      "use_pitch_aug": False, "n_layers": 2, "n_chans": 8,
                      "k_step_max": 10, "out_dims": m, "win_length": 256},
        },
    )
    mel_x = build_mel_extractor(load_config(str(tmp_path / "config.yaml")))
    units = jnp.zeros((1, t, n_unit))
    f0 = 220.0 * jnp.ones((1, t, 1))
    vol = jnp.ones((1, t, 1))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        units, f0, vol, mel_extract_fn=mel_x.extract,
        gt_spec=jnp.zeros((1, t, m)), infer=False, key=jax.random.PRNGKey(7),
    )["params"]
    save_checkpoint(str(tmp_path), 3, jax.device_get(params))

    out = tmp_path / "model.stablehlo"
    main(["-m", str(tmp_path / "model_3.ckpt"), "-o", str(out),
          "--seconds", str(t * hop / sr)])

    from jax import export as jexport

    with open(out, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((1, t, n_unit)), jnp.float32)
    kbits = jnp.zeros((2,), jnp.uint32)
    spk = jnp.zeros((1, 1), jnp.int32)
    got = np.asarray(exp.call(params, u, f0, vol, spk, kbits))
    want = np.asarray(
        jax.jit(
            lambda p, u, f, v, k: model.apply(
                {"params": p}, u, f, v, key=k, mel_extract_fn=mel_x.extract,
                spk_id=spk, infer=True, rngs={"noise": k},
            )
        )(params, u, f0, vol, kbits)
    )
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
