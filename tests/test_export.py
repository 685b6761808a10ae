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
    mel = exp.call(
        params,
        jnp.zeros((1, t, n_unit), jnp.float32),
        220.0 * jnp.ones((1, t, 1), jnp.float32),
        jnp.ones((1, t, 1), jnp.float32),
        jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((2,), jnp.uint32),
    )
    assert np.isfinite(np.asarray(mel)).all()
