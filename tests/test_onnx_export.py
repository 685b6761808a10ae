"""ONNX export: the reference's four-graph artifact surface
(diffusion/onnx_export.py + diffusion_onnx.py) from OUR checkpoints,
validated wheel-free with the in-repo reader + numpy runtime."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

N_UNIT, N_SPK, MEL, HID, CHANS, LAYERS, KSTEP = 8, 3, 16, 8, 8, 2, 10


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """Tiny multi-speaker Diffusion checkpoint + its four exported graphs."""
    from ddsp_svc_tpu.cli.export_onnx import main
    from ddsp_svc_tpu.models.cascade import Unit2Mel
    from ddsp_svc_tpu.train.checkpoint import save_checkpoint
    from ddsp_svc_tpu.utils.config import save_config

    tmp = tmp_path_factory.mktemp("onnx")
    t = 8
    model = Unit2Mel(N_UNIT, N_SPK, False, MEL, n_layers=LAYERS, n_chans=CHANS,
                     n_hidden=HID, k_step_max=KSTEP)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t, N_UNIT)), 220.0 * jnp.ones((1, t, 1)),
        jnp.ones((1, t, 1)), gt_spec=jnp.zeros((1, t, MEL)), infer=False,
        spk_id=jnp.ones((1, 1), jnp.int32),
    )["params"]
    save_checkpoint(str(tmp), 3, jax.device_get(params))
    save_config(
        tmp / "config.yaml",
        {
            "data": {"sampling_rate": 16000, "block_size": 64, "duration": 2,
                     "encoder_out_channels": N_UNIT},
            "model": {"type": "Diffusion", "n_spk": N_SPK,
                      "use_pitch_aug": False, "n_layers": LAYERS,
                      "n_chans": CHANS, "n_hidden": HID,
                      "k_step_max": KSTEP, "out_dims": MEL},
        },
    )
    paths = main(["-m", str(tmp / "model_3.ckpt"), "--project", "tiny",
                  "--n_frames", "12"])
    return tmp, paths


def test_artifact_contract(exported):
    """File-level contract the external apps rely on: names, opset 16,
    input/output tensor names, dynamic time axes."""
    from ddsp_svc_tpu.onnx.reader import load_model_file

    tmp, paths = exported
    assert set(paths) == {"encoder", "denoise", "pred", "after"}
    expected_io = {
        "encoder": (["hubert", "mel2ph", "f0", "volume", "spk_mix"], ["mel_pred"]),
        "denoise": (["noise", "time", "condition"], ["noise_pred"]),
        "pred": (["noise", "noise_pred", "time", "time_prev"], ["noise_pred_o"]),
        "after": (["x"], ["mel_out"]),
    }
    for name, path in paths.items():
        assert path.endswith(f"tiny_{name}.onnx")
        m = load_model_file(path)
        assert m.opset[""] == 16
        ins, outs = expected_io[name]
        assert [vi.name for vi in m.graph.inputs] == ins
        assert [vi.name for vi in m.graph.outputs] == outs
    # time axes exported dynamic: hubert dim 1 is a dim_param, not an int
    enc = load_model_file(paths["encoder"])
    assert isinstance(enc.graph.inputs[0].shape[1], str)


def test_denoise_graph_matches_flax_wavenet(exported):
    """The denoise graph through the numpy runtime == our flax WaveNet, at a
    length different from the trace length (dynamic axes actually work)."""
    from ddsp_svc_tpu.models.wavenet import WaveNet
    from ddsp_svc_tpu.onnx.reader import load_model_file
    from ddsp_svc_tpu.onnx.runtime import run_model
    from ddsp_svc_tpu.train.checkpoint import load_checkpoint

    tmp, paths = exported
    payload, _ = load_checkpoint(str(tmp / "model_3.ckpt"))
    wn_params = payload["params"]["denoise_fn"]

    rng = np.random.default_rng(1)
    t = 20  # != n_frames=12 used at export
    spec = rng.standard_normal((1, t, MEL)).astype(np.float32)
    cond = rng.standard_normal((1, t, HID)).astype(np.float32)
    step = np.array([7.0], np.float32)

    ref = WaveNet(MEL, LAYERS, CHANS, HID).apply(
        {"params": wn_params}, jnp.asarray(spec), jnp.asarray(step),
        jnp.asarray(cond),
    )
    got = run_model(
        load_model_file(paths["denoise"]),
        {
            "noise": spec.transpose(0, 2, 1)[:, None],  # (1,1,M,T)
            "time": np.array([7], np.int64),
            "condition": cond.transpose(0, 2, 1),
        },
    )["noise_pred"]
    np.testing.assert_allclose(
        got[:, 0].transpose(0, 2, 1), np.asarray(ref), rtol=0, atol=2e-5
    )


def test_encoder_graph_contract(exported):
    """Encoder graph implements the app-side alignment contract: mel2ph is
    1-based (0 -> silence/zero row), embeds sum, per-frame speaker mix."""
    from ddsp_svc_tpu.onnx.reader import load_model_file
    from ddsp_svc_tpu.onnx.runtime import run_model
    from ddsp_svc_tpu.train.checkpoint import load_checkpoint

    tmp, paths = exported
    payload, _ = load_checkpoint(str(tmp / "model_3.ckpt"))
    p = payload["params"]

    rng = np.random.default_rng(2)
    t_units, t_mel = 6, 9
    hubert = rng.standard_normal((1, t_units, N_UNIT)).astype(np.float32)
    mel2ph = np.array([[0, 1, 1, 2, 3, 4, 5, 6, 6]], np.int64)  # 0 = silence
    f0 = (rng.random((1, t_mel)) * 300 + 80).astype(np.float32)
    volume = rng.random((1, t_mel)).astype(np.float32)
    spk_mix = rng.random((t_mel, N_SPK)).astype(np.float32)

    got = run_model(
        load_model_file(paths["encoder"]),
        {"hubert": hubert, "mel2ph": mel2ph, "f0": f0, "volume": volume,
         "spk_mix": spk_mix},
    )["mel_pred"]

    # independent recompute from the flax params
    padded = np.concatenate([np.zeros((1, 1, N_UNIT), np.float32), hubert], 1)
    aligned = padded[0][mel2ph[0]][None]
    x = (
        aligned @ np.asarray(p["unit_embed"]["kernel"]) + np.asarray(p["unit_embed"]["bias"])
        + np.log(1 + f0[..., None] / 700.0) @ np.asarray(p["f0_embed"]["kernel"])
        + np.asarray(p["f0_embed"]["bias"])
        + volume[..., None] @ np.asarray(p["volume_embed"]["kernel"])
        + np.asarray(p["volume_embed"]["bias"])
    )
    x = x + (spk_mix @ np.asarray(p["spk_embed"]["embedding"]))[None]
    np.testing.assert_allclose(got, x.transpose(0, 2, 1), rtol=0, atol=2e-5)


def test_end_to_end_pndm_vs_jax(exported):
    """The full four-graph PNDM chain reproduces the JAX checkpoint's
    sampler="pndm" inference from the same initial noise."""
    from ddsp_svc_tpu.onnx.validate import validate_export

    tmp, paths = exported
    stats = validate_export(str(tmp / "model_3.ckpt"), paths, n_frames=16,
                            speedup=2)
    assert stats["steps"] == 5
    assert stats["snr_db"] > 80.0, stats


def test_runtime_zero_valued_attributes(tmp_path):
    """proto3 omits zero scalars on the wire: Gather axis=0 / Concat axis=0
    must parse as 0, not None (None would make np.take/concatenate flatten
    — regression for the reader's attribute defaults)."""
    import torch

    from ddsp_svc_tpu.onnx.reader import load_model_file
    from ddsp_svc_tpu.onnx.runtime import run_model
    from ddsp_svc_tpu.onnx.shim import torch_onnx_export

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("table", torch.randn(7, 5))

        def forward(self, idx, extra):
            rows = self.table.index_select(0, idx)  # Gather axis=0 on 2-D
            return torch.cat([rows, extra], dim=0)  # Concat axis=0

    m = M()
    idx = torch.tensor([3, 0, 6], dtype=torch.long)
    extra = torch.randn(2, 5)
    path = str(tmp_path / "gather0.onnx")
    torch_onnx_export(m, (idx, extra), path, input_names=["idx", "extra"],
                      output_names=["y"], opset_version=16)
    model = load_model_file(path)
    gather = [n for n in model.graph.nodes if n.op_type == "Gather"]
    assert gather and gather[0].attributes.get("axis") == 0  # not None
    got = run_model(model, {"idx": idx.numpy(), "extra": extra.numpy()})["y"]
    with torch.no_grad():
        ref = m(idx, extra).numpy()
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_rejects_non_diffusion_family(tmp_path):
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
    from ddsp_svc_tpu.onnx import export_onnx
    from ddsp_svc_tpu.train.checkpoint import save_checkpoint
    from ddsp_svc_tpu.utils.config import save_config

    model = CombSubSuperFast(16000, 64, 256, n_unit=8, n_spk=1)
    t = 8
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t, 8)), 220.0 * jnp.ones((1, t, 1)), jnp.ones((1, t, 1)),
    )["params"]
    save_checkpoint(str(tmp_path), 1, jax.device_get(params))
    save_config(
        tmp_path / "config.yaml",
        {"data": {"sampling_rate": 16000, "block_size": 64, "duration": 2,
                  "encoder_out_channels": 8},
         "model": {"type": "CombSubSuperFast", "win_length": 256, "n_spk": 1}},
    )
    with pytest.raises(ValueError, match="StableHLO"):
        export_onnx(str(tmp_path / "model_1.ckpt"))


def test_cli_check_flag(exported):
    """--check re-exports and validates; exercises the user-facing gate."""
    from ddsp_svc_tpu.cli.export_onnx import main

    tmp, _ = exported
    main(["-m", str(tmp / "model_3.ckpt"), "--project", "tiny2",
          "--n_frames", "10", "--check"])
