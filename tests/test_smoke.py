"""<60 s smoke tier: every CLI ``main()`` driven in-process on tiny fixtures.

Run: /opt/venv/bin/python -m pytest tests -m smoke -q        (pre-commit gate)

This tier exists because of round-3's be88fc4: a local import inside
``cli/infer.py main()`` shadowed the module-global ``jnp`` and broke EVERY
offline inference run at commit time — the full suite would have caught it
but takes ~12 min, so it wasn't run. Each test here executes a CLI body end
to end (not just --help): ``test_smoke_infer`` runs the exact
``cli/infer.py`` f0-cache -> jnp.asarray path that be88fc4 broke.

Fixtures use the dev-only ``tiny`` units encoder (features/hubert.py
ENCODER_CONFIGS) so each drive compiles in ~a second on CPU.
"""
import io
import threading
import urllib.request
import uuid

import numpy as np
import pytest
from scipy.io import wavfile

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.train.checkpoint import save_checkpoint
from ddsp_svc_tpu.utils.config import save_config

pytestmark = pytest.mark.smoke

SR, HOP, WIN, N_UNIT = 16000, 64, 256, 256


def _write_wav(path, seconds=0.3, freq=220.0, sr=SR):
    n = np.arange(int(sr * seconds))
    audio = 0.4 * np.sin(2 * np.pi * freq * n / sr) * np.minimum(1.0, n / 400.0)
    wavfile.write(path, sr, (audio * 32767).astype(np.int16))


def _data_block(extra=None):
    d = {
        "sampling_rate": SR, "block_size": HOP, "duration": 0.5,
        "encoder": "tiny", "encoder_ckpt": None,
        "encoder_sample_rate": 16000, "encoder_hop_size": 320,
        "encoder_out_channels": N_UNIT,
        "f0_extractor": "yin", "f0_min": 65, "f0_max": 800,
    }
    if extra:
        d.update(extra)
    return d


def _write_ddsp_ckpt(tmp_path):
    """Tiny CombSubSuperFast checkpoint + config with the tiny encoder."""
    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    model = CombSubSuperFast(SR, HOP, WIN, n_unit=N_UNIT, n_spk=2)
    params = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, N_UNIT)), 220.0 * jnp.ones((1, 16, 1)),
        jnp.ones((1, 16, 1)), spk_id=jnp.ones((1, 1), jnp.int32),
    )["params"])()
    save_checkpoint(str(tmp_path), 5, jax.device_get(params))
    save_config(tmp_path / "config.yaml", {
        "data": _data_block(),
        "model": {"type": "CombSubSuperFast", "win_length": WIN, "n_spk": 2},
        "infer": {},
    })
    return tmp_path / "model_5.ckpt"


def test_smoke_draw_preprocess_train(tmp_path):
    """The training workflow CLIs: draw -> preprocess -> train (1 step)."""
    from ddsp_svc_tpu.cli.draw import main as draw_main
    from ddsp_svc_tpu.cli.preprocess import main as preprocess_main
    from ddsp_svc_tpu.cli.train import main as train_main

    train_audio = tmp_path / "data" / "train" / "audio" / "1"
    train_audio.mkdir(parents=True)
    for i, freq in enumerate((175.0, 196.0, 220.0)):
        _write_wav(train_audio / f"t{i}.wav", seconds=0.6, freq=freq)

    config, expdir = tmp_path / "config.yaml", tmp_path / "exp"
    save_config(config, {
        "data": _data_block({
            "train_path": str(tmp_path / "data" / "train"),
            "valid_path": str(tmp_path / "data" / "val"),
            "extensions": ["wav"],
        }),
        "model": {"type": "CombSubSuperFast", "win_length": WIN, "n_spk": 2},
        "loss": {"fft_min": 64, "fft_max": 128, "n_scale": 1},
        "env": {"expdir": str(expdir)},
        "train": {"batch_size": 2, "cache_all_data": True, "epochs": 2,
                  "interval_log": 1, "interval_val": 2, "lr": 0.0005,
                  "weight_decay": 0, "save_opt": False, "seed": 0},
    })

    draw_main(["-c", str(config), "-n", "1", "--min-sec", "0.2"])
    assert len(list(train_audio.glob("*.wav"))) == 2
    assert len(list((tmp_path / "data" / "val" / "audio").rglob("*.wav"))) == 1

    preprocess_main(["-c", str(config)])
    assert list((tmp_path / "data" / "train" / "units").rglob("*.npy"))

    train_main(["-c", str(config)])
    assert sorted(expdir.glob("model_*.ckpt"))


def test_smoke_gui(tmp_path):
    """cli.gui main(): page + status endpoints respond."""
    from ddsp_svc_tpu.cli.gui import main

    server, th = _serve_cli(main, ["--port", "0"])
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/",
                                    timeout=60) as r:
            assert r.status == 200 and b"html" in r.read().lower()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/status",
                                    timeout=60) as r:
            assert r.status == 200
    finally:
        server.shutdown()
        th.join(timeout=30)


def test_smoke_train_vocoder(tmp_path):
    """cli.train_vocoder: tiny GAN config, one step, checkpoint written."""
    from ddsp_svc_tpu.cli.preprocess import main as preprocess_main
    from ddsp_svc_tpu.cli.train_vocoder import main as voc_main

    train_audio = tmp_path / "data" / "train" / "audio" / "1"
    val_audio = tmp_path / "data" / "val" / "audio" / "1"
    train_audio.mkdir(parents=True)
    val_audio.mkdir(parents=True)
    for i, freq in enumerate((196.0, 220.0)):
        _write_wav(train_audio / f"t{i}.wav", seconds=0.6, freq=freq)
    _write_wav(val_audio / "v.wav", seconds=0.6)

    config, expdir = tmp_path / "config.yaml", tmp_path / "exp"
    save_config(config, {
        # Diffusion model.type so preprocess writes mel/ (needs_mel)
        "data": _data_block({
            "duration": 0.2,
            "train_path": str(tmp_path / "data" / "train"),
            "valid_path": str(tmp_path / "data" / "val"),
            "extensions": ["wav"],
        }),
        "model": {"type": "Diffusion", "n_spk": 2, "use_pitch_aug": False},
        "vocoder": {"num_mels": 128, "n_fft": 256, "win_size": 256,
                    "upsample_rates": [4, 4, 4],
                    "upsample_kernel_sizes": [8, 8, 8],
                    "upsample_initial_channel": 16,
                    "resblock": "1", "resblock_kernel_sizes": [3],
                    "resblock_dilation_sizes": [[1, 3]],
                    "fmin": 40, "fmax": 7000,
                    "discriminator_periods": [2], "msd_scales": 1},
        "env": {"expdir": str(expdir)},
        "train": {"batch_size": 2, "cache_all_data": True, "epochs": 1,
                  "interval_log": 1, "interval_val": 1, "lr": 0.0002,
                  "weight_decay": 0, "save_opt": False, "seed": 0},
    })
    preprocess_main(["-c", str(config)])
    assert list((tmp_path / "data" / "train" / "mel").rglob("*.npy"))
    voc_main(["-c", str(config)])
    assert sorted(expdir.glob("model_*.ckpt"))


def test_smoke_batch_infer(tmp_path):
    from ddsp_svc_tpu.cli.batch_infer import main

    ckpt = _write_ddsp_ckpt(tmp_path)
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _write_wav(in_dir / "a.wav")
    main(["-m", str(ckpt), "-i", str(in_dir), "-o", str(out_dir),
          "-id", "1", "-pe", "yin"])
    assert (out_dir / "a.wav").exists()


def test_smoke_infer(tmp_path):
    """cli.infer end to end — executes the f0-cache branch be88fc4 broke."""
    from ddsp_svc_tpu.cli.infer import main

    ckpt = _write_ddsp_ckpt(tmp_path)
    in_wav, out_wav = tmp_path / "in.wav", tmp_path / "out.wav"
    _write_wav(in_wav)
    main(["-m", str(ckpt), "-i", str(in_wav), "-o", str(out_wav),
          "-k", "2", "-id", "1", "-pe", "yin"])
    sr, data = wavfile.read(out_wav)
    assert sr == SR and len(data) > 0
    assert np.isfinite(data.astype(np.float32)).all()
    # the MD5 f0 cache was written (the branch that assembles the jnp track)
    assert list((tmp_path / "cache").glob("yin_*.npy"))


def test_smoke_realtime(tmp_path):
    """cli.realtime file mode (the block engine path)."""
    from ddsp_svc_tpu.cli.realtime import main

    ckpt = _write_ddsp_ckpt(tmp_path)
    in_wav, out_wav = tmp_path / "in.wav", tmp_path / "out.wav"
    _write_wav(in_wav, seconds=0.7)
    main(["-m", str(ckpt), "-i", str(in_wav), "-o", str(out_wav),
          "-id", "1", "--block_time", "0.3", "--extra_time", "0.5"])
    sr, data = wavfile.read(out_wav)
    assert sr == SR and len(data) > 0


def _serve_cli(main_fn, argv):
    """Run a blocking server CLI main() in a thread; return (server, thread)
    once the socket is bound (the ready_cb contract)."""
    box, ready = {}, threading.Event()

    def cb(server):
        box["server"] = server
        ready.set()

    th = threading.Thread(target=main_fn, args=(argv,),
                          kwargs={"ready_cb": cb}, daemon=True)
    th.start()
    assert ready.wait(timeout=120), "server CLI never bound its socket"
    return box["server"], th


def test_smoke_api(tmp_path):
    """cli.api main() end to end: bind -> one voiceChangeModel POST -> stop."""
    from ddsp_svc_tpu.cli.api import main

    ckpt = _write_ddsp_ckpt(tmp_path)
    server, th = _serve_cli(main, ["-m", str(ckpt), "-p", "0"])
    try:
        port = server.server_address[1]
        buf = io.BytesIO()
        n = np.arange(int(SR * 0.25))
        wavfile.write(buf, SR,
                      (0.3 * np.sin(2 * np.pi * 220 * n / SR) * 32767
                       ).astype(np.int16))
        boundary = uuid.uuid4().hex
        out = io.BytesIO()
        for name, value in (("sample", buf.getvalue()), ("fPitchChange", 0.0),
                            ("sSpeakId", 1), ("sampleRate", SR)):
            out.write(f"--{boundary}\r\n".encode())
            out.write(f'Content-Disposition: form-data; name="{name}"'
                      f"\r\n\r\n".encode())
            out.write(value if isinstance(value, bytes)
                      else str(value).encode())
            out.write(b"\r\n")
        out.write(f"--{boundary}--\r\n".encode())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/voiceChangeModel", data=out.getvalue(),
            method="POST",
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            payload = r.read()
        sr, data = wavfile.read(io.BytesIO(payload))
        assert len(data) > 0
    finally:
        server.shutdown()
        th.join(timeout=30)


def test_smoke_export_stablehlo(tmp_path):
    from ddsp_svc_tpu.cli.export import main

    ckpt = _write_ddsp_ckpt(tmp_path)
    out = tmp_path / "model.stablehlo"
    main(["-m", str(ckpt), "-o", str(out), "--seconds", "0.2"])
    assert out.exists() and out.stat().st_size > 0


def test_smoke_export_onnx(tmp_path):
    """cli.export_onnx on a tiny Diffusion checkpoint (all four graphs)."""
    from ddsp_svc_tpu.cli.export_onnx import main
    from ddsp_svc_tpu.models.cascade import Unit2Mel

    n_unit, mel, t = 8, 16, 8
    model = Unit2Mel(n_unit, 2, False, mel, n_layers=2, n_chans=8,
                     n_hidden=8, k_step_max=10)
    params = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, t, n_unit)), 220.0 * jnp.ones((1, t, 1)),
        jnp.ones((1, t, 1)), gt_spec=jnp.zeros((1, t, mel)), infer=False,
        spk_id=jnp.ones((1, 1), jnp.int32),
    )["params"])()
    save_checkpoint(str(tmp_path), 3, jax.device_get(params))
    save_config(tmp_path / "config.yaml", {
        "data": {"sampling_rate": SR, "block_size": HOP, "duration": 2,
                 "encoder_out_channels": n_unit},
        "model": {"type": "Diffusion", "n_spk": 2, "use_pitch_aug": False,
                  "n_layers": 2, "n_chans": 8, "n_hidden": 8,
                  "k_step_max": 10, "out_dims": mel},
    })
    paths = main(["-m", str(tmp_path / "model_3.ckpt"), "--project", "tiny",
                  "--n_frames", "8"])
    assert set(paths) == {"encoder", "denoise", "pred", "after"}
    for p in paths.values():
        assert (tmp_path / p).exists() or __import__("os").path.exists(p)


