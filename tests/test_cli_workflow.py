"""Full user workflow through the real CLIs (the reference's
preprocess.py -> train.py -> main.py loop): tiny corpus -> cli.preprocess ->
cli.train (few steps, checkpoint written) -> cli.infer converts a wav."""
import numpy as np
import pytest
from scipy.io import wavfile

from ddsp_svc_tpu.utils.config import save_config

SR, HOP, WIN, N_UNIT = 16000, 64, 256, 256


def _tone(seconds, freq, sr=SR):
    n = np.arange(int(sr * seconds))
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * n / sr)
    return (0.4 * np.sin(2 * np.pi * freq * vib * n / sr)).astype(np.float32)


@pytest.mark.slow
def test_preprocess_train_infer_workflow(tmp_path):
    from ddsp_svc_tpu.cli.infer import main as infer_main
    from ddsp_svc_tpu.cli.preprocess import main as preprocess_main
    from ddsp_svc_tpu.cli.train import main as train_main

    train_audio = tmp_path / "data" / "train" / "audio" / "1"
    val_audio = tmp_path / "data" / "val" / "audio" / "1"
    train_audio.mkdir(parents=True)
    val_audio.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, freq in enumerate((165.0, 175.0, 185.0, 196.0, 208.0, 220.0, 233.0, 247.0)):
        wav = _tone(1.4, freq) + 0.01 * rng.standard_normal(
            int(SR * 1.4)
        ).astype(np.float32)
        wavfile.write(train_audio / f"t{i}.wav", SR,
                      (wav * 32767).astype(np.int16))
    wavfile.write(val_audio / "v0.wav", SR,
                  (_tone(1.4, 208.0) * 32767).astype(np.int16))

    config = tmp_path / "config.yaml"
    expdir = tmp_path / "exp"
    save_config(config, {
        "data": {
            "f0_extractor": "yin", "f0_min": 65, "f0_max": 800,
            "sampling_rate": SR, "block_size": HOP, "duration": 1,
            "encoder": "hubertsoft", "encoder_ckpt": None,
            "encoder_sample_rate": 16000, "encoder_hop_size": 320,
            "encoder_out_channels": N_UNIT,
            "train_path": str(tmp_path / "data" / "train"),
            "valid_path": str(tmp_path / "data" / "val"),
            "extensions": ["wav"],
        },
        "model": {"type": "CombSubSuperFast", "win_length": WIN, "n_spk": 2},
        "loss": {"fft_min": 64, "fft_max": 256, "n_scale": 2},
        "env": {"expdir": str(expdir)},
        "train": {
            "batch_size": 6, "cache_all_data": True, "epochs": 4,
            "interval_log": 1, "interval_val": 2, "lr": 0.0005,
            "weight_decay": 0, "save_opt": False, "seed": 0,
        },
    })

    preprocess_main(["-c", str(config)])
    for sub in ("units", "f0", "volume"):
        files = list((tmp_path / "data" / "train" / sub).rglob("*.npy"))
        assert files, f"preprocess produced no {sub}/*.npy"

    train_main(["-c", str(config)])
    ckpts = sorted(expdir.glob("model_*.ckpt"))
    assert ckpts, "training saved no checkpoint"

    out_wav = tmp_path / "out.wav"
    in_wav = val_audio / "v0.wav"
    infer_main(["-m", str(ckpts[-1]), "-i", str(in_wav), "-o", str(out_wav),
                "-id", "1", "-pe", "yin"])
    sr, data = wavfile.read(out_wav)
    assert sr == SR and len(data) > 0
    assert np.isfinite(data.astype(np.float32)).all()
