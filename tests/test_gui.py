"""Web GUI shell (gui/web.py) driven over real HTTP — the reference GUI's
control surface (gui.py:152-380) minus the PySimpleGUI/sounddevice wheels."""
import io
import json
import urllib.request

import numpy as np
import pytest
from scipy.io import wavfile

from ddsp_svc_tpu.gui.i18n import LOCALES, get_locale
from ddsp_svc_tpu.gui.web import DEFAULTS, GuiApp, serve


class PassthroughPipeline:
    def infer(self, audio, sample_rate, **kwargs):
        return audio.copy(), sample_rate


@pytest.fixture()
def server():
    app = GuiApp(pipeline=PassthroughPipeline())
    srv = serve(app, port=0, background=True)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, app
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read(), dict(r.headers)


def _post(url, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, r.read(), dict(r.headers)


def test_page_and_status(server):
    base, _ = server
    code, body, _ = _get(base + "/")
    assert code == 200 and b"/api/status" in body
    code, body, _ = _get(base + "/api/status")
    st = json.loads(body)
    assert st["model_loaded"] and st["config"] == DEFAULTS


def test_locales_complete():
    keys = set(LOCALES["en_US"])
    for code in LOCALES:
        assert set(LOCALES[code]) == keys, code
    assert get_locale("nope") == LOCALES["en_US"]


def test_config_roundtrip_and_coercion(server):
    base, app = server
    _post(base + "/api/config", json.dumps({
        "pitch": "5", "use_phase_vocoder": "true", "spk_id": 3,
        "block_time": 0.1, "crossfade_time": 0.02, "extra_time": 0.4,
        "samplerate": 16000, "bogus_key": 1,
    }).encode())
    assert app.config["pitch"] == 5.0
    assert app.config["use_phase_vocoder"] is True
    assert app.config["spk_id"] == 3
    assert "bogus_key" not in app.config


def test_convert_roundtrip(server):
    base, app = server
    sr = 16000
    _post(base + "/api/config", json.dumps({
        "samplerate": sr, "block_time": 0.1, "crossfade_time": 0.02,
        "extra_time": 0.4,
    }).encode())
    t = np.arange(sr) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, sr, (audio * 32767).astype(np.int16))
    code, body, headers = _post(base + "/api/convert", buf.getvalue())
    assert code == 200
    out_sr, out = wavfile.read(io.BytesIO(body))
    assert out_sr == sr and len(out) == len(audio)
    assert float(headers["X-Rtf"]) > 0
    assert app.stats["blocks"] == 10


def test_convert_without_model_409():
    app = GuiApp(pipeline=None)
    srv = serve(app, port=0, background=True)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(
            base + "/api/convert", data=b"xx", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 409
    finally:
        srv.shutdown()


def test_stream_start_gated(server):
    base, _ = server
    req = urllib.request.Request(
        base + "/api/stream/start", data=b"", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 501  # sounddevice absent in this image
