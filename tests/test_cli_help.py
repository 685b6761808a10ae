"""Every CLI entry point must render --help (argparse formats help strings
with %-interpolation, so an unescaped % crashes at --help time, not at
import time — this smoke test catches that class of break)."""
import subprocess
import sys

import pytest

CLIS = [
    "api", "batch_infer", "draw", "export", "export_onnx", "gui", "infer",
    "preprocess", "realtime", "train", "train_vocoder",
]


@pytest.mark.parametrize("name", CLIS)
def test_cli_help_renders(name):
    r = subprocess.run(
        [sys.executable, "-m", f"ddsp_svc_tpu.cli.{name}", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "usage" in r.stdout.lower()
