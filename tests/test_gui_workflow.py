"""Training-workflow surface of the web GUI (gui/workflow.py + the
/api/workflow/* endpoints) — the reference's webui (outdated).py:77-125
subprocess orchestration, driven over real HTTP."""
import json
import sys
import time
import urllib.error
import urllib.request

import pytest

from ddsp_svc_tpu.gui import workflow as wf
from ddsp_svc_tpu.gui.web import GuiApp, serve
from ddsp_svc_tpu.utils.config import load_config, save_config


def _wait(runner, timeout=30.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        st = runner.poll()
        if not st["running"] and st["returncode"] is not None:
            return st
        time.sleep(0.05)
    raise TimeoutError("job did not finish")


def _script(code: str) -> list[str]:
    return [sys.executable, "-u", "-c", code]


def test_job_runner_captures_output_and_rc():
    r = wf.JobRunner()
    r.start("demo", _script("print('a'); print('b')"))
    st = _wait(r)
    assert st["returncode"] == 0 and st["kind"] == "demo"
    assert st["lines"][-2:] == ["a", "b"]


def test_job_runner_incremental_cursor_and_stderr():
    r = wf.JobRunner()
    r.start("demo", _script(
        "import sys; print('out'); print('err', file=sys.stderr)"))
    st = _wait(r)
    assert set(st["lines"]) >= {"out", "err"}  # stderr interleaved
    again = r.poll(since=st["next"])
    assert again["lines"] == []  # cursor consumed everything


def test_job_runner_busy_raises_then_allows_restart():
    r = wf.JobRunner()
    r.start("demo", _script("import time; time.sleep(30)"))
    with pytest.raises(RuntimeError, match="still running"):
        r.start("demo2", _script("print('x')"))
    r.stop()
    st = _wait(r)
    assert st["returncode"] != 0  # terminated
    r.start("demo3", _script("print('restarted')"))
    assert _wait(r)["returncode"] == 0


def test_derive_config_overrides_whitelist(tmp_path):
    base = tmp_path / "base.yaml"
    save_config(base, {
        "data": {"sampling_rate": 16000},
        "train": {"batch_size": 24, "lr": 0.0005},
        "env": {"expdir": "exp/old"},
    })
    out = wf.derive_config(str(base), {
        "batch_size": "6", "lr": 0.001, "expdir": "exp/new",
        "epochs": "", "bogus": 1,
    })
    assert out.endswith(".gui.yaml")
    cfg = load_config(out)
    assert cfg.train.batch_size == 6
    assert cfg.train.lr == pytest.approx(0.001)
    assert cfg.env.expdir == "exp/new"
    assert cfg.data.sampling_rate == 16000  # untouched
    assert "bogus" not in cfg.train and "bogus" not in cfg


def test_real_cli_resolves_from_foreign_cwd(tmp_path):
    """The real job_argv command must import the package even when the
    server was started outside the checkout (JobRunner injects the package
    root into the child's PYTHONPATH)."""
    r = wf.JobRunner()
    argv = wf.job_argv("preprocess", "unused.yaml")
    r.start("preprocess", argv[:-2] + ["--help"], cwd=str(tmp_path))
    st = _wait(r, timeout=120)
    assert st["returncode"] == 0, st["lines"][-5:]
    assert any("usage" in ln.lower() for ln in st["lines"])


def test_job_argv_shapes():
    for kind in wf.JOB_KINDS:
        argv = wf.job_argv(kind, "/tmp/x.yaml")
        assert argv[0] == sys.executable and "/tmp/x.yaml" in argv
    with pytest.raises(ValueError):
        wf.job_argv("nonsense", "x")


@pytest.fixture()
def server():
    app = GuiApp(pipeline=object())
    srv = serve(app, port=0, background=True)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, app
    app.jobs.stop()
    srv.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_workflow_endpoints_run_a_job(server, monkeypatch):
    base, app = server
    monkeypatch.setattr(
        wf, "job_argv",
        lambda kind, cfg: _script(f"print('ran {kind} on ' + {cfg!r})"))
    code, out = _post(base + "/api/workflow/start",
                      {"kind": "preprocess", "config": "/tmp/c.yaml"})
    assert code == 200 and out["ok"]
    _wait(app.jobs)
    code, log = _get(base + "/api/workflow/log?since=0")
    assert code == 200 and not log["running"]
    assert "ran preprocess on /tmp/c.yaml" in log["lines"]
    assert log["returncode"] == 0


def test_workflow_endpoint_rejects_bad_kind_and_busy(server, monkeypatch):
    base, app = server
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(base + "/api/workflow/start", {"kind": "rm -rf", "config": "x"})
    assert exc.value.code == 400
    monkeypatch.setattr(
        wf, "job_argv",
        lambda kind, cfg: _script("import time; time.sleep(30)"))
    code, _ = _post(base + "/api/workflow/start",
                    {"kind": "train", "config": "x"})
    assert code == 200
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(base + "/api/workflow/start", {"kind": "train", "config": "x"})
    assert exc.value.code == 409
    code, _ = _post(base + "/api/workflow/stop", {})
    assert code == 200
    st = _wait(app.jobs)
    assert st["returncode"] != 0


def test_workflow_config_endpoint(server, tmp_path):
    base, _ = server
    cfg = tmp_path / "c.yaml"
    save_config(cfg, {"train": {"batch_size": 24}})
    code, out = _post(base + "/api/workflow/config",
                      {"base": str(cfg), "batch_size": 4})
    assert code == 200
    assert load_config(out["path"]).train.batch_size == 4
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(base + "/api/workflow/config", {"batch_size": 4})
    assert exc.value.code == 400


def test_page_has_workflow_section(server):
    base, _ = server
    with urllib.request.urlopen(base + "/", timeout=30) as r:
        body = r.read()
    assert b"/api/workflow/start" in body
    assert b"training_section" in body


def test_tensorboard_logdir_resolves_expdir(tmp_path):
    """The GUI hands job_argv the config YAML; tensorboard must point at
    the experiment dir the trainer writes (config env.expdir), not the
    YAML file itself."""
    cfg = tmp_path / "c.yaml"
    save_config(str(cfg), {"env": {"expdir": str(tmp_path / "exp" / "run1")}})
    argv = wf.job_argv("tensorboard", str(cfg))
    logdir = argv[argv.index("--logdir") + 1]
    assert logdir == str(tmp_path / "exp" / "run1")
    # a directory (or missing file) passes through unchanged
    argv = wf.job_argv("tensorboard", str(tmp_path))
    assert argv[argv.index("--logdir") + 1] == str(tmp_path)


def test_stale_pump_cannot_touch_new_job_log():
    """A finished-but-undrained pump from a previous job must not append
    its tail into the next job's log ring (generation guard)."""
    import io

    class _FakeProc:
        def __init__(self, text):
            self.stdout = io.StringIO(text)

        def wait(self):
            return 7

    r = wf.JobRunner()
    r._gen = 2  # a newer job owns the log
    r._pump(_FakeProc("stale1\nstale2\n"), gen=1)
    st = r.poll()
    assert st["lines"] == [] and st["returncode"] is None
