"""Multi-process (multi-host simulation) test: two OS processes join via
jax.distributed, build a global mesh, and run a data-parallel train step
with psum'd gradients — the multi-host path of cli/train."""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
from ddsp_svc_tpu.train.state import create_train_state
from ddsp_svc_tpu.train.steps import make_ddsp_train_step

assert jax.process_count() == 2
devices = jax.devices()
assert len(devices) == 4  # 2 local per process
mesh = Mesh(np.array(devices).reshape(4, 1), ("data", "time"))

model = CombSubSuperFast(16000, 64, 256, n_unit=8, n_spk=1)
b, t = 4, 16
key = jax.random.PRNGKey(0)
batch_global = {
    "units": jax.random.normal(key, (b, t, 8)),
    "f0": 220.0 * jnp.ones((b, t, 1)),
    "volume": 0.5 * jnp.ones((b, t, 1)),
    "spk_id": jnp.ones((b, 1), jnp.int32),
    "audio": 0.1 * jax.random.normal(key, (b, t * 64)),
}
params = model.init({"params": key, "noise": key},
                    batch_global["units"], batch_global["f0"],
                    batch_global["volume"])["params"]
state = create_train_state(model, params, lr=1e-3)
step = make_ddsp_train_step(64, 128, n_scale=2, donate=False)

with mesh:
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    # per-process shard of the global batch -> global array
    def shard(x):
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    lo = jax.process_index() * 2
    local = {k: np.asarray(v)[lo : lo + 2] for k, v in batch_global.items()}
    batch = {k: shard(v) for k, v in local.items()}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
assert np.isfinite(loss), loss
print(f"proc {jax.process_index()} ok loss={loss:.5f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    s = socket.socket()
    s.bind(("localhost", 0))
    addr = f"localhost:{s.getsockname()[1]}"
    s.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "ok loss=" in out
    # both processes computed the same global loss
    losses = [o.split("ok loss=")[1].split()[0] for o in outs]
    assert losses[0] == losses[1], losses
