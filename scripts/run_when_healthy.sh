#!/bin/bash
# Waits for a healthy tunnel window (d2h >= 20 MB/s), then runs the r5
# hardware queue once: serving ladder, chain-quality checks, realtime
# rows, supervised soak, bench refresh.
# Usage: nohup bash scripts/run_when_healthy.sh > /tmp/r5_ladder.log 2>&1 &
cd /root/repo || exit 1
PY=/opt/venv/bin/python
probe() {
  timeout 180 $PY - <<'EOF' 2>/dev/null | tail -1
import time, numpy as np, jax
from ddsp_svc_tpu.cli.common import enable_compile_cache
enable_compile_cache()
x = jax.device_put(np.zeros(4*1024*1024, np.uint8))
y = jax.jit(lambda a: a + 1)(x)
jax.effects_barrier()
t0 = time.perf_counter()
_ = np.asarray(y)
dt = time.perf_counter() - t0
print(f"{4/dt:.1f}")
EOF
}
for i in $(seq 1 200); do
  MBPS=$(probe)
  echo "$(date +%H:%M:%S) d2h ${MBPS:-probe-failed} MB/s"
  ok=$($PY -c "print(1 if float('${MBPS:-0}' or 0) >= 20 else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then
    echo "=== healthy window: running r5 hardware queue ==="
    echo "--- serving ladder ---"
    timeout 3600 $PY bench_suite.py --isolate serving_diffusion_max serving_reflow_max serving_ddsp_max 2>&1 | grep -a '"metric"'
    echo "--- chain quality checks ---"
    timeout 3600 $PY tpu_checks.py serving_chain_quality serving_chain_quality_reflow serving_chain_quality_hifi serving_chain_quality_ddsp serving_chain_quality_au8 front_fused 2>&1 | grep -a '{'
    echo "--- realtime rows ---"
    timeout 2400 $PY bench_suite.py --isolate realtime_lowlat realtime_devf0 2>&1 | grep -a '"metric"'
    echo "--- supervised soak (RSS bound evidence) ---"
    timeout 3600 $PY scripts/probe_supervised_soak.py --seconds=300 --clients=12 --recycle=100 2>&1 | grep -a '^{' | tail -20
    echo "--- bench refresh ---"
    timeout 2400 $PY bench.py 2>&1 | grep -a '"metric"'
    echo "=== queue done ==="
    exit 0
  fi
  sleep 120
done
echo "no healthy window found"
exit 2
