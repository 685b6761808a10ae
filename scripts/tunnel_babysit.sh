#!/bin/bash
# Babysit the axon tunnel: probe until healthy, then refresh all bench
# numbers (bench.py headline + bench_suite --isolate). The service degrades
# in waves (CLAUDE.md); this catches the next healthy window unattended.
# Usage: tunnel_babysit.sh [max_hours]
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
MAX_HOURS=${1:-10}
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
LOG=/tmp/tunnel_babysit.log

probe() {
  timeout 180 $PY - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256))
y = jax.jit(lambda a: (a @ a).sum())(x)
jax.effects_barrier()
assert float(np.asarray(y)) == 256.0 ** 3
EOF
}

echo "[babysit] start $(date -u +%H:%M:%S)" >> "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if probe; then
    echo "[babysit] tunnel HEALTHY $(date -u +%H:%M:%S); refreshing benches" >> "$LOG"
    BENCH_DEADLINE_S=2400 timeout 2700 $PY bench.py >> "$LOG" 2>&1
    BENCH_CONFIG_DEADLINE_S=1500 timeout 21600 \
      $PY bench_suite.py --isolate >> "$LOG" 2>&1
    echo "[babysit] refresh done $(date -u +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  echo "[babysit] tunnel down $(date -u +%H:%M:%S); sleeping 600s" >> "$LOG"
  sleep 600
done
echo "[babysit] gave up after ${MAX_HOURS}h" >> "$LOG"
exit 1
