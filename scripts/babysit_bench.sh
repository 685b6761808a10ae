#!/bin/bash
# Retry bench.py across axon degradation waves until a live number lands.
# A live success writes .bench_last_good.json; stop then.
cd /root/repo
for i in $(seq 1 40); do
  echo "=== attempt $i $(date +%H:%M:%S) ===" >> /tmp/bench_babysit.log
  timeout 1800 /opt/venv/bin/python bench.py >> /tmp/bench_babysit.log 2>&1
  if [ -f .bench_last_good.json ]; then
    echo "=== SUCCESS attempt $i ===" >> /tmp/bench_babysit.log
    exit 0
  fi
  sleep 120
done
echo "=== gave up ===" >> /tmp/bench_babysit.log
