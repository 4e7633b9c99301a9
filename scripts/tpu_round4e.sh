#!/bin/bash
# Round-4 part E — final headline under whatever defaults part D decided:
# confirm the b=16 headline, re-check the batch knee at b=32 (part C moved
# it: b32k8 157.06 vs b16k4 154.8 pre-levers), and record the bench.py
# line the driver will reproduce.  Run AFTER the part-D default flips are
# committed.  Appends to /tmp/tpu_r4.log.
set -u
REPO=/root/repo
LOG=/tmp/tpu_r4.log
PY="python"
export PYTHONPATH=/root/.axon_site:$REPO
cd $REPO

run() {
  local name=$1 tmo=$2; shift 2
  echo "===== $name $(date +%H:%M:%S) =====" | tee -a $LOG
  timeout "$tmo" "$@" >>$LOG 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" | tee -a $LOG
}

probe_once() {
  timeout 120 $PY -c "
import jax, jax.numpy as jnp
print(jax.devices())
print('TUNNEL_OK', (jnp.ones((1024,1024),jnp.bfloat16)@jnp.ones((1024,1024),jnp.bfloat16)).sum())" \
    >>/tmp/tpu_r4e_probe.log 2>&1
}
echo "probe history $(date)" > /tmp/tpu_r4e_probe.log
for attempt in $(seq 1 48); do
  echo "--- probe $attempt $(date +%H:%M:%S)" >> /tmp/tpu_r4e_probe.log
  probe_once || true
  if grep -q TUNNEL_OK /tmp/tpu_r4e_probe.log; then
    echo "tunnel up after $attempt probe(s) [part E]" | tee -a $LOG
    break
  fi
  if [ "$attempt" -eq 48 ]; then
    echo "tunnel still dead after $attempt probes [part E]" | tee -a $LOG
    exit 1
  fi
  sleep 600
done

run sweep_final 5400 $PY scripts/sweep_bench.py 16,4 32,4 32,8
run bench_final 2400 $PY bench.py

echo "PART E ALL DONE $(date)" | tee -a $LOG
