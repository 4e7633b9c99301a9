#!/bin/bash
# Resume of the round-4 part-C queue: the builder session restart killed the
# queue mid-profile_encoder_v2 (17:27, /tmp/tpu_r4.log); steps 1/2 and
# profile_decoder_v2 / ring_hop_v2 completed.  This re-runs the encoder
# profile and the post-vmem-fix batch sweep, then a headline bench.py pass
# under the new defaults (concat-split + separate projections).
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
    >>/tmp/tpu_r4c_probe.log 2>&1
}
for attempt in $(seq 1 48); do
  echo "--- probe $attempt $(date +%H:%M:%S) [resume]" >> /tmp/tpu_r4c_probe.log
  probe_once || true
  if tail -5 /tmp/tpu_r4c_probe.log | grep -q TUNNEL_OK; then
    echo "tunnel up after $attempt probe(s) [part C resume]" | tee -a $LOG
    break
  fi
  if [ "$attempt" -eq 48 ]; then
    echo "tunnel still dead after $attempt probes [part C resume]" | tee -a $LOG
    exit 1
  fi
  sleep 600
done

run profile_encoder_v3 3600 $PY scripts/profile_encoder.py stages
run sweep_retry 5400 $PY scripts/sweep_bench.py 24,4 32,4 32,8
run bench_headline 2400 $PY bench.py

echo "PART C RESUME ALL DONE $(date)" | tee -a $LOG
