#!/bin/bash
# Round-4 TPU measurement queue.  Self-arming: if the relay tunnel is down,
# a gentle probe loop (ONE bounded jax.devices() child per interval, never
# parallel) waits for it and the queue starts unattended the minute it
# returns (VERDICT r3 item 8 — two rounds were throttled by tunnel outages).
# Sequential (one TPU process at a time), generous per-step timeouts,
# everything logged to /tmp/tpu_r4.log.  Usage: bash scripts/tpu_round4.sh
set -u
REPO=/root/repo
LOG=/tmp/tpu_r4.log
PROBELOG=/tmp/tpu_r4_probe.log
PY="python"
export PYTHONPATH=/root/.axon_site:$REPO
cd $REPO
rm -f $LOG

run() {
  local name=$1 tmo=$2; shift 2
  echo "===== $name $(date +%H:%M:%S) =====" | tee -a $LOG
  timeout "$tmo" "$@" >>$LOG 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" | tee -a $LOG
}

# 0. self-arming tunnel wait: bounded single probe per interval.  Probe
# history goes to $PROBELOG (bench.py's error record points here on failure).
probe_once() {
  timeout 120 $PY -c "
import jax, jax.numpy as jnp
print(jax.devices())
print('TUNNEL_OK', (jnp.ones((1024,1024),jnp.bfloat16)@jnp.ones((1024,1024),jnp.bfloat16)).sum())" \
    >>$PROBELOG 2>&1
}
echo "probe history $(date)" > $PROBELOG
for attempt in $(seq 1 48); do   # up to ~8h of waiting
  echo "--- probe $attempt $(date +%H:%M:%S)" >> $PROBELOG
  # judge success on the PRINTED marker, not the exit code: the axon
  # backend's teardown can hang past the probe timeout AFTER the matmul
  # already succeeded (observed r4: rc=124 with TUNNEL_OK printed)
  probe_once || true
  if grep -q TUNNEL_OK $PROBELOG; then
    echo "tunnel up after $attempt probe(s)" | tee -a $LOG
    break
  fi
  if [ "$attempt" -eq 48 ]; then
    echo "tunnel still dead after $attempt probes — see $PROBELOG" | tee -a $LOG
    exit 1
  fi
  sleep 600
done

# 1. real-hardware smoke of the flash kernel (sublane-replicated lse).
# Loud but not fatal: the queue's own steps would expose a broken kernel.
run smoke_flash 1200 $PY scripts/smoke_flash_tpu.py
grep -q "SMOKE PASS" $LOG || echo "WARNING: flash kernel smoke FAILED — inspect $LOG before trusting kernel numbers" | tee -a $LOG

# 2. decoder conv site timings (the perf target sites)
run profile_decoder 2400 $PY scripts/profile_decoder.py

# 3. full-step ablation decomposition
run profile_step 4800 $PY scripts/profile_step.py

# 4. flag A/Bs at full step.  Measured 2026-08-19 (pre-default-flip):
#    default(eager concat) 108.67ms | via2d 152.60 REJECTED |
#    concat-split 103.64 (+4.9%) -> now the DEFAULT (SAP3D_CONCAT_SPLIT=0
#    restores eager).  Legs below keep re-verifying both sides.
run step_default 1800 $PY scripts/profile_step.py full
run step_catsplit_off 2400 env SAP3D_CONCAT_SPLIT=0 $PY scripts/profile_step.py full
run step_via2d 2400 env SAP3D_CONV3D_VIA_2D=1 $PY scripts/profile_step.py full

# 4c. ring-attention hop body A/B at flagship x_1_3 shard shapes
run ring_hop 2400 $PY scripts/profile_ring_hop.py

# 5. batch/k sweep (donated)
run sweep_bench 3600 $PY scripts/sweep_bench.py

# 6. eval-dirs --device throughput (incl. the dense-target raised-cap path)
run bench_eval 2400 $PY scripts/bench_eval.py

# 7. headline bench
run bench 2400 $PY bench.py

echo "ALL DONE $(date)" | tee -a $LOG
