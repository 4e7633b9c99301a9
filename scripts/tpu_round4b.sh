#!/bin/bash
# Round-4 measurement queue, part B — the steps that were still pending when
# the first queue run was interrupted during sweep_bench (see /tmp/tpu_r4.log
# for part A's results: flash smoke PASS, concat-split +4.9% -> default ON,
# via-2d -30% REJECTED).  Also RE-runs profile_decoder / ring_hop, whose
# part-A numbers were invalidated by the `* 0` feedback-folding bug in the
# chained-timing helpers (fixed to `* 1e-12`).
# Sequential (one TPU process at a time); logs append to /tmp/tpu_r4.log.
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

# gentle single-probe loop in case the tunnel dropped between queue runs
probe_once() {
  timeout 120 $PY -c "
import jax, jax.numpy as jnp
print(jax.devices())
print('TUNNEL_OK', (jnp.ones((1024,1024),jnp.bfloat16)@jnp.ones((1024,1024),jnp.bfloat16)).sum())" \
    >>/tmp/tpu_r4b_probe.log 2>&1
}
echo "probe history $(date)" > /tmp/tpu_r4b_probe.log
for attempt in $(seq 1 48); do
  echo "--- probe $attempt $(date +%H:%M:%S)" >> /tmp/tpu_r4b_probe.log
  probe_once || true
  if grep -q TUNNEL_OK /tmp/tpu_r4b_probe.log; then
    echo "tunnel up after $attempt probe(s) [part B]" | tee -a $LOG
    break
  fi
  if [ "$attempt" -eq 48 ]; then
    echo "tunnel still dead after $attempt probes [part B]" | tee -a $LOG
    exit 1
  fi
  sleep 600
done

# 1. batch/k sweep (was interrupted) — now measures the NEW default
#    (concat-split ON)
run sweep_bench 5400 $PY scripts/sweep_bench.py

# 2. headline bench with the new default
run bench 2400 $PY bench.py

# 3. infer regression bisect (r01 535.4 -> r02 516.6 clips/s)
run bisect_infer 3600 $PY scripts/bisect_infer.py

# 4. decoder site profile, fixed timing methodology (part A's f+b numbers
#    were folded away by XLA — efficiencies >100% / negative)
run profile_decoder 2400 $PY scripts/profile_decoder.py

# 5. ring hop A/B, fixed timing methodology
run ring_hop 2400 $PY scripts/profile_ring_hop.py

# 5b. per-SA-site split of the 23 ms attention share (Pallas vs XLA)
run profile_attention 2400 $PY scripts/profile_attention.py

# 6. eval-dirs --device throughput (incl. dense-target raised-cap path)
run bench_eval 2400 $PY scripts/bench_eval.py

# 7. opt-out leg of the now-default concat-split (verifies the flag wiring
#    on hardware; expect ~108.7 ms/step)
run step_catsplit_off 2400 env SAP3D_CONCAT_SPLIT=0 $PY scripts/profile_step.py full

echo "PART B ALL DONE $(date)" | tee -a $LOG
