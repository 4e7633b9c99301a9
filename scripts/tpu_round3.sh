#!/bin/bash
# Round-3 TPU measurement queue — run when the tunnel is back.
# Sequential (one TPU process at a time), generous per-step timeouts,
# everything logged to /tmp/tpu_r3.log.  Usage: bash scripts/tpu_round3.sh
set -u
REPO=/root/repo
LOG=/tmp/tpu_r3.log
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

# 0. warmup / tunnel check (fail fast if still wedged)
run warmup 600 $PY -c "
import jax, jax.numpy as jnp
print(jax.devices())
print('TUNNEL_OK', (jnp.ones((1024,1024),jnp.bfloat16)@jnp.ones((1024,1024),jnp.bfloat16)).sum())"
grep -q "TUNNEL_OK" $LOG || { echo "tunnel still dead"; exit 1; }

# 0.5 real-hardware smoke of the changed flash kernel (2-D lse / no-lse).
# A failure is loud but NOT fatal: the queue's own steps (bisect, bench)
# would expose a truly broken kernel, and aborting here would waste the
# whole tunnel-recovery window on e.g. a ragged-shape-only failure.
run smoke_flash 1200 $PY scripts/smoke_flash_tpu.py
grep -q "SMOKE PASS" $LOG || echo "WARNING: flash kernel smoke FAILED — inspect $LOG before trusting kernel-path numbers" | tee -a $LOG

# 1. inference regression bisect (lse-free kernel now default primal)
run bisect_infer 2400 $PY scripts/bisect_infer.py

# 2. decoder conv site timings (the perf target)
run profile_decoder 2400 $PY scripts/profile_decoder.py

# 3. full-step ablation decomposition
run profile_step 3600 $PY scripts/profile_step.py

# 4. conv3d-via-2d A/B at full step
run step_via2d 2400 env SAP3D_CONV3D_VIA_2D=1 $PY scripts/profile_step.py full
run step_default 1200 $PY scripts/profile_step.py full

# 4b. concat-split decoder conv A/B (ops/concat_split.py), alone + combined
run step_catsplit 1800 env SAP3D_CONCAT_SPLIT=1 $PY scripts/profile_step.py full
run step_catsplit_via2d 1800 env SAP3D_CONCAT_SPLIT=1 SAP3D_CONV3D_VIA_2D=1 $PY scripts/profile_step.py full

# 5. batch/k sweep (donated)
run sweep_bench 3600 $PY scripts/sweep_bench.py

# 6. headline bench
run bench 2400 $PY bench.py

echo "ALL DONE $(date)" | tee -a $LOG
