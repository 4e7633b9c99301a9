#!/bin/bash
# Round-4 part F — the two cheap round-5 perf threads (docs/ROADMAP.md):
#   1. x_1_1 per-site eager-concat A/B: x_1_1's concat-split parts are
#      (64,128)-channel — the 64-wide per-part contraction runs the MXU at
#      half width; SAP3D_CONCAT_EAGER_SITES=x_1_1 coalesces JUST that site
#      back to one 192-wide conv (param tree identical).  r4 per-site
#      profile: x_1_1 74% f+b vs x_1_3 91%.
#   2. Encoder-stage thin ablations at full step (stage1 3->1, stage2 8->2,
#      stage3 36->12; shapes unchanged) — bound each stage's TRUE in-step
#      cost before designing any encoder lever (part-D lesson: per-site
#      profiles over-state; only full-step deltas decide).
# Paired fresh `full` reference leg for jitter control (part-C ref was
# 103.33 ms).  Decision rule: flip the x_1_1 default on a >=0.5% win.
# Sequential, one TPU process at a time; appends to /tmp/tpu_r4.log.
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
    >>/tmp/tpu_r4f_probe.log 2>&1
}
echo "probe history $(date)" > /tmp/tpu_r4f_probe.log
for attempt in $(seq 1 48); do
  echo "--- probe $attempt $(date +%H:%M:%S)" >> /tmp/tpu_r4f_probe.log
  probe_once || true
  if grep -q TUNNEL_OK /tmp/tpu_r4f_probe.log; then
    echo "tunnel up after $attempt probe(s) [part F]" | tee -a $LOG
    break
  fi
  if [ "$attempt" -eq 48 ]; then
    echo "tunnel still dead after $attempt probes [part F]" | tee -a $LOG
    exit 1
  fi
  sleep 600
done

# 1. paired reference + the two cheap levers (param trees identical;
#    decision rule: flip any >=0.5% full-step win to default)
run step_full_ref_f 2400 $PY scripts/profile_step.py full
run step_x11_eager 2400 env SAP3D_CONCAT_EAGER_SITES=x_1_1 \
  $PY scripts/profile_step.py full
# phase-space head loss: the 'ds' head never interleaves in training —
# loss computed in phase layout against s2d targets (exact same math,
# ops/fast_tconv.py:phase_head_loss_enabled; grad-parity tested)
run step_head_phase_loss 2400 env SAP3D_HEAD_PHASE_LOSS=1 \
  $PY scripts/profile_step.py full
run step_x11_and_phase 2400 env SAP3D_CONCAT_EAGER_SITES=x_1_1 \
  SAP3D_HEAD_PHASE_LOSS=1 $PY scripts/profile_step.py full

# 2. encoder-stage thin ablations (each compiles a distinct program)
run step_stage1_thin 2400 $PY scripts/profile_step.py stage1_thin
run step_stage2_thin 2400 $PY scripts/profile_step.py stage2_thin
run step_stage3_thin 2400 $PY scripts/profile_step.py stage3_thin

# 3. batch knee upper end — part C moved the knee 16->32 after the
# scoped-VMEM fix; 48/64 are unexplored (HBM 16GB; a compile OOM only
# loses its own leg, sweep_bench catches it)
run sweep_large 7200 $PY scripts/sweep_bench.py 48,8 64,8

echo "PART F ALL DONE $(date)" | tee -a $LOG
