#!/bin/bash
# Round-4 measurement queue, part D — the two new MXU-starvation levers
# from the r4 per-site decoder profile (/tmp/tpu_r4.log profile_decoder_v2):
#   * SAP3D_STEM_S2D     — space-to-depth stem conv (C_in=3 measured at
#                          5% fwd / 4% f+b efficiency, 5.74 ms f+b of a
#                          ~103 ms step; ops/stem_s2d.py)
#   * SAP3D_HEAD_TCONV_PS — phase-decomposed 1-channel head tconvs
#                          (C_out=1 measured 10%/14%, 2.49 ms f+b;
#                          reuses ops/fast_tconv.py at the head sites only)
# A/B each alone and combined at full train step, then at inference.
# Decision rule: flip the default for any lever that wins >= 1% full-step;
# the reference leg is part C's step_proj_separate (103.33 ms).
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
    >>/tmp/tpu_r4d_probe.log 2>&1
}
echo "probe history $(date)" > /tmp/tpu_r4d_probe.log
for attempt in $(seq 1 48); do
  echo "--- probe $attempt $(date +%H:%M:%S)" >> /tmp/tpu_r4d_probe.log
  probe_once || true
  if grep -q TUNNEL_OK /tmp/tpu_r4d_probe.log; then
    echo "tunnel up after $attempt probe(s) [part D]" | tee -a $LOG
    break
  fi
  if [ "$attempt" -eq 48 ]; then
    echo "tunnel still dead after $attempt probes [part D]" | tee -a $LOG
    exit 1
  fi
  sleep 600
done

# 1. full-step A/Bs (reference leg: part C step_proj_separate 103.33 ms)
run step_stem_s2d 2400 env SAP3D_STEM_S2D=1 $PY scripts/profile_step.py full
run step_head_ps 2400 env SAP3D_HEAD_TCONV_PS=1 $PY scripts/profile_step.py full
run step_stem_and_head 2400 env SAP3D_STEM_S2D=1 SAP3D_HEAD_TCONV_PS=1 \
  $PY scripts/profile_step.py full

# 2. inference with both levers (reference leg: infer_proj_separate 538.6)
run infer_stem_and_head 1800 env SAP3D_STEM_S2D=1 SAP3D_HEAD_TCONV_PS=1 $PY -c "
import bench; cps, mfu = bench.bench_infer(16)
print(f'infer stem+head: {cps:.1f} clips/s MFU {mfu:.3f}')"

echo "PART D ALL DONE $(date)" | tee -a $LOG
