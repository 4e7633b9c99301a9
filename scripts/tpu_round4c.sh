#!/bin/bash
# Round-4 measurement queue, part C — runs AFTER part B drains:
#   * re-runs of the per-site profilers on the scan-chained timer
#     (part A/B numbers from the Python-chained versions are void)
#   * f/g/h projection-schedule A/B (SAP3D_ATTN_PROJ) at full step and
#     at inference, to decide the default (the r4 bisect measured
#     "separate" 1.95 ms vs "fused" 3.02 ms fwd at x_1_3)
#   * batch sweep retry after the flash-bwd scoped-vmem fix (b=32 died
#     on the 16MB scoped default; the kernel now requests a higher limit)
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
    >>/tmp/tpu_r4c_probe.log 2>&1
}
echo "probe history $(date)" > /tmp/tpu_r4c_probe.log
for attempt in $(seq 1 48); do
  echo "--- probe $attempt $(date +%H:%M:%S)" >> /tmp/tpu_r4c_probe.log
  probe_once || true
  if grep -q TUNNEL_OK /tmp/tpu_r4c_probe.log; then
    echo "tunnel up after $attempt probe(s) [part C]" | tee -a $LOG
    break
  fi
  if [ "$attempt" -eq 48 ]; then
    echo "tunnel still dead after $attempt probes [part C]" | tee -a $LOG
    exit 1
  fi
  sleep 600
done

# 1. projection-schedule A/B at full train step (default leg = fused,
#    already measured repeatedly at ~103.6-104 ms)
run step_proj_separate 2400 env SAP3D_ATTN_PROJ=separate $PY scripts/profile_step.py full
run step_proj_fused_lowp 2400 env SAP3D_ATTN_PROJ=fused_lowp $PY scripts/profile_step.py full

# 2. projection A/B at inference (bench_infer only; ~523 clips/s fused)
run infer_proj_separate 1800 env SAP3D_ATTN_PROJ=separate $PY -c "
import bench; cps, mfu = bench.bench_infer(16)
print(f'infer separate: {cps:.1f} clips/s MFU {mfu:.3f}')"
run infer_proj_fused_lowp 1800 env SAP3D_ATTN_PROJ=fused_lowp $PY -c "
import bench; cps, mfu = bench.bench_infer(16)
print(f'infer fused_lowp: {cps:.1f} clips/s MFU {mfu:.3f}')"

# 3. per-site profiles on the scan timer
run profile_decoder_v2 3600 $PY scripts/profile_decoder.py
run ring_hop_v2 2400 $PY scripts/profile_ring_hop.py
run profile_encoder_v2 3600 $PY scripts/profile_encoder.py stages

# 4. sweep retry incl. the post-vmem-fix large batches
run sweep_retry 5400 $PY scripts/sweep_bench.py 24,4 32,4 32,8

echo "PART C ALL DONE $(date)" | tee -a $LOG
