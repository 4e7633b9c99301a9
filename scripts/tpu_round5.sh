#!/bin/bash
# Round-5 part A — the GN+CBAM family's first silicon measurements
# (round-4 verdict items 2, 5, 6):
#   1. profile_gn.py — full-step ablations for inference_p3d_sa_decoder_block
#      (CBAM cost across the 47 bottlenecks, GN-vs-BN delta, decoder-SA
#      cost) + inference_p3d (GNEasyDecoder).  Decides whether a fused
#      Pallas CBAM epilogue is justified (north-star) or XLA is already
#      near roofline — either way the justification becomes a measurement.
#   2. SAP3D_CONCAT_SPLIT=0 A/B on the GN decoder — the concat-split
#      default was measured only on the flagship's x_* sites (r4); this
#      scopes it to the GN family's differently-shaped _cat sites.
#   3. bench.py with BENCH_MODEL — GN train/infer clips/s headline
#      (BASELINE.json configs 2-3), b16k4 first then b32k8.
#   4. bench_cli_eval.py — the one entry point never timed on silicon.
# Waits for any live tpu_round4f.sh run first (one TPU process at a time).
set -u
REPO=/root/repo
LOG=/tmp/tpu_r5.log
PY="python"
export PYTHONPATH=/root/.axon_site:$REPO
cd $REPO

# wait for part F (pid recorded by the launcher) to release the chip
if [ -f /tmp/r4f.pid ]; then
  while kill -0 "$(cat /tmp/r4f.pid)" 2>/dev/null; do sleep 60; done
fi

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
    >>/tmp/tpu_r5_probe.log 2>&1
}
echo "probe history $(date)" > /tmp/tpu_r5_probe.log
for attempt in $(seq 1 48); do
  echo "--- probe $attempt $(date +%H:%M:%S)" >> /tmp/tpu_r5_probe.log
  probe_once || true
  if grep -q TUNNEL_OK /tmp/tpu_r5_probe.log; then
    echo "tunnel up after $attempt probe(s) [r5A]" | tee -a $LOG
    break
  fi
  if [ "$attempt" -eq 48 ]; then
    echo "tunnel still dead after $attempt probes [r5A]" | tee -a $LOG
    exit 1
  fi
  sleep 600
done

# 1+2. GN family full-step ablations, then the concat-split scope A/B
run gn_ablations 4800 $PY scripts/profile_gn.py
run gn_concat_eager 2400 env SAP3D_CONCAT_SPLIT=0 \
  $PY scripts/profile_gn.py full_sa_decoder

# 3. GN family throughput headlines (bench.py now reports median-of-3 +
# spread); b16k4 is the safe config, b32k8 probes the flagship's knee
run gn_bench_b16 3600 env BENCH_MODEL=inference_p3d_sa_decoder_block \
  BENCH_WD=5e-4 BENCH_TRAIN_BATCH=16 BENCH_TRAIN_K=4 $PY bench.py
run gn_bench_b32 3600 env BENCH_MODEL=inference_p3d_sa_decoder_block \
  BENCH_WD=5e-4 BENCH_TRAIN_BATCH=32 BENCH_TRAIN_K=8 $PY bench.py
run gn_easy_bench_b16 3600 env BENCH_MODEL=inference_p3d \
  BENCH_WD=5e-4 BENCH_TRAIN_BATCH=16 BENCH_TRAIN_K=4 $PY bench.py

# 4. cli eval end-to-end (5-metric protocol @960x1080)
run cli_eval_bench 3600 $PY scripts/bench_cli_eval.py

echo "R5 PART A ALL DONE $(date)" | tee -a $LOG
