#!/bin/bash
# Round-5 part B — follow-ups after part A's first GN numbers:
#   gn_full 242.46 ms / no_cbam 228.34 ms (CBAM = 14.1 ms, 5.8%) at b16.
#   1. bn_backbone / decoder_nosa — locate the REST of the GN family's
#      2.35x-vs-flagship step cost (norm swap vs decoder-SA share).
#   2. CLEAN reruns of the combined lever + ref: the 12:19/12:26 legs
#      overlapped host-side CPU jobs on this 1-core machine and read high
#      (combined 102.69, ref 109.76 vs idle-host x11 103.73 / head_phase
#      100.34); both programs are now cache-hit, ~6 min each.
#   3. GN inference clips/s (bench.bench_infer, BENCH_MODEL).
#   4. SAP3D_CONCAT_SPLIT=0 scope A/B on the GN decoder.
#   5. cli-eval end-to-end (verdict item 6).
# Launcher must wait for tpu_round5.sh (part A) to exit first.
set -u
REPO=/root/repo
LOG=/tmp/tpu_r5.log
PY="python"
export PYTHONPATH=/root/.axon_site:$REPO
cd $REPO

run() {
  local name=$1 tmo=$2; shift 2
  echo "===== $name $(date +%H:%M:%S) =====" | tee -a $LOG
  timeout "$tmo" "$@" >>$LOG 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" | tee -a $LOG
}

# clean decision pair first (cache-hit, idle host)
run step_x11_and_phase_clean 2400 env SAP3D_CONCAT_EAGER_SITES=x_1_1 \
  SAP3D_HEAD_PHASE_LOSS=1 $PY scripts/profile_step.py full
run step_full_ref_clean 2400 $PY scripts/profile_step.py full

# GN decomposition
run gn_bn_backbone 3600 $PY scripts/profile_gn.py bn_backbone
run gn_decoder_nosa 3600 $PY scripts/profile_gn.py decoder_nosa

# GN inference headline (median-of-3 + spread via bench._diff_time)
run gn_infer 3600 env BENCH_MODEL=inference_p3d_sa_decoder_block $PY -c "
import bench
cps, mfu, spread = bench.bench_infer(16)
print(f'gn infer b16: {cps:.2f} clips/s  MFU {mfu:.3f}  spread {spread*100:.1f}%')"

# concat-split scope A/B on the GN decoder (default ON measured above)
run gn_concat_eager 3600 env SAP3D_CONCAT_SPLIT=0 \
  $PY scripts/profile_gn.py full_sa_decoder

# cli eval end-to-end
run cli_eval_bench 3600 $PY scripts/bench_cli_eval.py

echo "R5 PART B ALL DONE $(date)" | tee -a $LOG
