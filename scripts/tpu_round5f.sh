#!/bin/bash
# Round-5 part F — final config decisions:
#   1. GN train hybrid A/B (SAP3D_FLASH_HYBRID=1): Pallas forward +
#      chunked recompute backward at the GN SA sites vs the 242.46 ms
#      all-chunked default.  Expected delta is large (the fwd alone won
#      +10% at inference), so this leg tolerates host CPU noise.
#   2. Batch-knee sweep under the phase-loss default: b16 single-step
#      phase measured 100.34 ms (=159.5 clips/s) yet b32k8 gives only
#      157.65 — the r4 knee (32) may have moved back to 16.  These legs
#      are noise-sensitive; they run after the concurrent test tier ends.
set -u
REPO=/root/repo
LOG=/tmp/tpu_r5.log
export PYTHONPATH=/root/.axon_site:$REPO
cd $REPO
run() {
  local name=$1 tmo=$2; shift 2
  echo "===== $name $(date +%H:%M:%S) =====" | tee -a $LOG
  timeout "$tmo" "$@" >>$LOG 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" | tee -a $LOG
}
run gn_hybrid 3600 env SAP3D_FLASH_HYBRID=1 SAP3D_FLASH_CEILING_MB=100 \
  python scripts/profile_gn.py full_sa_decoder
run sweep_phase 7200 python scripts/sweep_bench.py 16,4 16,8 32,4
echo "R5 PART F ALL DONE $(date)" | tee -a $LOG
