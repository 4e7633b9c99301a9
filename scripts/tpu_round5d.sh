#!/bin/bash
# Round-5 part D — confirmations with warm caches and an idle host:
#   1. gn_flash_56 rejection rerun: the 323.59 ms train-side measurement
#      overlapped a CPU-side pytest start; +33% is far beyond the 2-5%
#      contamination band, but the record should carry a clean number.
#   2. GN inference on the NEW DEFAULT gate (no env): must reproduce the
#      ~224 clips/s measured with the explicit SAP3D_FLASH_VMEM_MB=56 —
#      proves the asymmetric-gate default wiring end to end on silicon.
#   3. cli-eval steady-state: the part-B 0.59 frames/s conflated the
#      first compile into the device-forward share; with the jax cache
#      warm this rerun times the protocol itself.
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

run gn_flash_56_clean 2400 env SAP3D_FLASH_VMEM_MB=56 SAP3D_FLASH_CEILING_MB=100 \
  $PY scripts/profile_gn.py full_sa_decoder

run gn_infer_default 2400 env BENCH_MODEL=inference_p3d_sa_decoder_block $PY -c "
import bench
cps, mfu, spread = bench.bench_infer(16)
print(f'gn infer b16 (default gate): {cps:.2f} clips/s  MFU {mfu:.3f}  spread {spread*100:.1f}%')"

run cli_eval_warm 3600 $PY scripts/bench_cli_eval.py

echo "R5 PART D ALL DONE $(date)" | tee -a $LOG
