#!/bin/bash
# Round-5 part C — decide the widened flash gate, then take the round's
# flagship headline under the new defaults.
#   1. SAP3D_FLASH_VMEM_MB=56 admits all three GN decoder SA sites to the
#      Pallas flash kernel (chunked-XLA fallback measured 82.4 ms of the
#      242.5 ms GN step).  The dp4 site's backward working set is ~59MB,
#      above the 64MB Mosaic default -> ceiling raised to 100MB.  If the
#      compile fails (profile_gn prints FAILED), retry at 30MB, which
#      admits pool2 (d=32) + dp3 (d=64) only.
#   2. Same gate at inference (bench.bench_infer; fallback measured
#      202.75 clips/s MFU 0.437).
#   3. bench.py under the round-5 defaults (phase-loss head ON) — the
#      BENCH_r05 headline rehearsal: train b32k8 + infer b16,
#      median-of-3 with spread.
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

run gn_flash_56 3600 env SAP3D_FLASH_VMEM_MB=56 SAP3D_FLASH_CEILING_MB=100 \
  $PY scripts/profile_gn.py full_sa_decoder
if sed -n '/gn_flash_56/,$p' $LOG | grep -q FAILED; then
  run gn_flash_30 3600 env SAP3D_FLASH_VMEM_MB=30 SAP3D_FLASH_CEILING_MB=100 \
    $PY scripts/profile_gn.py full_sa_decoder
fi

run gn_flash_infer 3600 env SAP3D_FLASH_VMEM_MB=56 SAP3D_FLASH_CEILING_MB=100 \
  BENCH_MODEL=inference_p3d_sa_decoder_block $PY -c "
import bench
cps, mfu, spread = bench.bench_infer(16)
print(f'gn flash infer b16: {cps:.2f} clips/s  MFU {mfu:.3f}  spread {spread*100:.1f}%')"

run flagship_headline 5400 $PY bench.py

echo "R5 PART C ALL DONE $(date)" | tee -a $LOG
