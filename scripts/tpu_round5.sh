#!/bin/bash
# Round-5 master queue (rewritten after the 12:08 ref-leg timeout).
#
# State when launched (see /tmp/tpu_r4f.log morning run + /tmp/tpu_r4.log):
#   x11_eager measured twice: 103.38 (morning) / 103.73 ms (midday) — stable;
#   head_phase_loss 101.24 ms (morning, order-confounded); ref 107.94 ms
#   (morning, first-leg-biased) / TIMEOUT (midday first leg).  First-in-
#   session legs are unreliable -> the fresh ref leg runs SECOND here.
#   Encoder thin ablations + b48/64 sweep were CUT: diagnostic-only, each
#   costs a ~35-min cold remote compile the GN family needs more.
#
# Sequence (per-leg processes so each gets its own timeout + cache):
#   1. combined x11-eager + head-phase-loss (the candidate default config;
#      cold compile)
#   2. fresh paired ref (cache-hit, ~6 min)
#   3. GN family: full / no_cbam / easy (verdict item 2 — first silicon)
#   4. ref again (session drift bracket for the morning numbers)
# Decision + remaining legs (cli-eval, concat-split scope A/B, final
# flagship bench under flipped defaults) run from tpu_round5b.sh after
# the defaults are decided.
set -u
REPO=/root/repo
LOG=/tmp/tpu_r5.log
PY="python"
export PYTHONPATH=/root/.axon_site:$REPO
cd $REPO

# wait for the orphaned profile_step leg from the stopped r4f queue
# (ORPHAN_PID exported by the launcher; empty = nothing to wait for)
if [ -n "${ORPHAN_PID:-}" ]; then
  while kill -0 "$ORPHAN_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  local name=$1 tmo=$2; shift 2
  echo "===== $name $(date +%H:%M:%S) =====" | tee -a $LOG
  timeout "$tmo" "$@" >>$LOG 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" | tee -a $LOG
}

run step_x11_and_phase 3600 env SAP3D_CONCAT_EAGER_SITES=x_1_1 \
  SAP3D_HEAD_PHASE_LOSS=1 $PY scripts/profile_step.py full
run step_full_ref 2400 $PY scripts/profile_step.py full
run gn_full 3600 $PY scripts/profile_gn.py full_sa_decoder
run gn_no_cbam 3600 $PY scripts/profile_gn.py no_cbam
run gn_easy 3600 $PY scripts/profile_gn.py easy_full
run step_full_ref2 2400 $PY scripts/profile_step.py full

echo "R5 PART A ALL DONE $(date)" | tee -a $LOG
