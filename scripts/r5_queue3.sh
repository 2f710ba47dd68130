#!/bin/bash
set -u
cd /root/repo
for i in $(seq 1 1500); do
  grep -q "QUEUE4 DONE" logs/r5_queue4_driver.log 2>/dev/null && break
  sleep 20
done
# Round-5 queue 3 (VERDICT item #6): harden the strict-512 "solved" claim.
# The r4 claim rests on 16 held-out frames of one scene at seed 0
# (binomial 16/16 is consistent with a true rate as low as ~0.83).
# Order: seed 1 at 120 frames (24 held-out), then the multi-object
# variant (ONE matcher jointly trained over two objects — a different
# failure axis than a third seed), then seed 2 if time remains.
set -u
cd /root/repo
# chip is idle between queues here: take the forward-stage roofline
# attribution (VERDICT r4 weak #7) on a clean device
timeout 900 python -u bench.py fwd_profile > logs/r5_fwd_profile.log 2>&1
echo "== fwd_profile rc=$?"

run_seed () {
  S=$1
  timeout 7200 python -u examples/synthetic_e2e.py --preset full --steps 8000 \
    --frames 120 --image 512 --batch 4 --seed $S --eval_conf_thr 0.05 \
    --loftr_ckpt ckpts/loftr_full_r3 --fine_refine --strict_map \
    --refine_iters 2 --matches_cache runs/cache/strict512_s${S}_matches.npz \
    --save_run runs/e2e_r5_strict512_s${S} \
    > logs/e2e_r5_strict512_s${S}.log 2>&1
  echo "== strict512 seed $S rc=$?"
  grep -h "held-out pose metrics\|map:" logs/e2e_r5_strict512_s${S}.log
}

# Wall-clock gates (VERDICT r4 weak #3: twice a capstone run was queued
# too late and died at the round snapshot): each long run starts only if
# it can finish before the end-of-round clean-bench window.
if [ "$(date +%s)" -lt "$(date -d '07:45' +%s)" ]; then
  run_seed 1
else
  echo "== strict512 seed 1 SKIPPED (wall-clock gate)"
fi

if [ "$(date +%s)" -lt "$(date -d '08:05' +%s)" ]; then
  timeout 3600 python -u examples/synthetic_e2e.py --preset full --steps 6000 \
    --frames 80 --image 512 --batch 4 --seed 10 --n_objects 2 \
    --eval_conf_thr 0.05 --loftr_ckpt ckpts/loftr_full_r3 --fine_refine \
    --strict_map --refine_iters 2 \
    --save_run runs/e2e_r5_strict512_multiobj \
    > logs/e2e_r5_strict512_multiobj.log 2>&1
  echo "== strict512 multiobj rc=$?"
  grep -h "held-out pose metrics\|map:" logs/e2e_r5_strict512_multiobj.log
else
  echo "== strict512 multiobj SKIPPED (wall-clock gate: too late to finish)"
fi

if [ "$(date +%s)" -lt "$(date -d '07:45' +%s)" ]; then
  run_seed 2
else
  echo "== strict512 seed 2 SKIPPED (wall-clock gate)"
fi
echo "QUEUE3 DONE"
