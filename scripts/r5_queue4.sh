#!/bin/bash
set -u
cd /root/repo
for i in $(seq 1 1500); do
  grep -q "QUEUE2B DONE" logs/r5_queue2b_driver.log 2>/dev/null && break
  sleep 20
done
# Round-5 queue 4 (VERDICT item #7): the learned tracker's one focused
# attempt — retrain on the correlation chain's failure distribution
# (long occlusion, large displacement, splat-heavy content), then the
# intermittent protocol (r4 corr control: logs/r4_refine_corr_gate.log)
# and a NEW momentary-occlusion protocol where the blind correlation
# chain tracks onto the occluder while a visibility head can refuse.
set -u
cd /root/repo
timeout 4200 python -u examples/train_tracker.py --preset small --steps 2500 \
  --splat_prob 0.7 --motion 5.0 --out ckpts/tracker_r5 \
  > logs/tracker_train_r5.log 2>&1
echo "== tracker_r5 train rc=$?"
tail -2 logs/tracker_train_r5.log

STUDY="timeout 1800 python -u examples/synthetic_e2e.py --preset full \
  --reuse_run runs/e2e_r3_orbit --eval_conf_thr 0.05"
DEG="--degrade_keep_n 30 --degrade_noise_px 4 --degrade_only_eval"

# intermittent protocol: learned (retrained) + hybrid, vs the r4 corr control
$STUDY --refine learned --tracker_ckpt ckpts/tracker_r5 $DEG \
  > logs/r5_refine_learned.log 2>&1
echo "== learned rc=$?"; grep -E "held-out|accepted" logs/r5_refine_learned.log | tail -4
$STUDY --refine learned --tracker_ckpt ckpts/tracker_r5 --tracker_polish $DEG \
  > logs/r5_refine_hybrid.log 2>&1
echo "== hybrid rc=$?"; grep -E "held-out|accepted" logs/r5_refine_hybrid.log | tail -4

# momentary-occlusion protocol: correlation control vs learned vs hybrid
for v in "correlation|corr" "learned --tracker_ckpt ckpts/tracker_r5|lrn" \
         "learned --tracker_ckpt ckpts/tracker_r5 --tracker_polish|hyb"; do
  flags="${v%%|*}"; tag="${v##*|}"
  $STUDY --refine $flags --occlude_eval 0.5 \
    > logs/r5_occl_${tag}.log 2>&1
  echo "== occl_$tag rc=$?"; grep -E "held-out|accepted" logs/r5_occl_${tag}.log | tail -4
done
echo "QUEUE4 DONE"
