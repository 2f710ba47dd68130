#!/bin/bash
set -u
cd /root/repo
for i in $(seq 1 1500); do
  grep -q "QUEUE1 DONE" logs/r5_queue1_driver.log 2>/dev/null && break
  sleep 20
done
# Round-5 queue 2: eval-time studies on the r5a wild flagship
# (VERDICT items #3 inferred-K joint calibration at 512 crops,
#  #4 wander-regime sub-centimetre push, #5 pipelined accuracy neutrality).
# All runs reuse runs/ffe_r5a (no training).
set -u
cd /root/repo
BASE="timeout 2700 python -u examples/full_frame_e2e.py --preset full \
  --scan_frames 160 --points 800 --loftr_ckpt ckpts/loftr_full_r3 \
  --ground_grid --eval_conf_thr 0.05 --crop 512 --reuse_run runs/ffe_r5a \
  --corrupt 2"

# item 5: pipelined must be AP-neutral now (divergence re-dispatch guard)
$BASE --pipelined > logs/r5_pipelined_default.log 2>&1
echo "== pipelined_default rc=$?"
grep -h "wild-sequence pose metrics\|lost-track recovery" logs/r5_pipelined_default.log

# item 3: inferred-K with JOINT self-calibration on the 512 pipeline
$BASE --calib_ckpt ckpts/calib_r3 --refine_focal --calib_method joint \
  > logs/r5_calib_joint.log 2>&1
echo "== calib_joint rc=$?"
grep -h "inferred K\|self-calibrated\|INFERRED K\|AP delta" logs/r5_calib_joint.log

# item 3 control: the r4 median estimator on the same run
$BASE --calib_ckpt ckpts/calib_r3 --refine_focal --calib_method median \
  > logs/r5_calib_median.log 2>&1
echo "== calib_median rc=$?"
grep -h "inferred K\|self-calibrated\|INFERRED K\|AP delta" logs/r5_calib_median.log

# item 4: wander-regime eval-knob sweep for the 1cm@1deg bracket
# (the w006 control row is queue1's ffe_r5a_w006 run — identical flags)
for v in "--wander 0.06 --pnp_tight 1.5|w006_tight" \
         "--wander 0.06 --pnp_tight 1.5 --pnp_recenter 1|w006_tight_rc" \
         "--wander 0.06 --eval_conf_thr 0.02|w006_thr002"; do
  flags="${v%%|*}"; tag="${v##*|}"
  $BASE $flags > logs/r5_${tag}.log 2>&1
  echo "== $tag rc=$?"
  grep -h "wild-sequence pose metrics" logs/r5_${tag}.log
done
echo "QUEUE2 DONE"
