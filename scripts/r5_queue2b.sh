#!/bin/bash
set -u
cd /root/repo
for i in $(seq 1 1500); do
  grep -q "QUEUE2 DONE" logs/r5_queue2_driver.log 2>/dev/null && break
  sleep 20
done
# Round-5 queue 2b: close the last inferred-K gap (VERDICT item #3).
# Queue 2's joint estimator at default sampling (stride 8 -> 9 frames)
# reached focal err 1.5%, AP gap 0.077 (target <= 0.05). Two levers:
# a denser joint bundle, and a second outer round (re-detect with the
# refined K; the JOINT estimator has no per-frame bias to compound,
# unlike the r4 median which went 3.8% -> 7.1%).
set -u
cd /root/repo
BASE="timeout 2700 python -u examples/full_frame_e2e.py --preset full \
  --scan_frames 160 --points 800 --loftr_ckpt ckpts/loftr_full_r3 \
  --ground_grid --eval_conf_thr 0.05 --crop 512 --reuse_run runs/ffe_r5a \
  --corrupt 2 --calib_ckpt ckpts/calib_r3 --refine_focal \
  --calib_method joint"

$BASE --calib_stride 3 > logs/r5_calib_joint_dense.log 2>&1
echo "== calib_joint_dense rc=$?"
grep -h "self-calibrated\|INFERRED K\|AP delta" logs/r5_calib_joint_dense.log

$BASE --calib_stride 3 --calib_rounds 2 > logs/r5_calib_joint_r2.log 2>&1
echo "== calib_joint_r2 rc=$?"
grep -h "self-calibrated\|INFERRED K\|AP delta" logs/r5_calib_joint_r2.log
echo "QUEUE2B DONE"
