#!/bin/bash
# Round-4 queue 5: fixed perf benches + iterated self-calibration eval.
set -u
cd /root/repo
for i in $(seq 1 1440); do
  grep -q "QUEUE4 DONE" logs/r4_queue4_driver.log 2>/dev/null && break
  sleep 15
done
sleep 10
timeout 1200 python -u bench.py closed_loop_real > logs/r4_closed_loop2.log 2>&1
timeout 1200 python -u bench.py train_profile > logs/r4_train_profile2.log 2>&1
# iterated focal self-calibration (2 rounds, stride 4) on the r4a run
timeout 2400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_run runs/ffe_r4a --corrupt 2 --calib_ckpt ckpts/calib_r3 --refine_focal \
  > logs/ffe_r4a_calib2.log 2>&1
echo "QUEUE5 DONE"
tail -2 logs/r4_closed_loop2.log; tail -2 logs/r4_train_profile2.log
grep -h "self-calibrated\|AP delta" logs/ffe_r4a_calib2.log
