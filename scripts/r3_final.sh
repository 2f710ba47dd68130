#!/bin/bash
set -u
cd /root/repo
echo "=== calib AP delta on wild run ==="
timeout 1500 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid \
  --eval_conf_thr 0.05 --reuse_run runs/ffe_r3f --corrupt 2 \
  --calib_ckpt ckpts/calib_r3 > logs/ffe_r3f_calib.log 2>&1
grep -E "inferred K|AP delta|INFERRED" logs/ffe_r3f_calib.log | tail -3
echo "=== strict orbit, eval thr 0.02 ==="
timeout 1200 python -u examples/synthetic_e2e.py --preset full \
  --reuse_run runs/e2e_r3_strict --eval_conf_thr 0.02 \
  > logs/e2e_r3_strict_thr002.log 2>&1
grep -E "held-out" logs/e2e_r3_strict_thr002.log | tail -1
echo "FINAL DONE"
