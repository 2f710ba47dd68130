#!/bin/bash
set -u
cd /root/repo
for i in $(seq 1 400); do
  if grep -q "AFTER_STRICT DONE" logs/r3_after_strict_driver.log 2>/dev/null; then
    break
  fi
  sleep 15
done
sleep 15
# reference-like regime: farther wild camera (object ~60% of frame, stays
# inside), full wander — same map + matcher as r3h
timeout 1500 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_run runs/ffe_r3h --corrupt 2 --wild_radius 0.85 --refine correlation \
  > logs/ffe_r3h_radius085.log 2>&1
# milder wander at stress-scale
timeout 1500 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_run runs/ffe_r3h --corrupt 2 --wander 0.06 \
  > logs/ffe_r3h_wander006.log 2>&1
echo "WILD_VARIANTS DONE"
