#!/bin/bash
set -u
cd /root/repo
for i in $(seq 1 500); do
  if grep -q "HYBRID_STUDY DONE" logs/r3_hybrid_study_driver.log 2>/dev/null; then
    break
  fi
  sleep 15
done
sleep 15
# 1cm@1deg bracket on the iterative-refine strict map (r3 sweeps: thr 0.02
# trades a little 3cm@3deg for the sub-cm bracket)
timeout 1200 python -u examples/synthetic_e2e.py --preset full \
  --reuse_run runs/e2e_r3_strict_it2 --eval_conf_thr 0.02 \
  > logs/e2e_r3_strict_it2_thr002.log 2>&1
# longer truncation-jitter training for the wild matcher
timeout 3000 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_map runs/ffe_r3f --steps 12000 --jitter_shift 0.35 --jitter_scale 0.95 1.5 \
  --n_aug 3 --corrupt 2 --save_run runs/ffe_r3i > logs/full_frame_e2e_r3i.log 2>&1
echo "TAIL_JOBS DONE"
