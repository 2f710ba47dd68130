#!/bin/bash
# Round-4 queue 4: the resolution lever applied to the WILD loop - 512 px
# crops (the reference's own crop size) end-to-end: new 512-crop map,
# truncation-jitter + visibility-masked training, all three wild regimes.
set -u
cd /root/repo
for i in $(seq 1 1200); do
  grep -q "QUEUE3 DONE" logs/r4_queue3_driver.log 2>/dev/null && break
  sleep 15
done
sleep 10
timeout 5400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --loftr_matches_for_map \
  --ground_grid --eval_conf_thr 0.05 --crop 512 --batch 4 --steps 8000 \
  --jitter_shift 0.35 --jitter_scale 0.95 1.5 --n_aug 3 --corrupt 2 \
  --save_run runs/ffe_r4c > logs/ffe_r4c.log 2>&1
timeout 2400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --crop 512 --reuse_run runs/ffe_r4c --corrupt 2 --wander 0.06 \
  > logs/ffe_r4c_wander006.log 2>&1
timeout 2400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --crop 512 --reuse_run runs/ffe_r4c --corrupt 2 --wild_radius 0.85 \
  > logs/ffe_r4c_radius085.log 2>&1
echo "QUEUE4 DONE"
for f in ffe_r4c ffe_r4c_wander006 ffe_r4c_radius085; do
  echo "== $f"; grep -h "wild-sequence pose metrics\|lost-track recovery\|map:" logs/$f.log
done
