#!/bin/bash
# Round-4 queue 7: final wild flagship retrain on the fused training path
# (r4c recipe: 512 crops, truncation jitter, supervision gating) + all
# three regimes with the retry recovery policy.
set -u
cd /root/repo
timeout 5400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --loftr_matches_for_map \
  --ground_grid --eval_conf_thr 0.05 --crop 512 --batch 4 --steps 8000 \
  --jitter_shift 0.35 --jitter_scale 0.95 1.5 --n_aug 3 --corrupt 2 \
  --save_run runs/ffe_r4d > logs/ffe_r4d.log 2>&1
for v in "" "--wander 0.06|w006" "--wild_radius 0.85|r085"; do
  flags="${v%%|*}"; tag="${v##*|}"; [ "$tag" = "$flags" ] && tag=default
  timeout 2400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
    --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
    --crop 512 --reuse_run runs/ffe_r4d --corrupt 2 $flags \
    > logs/ffe_r4d_$tag.log 2>&1
  echo "== r4d_$tag"
  grep -h "wild-sequence pose metrics\|lost-track recovery" logs/ffe_r4d_$tag.log
done
echo "QUEUE7 DONE"
