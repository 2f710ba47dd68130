#!/bin/bash
# Round-4 wild-robustness chain (VERDICT #1), runs after strict512 frees
# the chip. All training now uses visibility-masked matching/supervision
# (black warp-fill cells excluded) - the r3 truncation-jitter recipe was
# training the matcher to hallucinate matches on dead pixels.
set -u
cd /root/repo
for i in $(seq 1 720); do
  grep -q "STRICT512 DONE" logs/r4_strict512_driver.log 2>/dev/null && break
  sleep 15
done
sleep 10
# A: r3h recipe + mask fix, default wild regime (truncation stress @0.6)
timeout 3600 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_map runs/ffe_r3f --steps 8000 --jitter_shift 0.35 --jitter_scale 0.95 1.5 \
  --n_aug 3 --corrupt 2 --save_run runs/ffe_r4a > logs/ffe_r4a.log 2>&1
# A eval: reference-like regime (wander 0.06)
timeout 1800 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_run runs/ffe_r4a --corrupt 2 --wander 0.06 > logs/ffe_r4a_wander006.log 2>&1
# A eval: radius-0.85 regime
timeout 1800 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_run runs/ffe_r4a --corrupt 2 --wild_radius 0.85 > logs/ffe_r4a_radius085.log 2>&1
# B: extended scale range down to 0.55 (the radius-0.85 blur/scale gap:
# training crops never upsampled; scale<0.68 adds the blurrier regime)
timeout 3600 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_map runs/ffe_r3f --steps 8000 --jitter_shift 0.35 --jitter_scale 0.55 1.6 \
  --n_aug 3 --corrupt 2 --save_run runs/ffe_r4b > logs/ffe_r4b.log 2>&1
timeout 1800 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_run runs/ffe_r4b --corrupt 2 --wild_radius 0.85 > logs/ffe_r4b_radius085.log 2>&1
echo "WILD_CHAIN DONE"
for f in ffe_r4a ffe_r4a_wander006 ffe_r4a_radius085 ffe_r4b ffe_r4b_radius085; do
  echo "== $f"; grep -h "wild-sequence pose metrics\|lost-track recovery" logs/$f.log
done
