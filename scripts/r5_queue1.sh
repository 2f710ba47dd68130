#!/bin/bash
# Round-5 queue 1 (VERDICT r4 item #2): finish the wild flagship retrain
# that died at step 1000/8000 at the r4 snapshot (ffe_r4d) — the r4c
# recipe (512 crops, truncation jitter, supervision gating) on the FIXED
# fused training path (advisor r4 high finding: the fused branch no
# longer masks attention), then all three regimes with retry recovery.
# Run EARLY in the round, per VERDICT item #1's protocol.
set -u
cd /root/repo
timeout 7200 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --loftr_matches_for_map \
  --ground_grid --eval_conf_thr 0.05 --crop 512 --batch 4 --steps 8000 \
  --jitter_shift 0.35 --jitter_scale 0.95 1.5 --n_aug 3 --corrupt 2 \
  --save_run runs/ffe_r5a > logs/ffe_r5a.log 2>&1
echo "== r5a train+default rc=$?"
grep -h "wild-sequence pose metrics\|lost-track recovery" logs/ffe_r5a.log
for v in "--wander 0.06|w006" "--wild_radius 0.85|r085"; do
  flags="${v%%|*}"; tag="${v##*|}"
  timeout 2700 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
    --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
    --crop 512 --reuse_run runs/ffe_r5a --corrupt 2 $flags \
    > logs/ffe_r5a_$tag.log 2>&1
  echo "== r5a_$tag rc=$?"
  grep -h "wild-sequence pose metrics\|lost-track recovery" logs/ffe_r5a_$tag.log
done
echo "QUEUE1 DONE"
