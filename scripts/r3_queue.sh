#!/bin/bash
# Round-3 TPU job queue: waits for the retrained LoFTR, then runs the
# dependent evaluations sequentially (single chip, no overlap).
set -u
cd /root/repo
CKPT=ckpts/loftr_full_r3
# wait for training to finish (history file is written at the end)
while pgrep -f "cli.train_loftr" > /dev/null; do sleep 60; done
if [ ! -d "$CKPT" ]; then echo "no ckpt produced"; exit 1; fi

echo "=== 1. match_error_eval (new ckpt) ==="
timeout 900 python -u examples/match_error_eval.py --loftr_ckpt $CKPT \
  > logs/match_error_r3.log 2>&1
tail -8 logs/match_error_r3.log

echo "=== 2. orbit flagship with new ckpt + symmetric fine + point BA ==="
timeout 3600 python -u examples/synthetic_e2e.py --preset full --steps 8000 \
  --frames 80 --eval_conf_thr 0.05 --loftr_ckpt $CKPT --fine_refine \
  --save_run runs/e2e_r3_orbit > logs/e2e_r3_orbit.log 2>&1
grep -E "map:|held-out|refined" logs/e2e_r3_orbit.log | tail -4

echo "=== 3. full-frame two-phase with new ckpt ==="
timeout 3600 python -u examples/full_frame_e2e.py --preset full --steps 8000 \
  --corrupt 2 --scan_frames 160 --points 800 --loftr_ckpt $CKPT \
  --loftr_matches_for_map --ground_grid --eval_conf_thr 0.05 \
  --save_run runs/ffe_r3f --refine correlation \
  > logs/full_frame_e2e_r3f.log 2>&1
grep -E "map:|wild-sequence pose|oracle|scan-view" logs/full_frame_e2e_r3f.log | tail -5
echo "QUEUE DONE"
