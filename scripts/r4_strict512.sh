#!/bin/bash
# Round-4 1cm@1deg attack: the strict-orbit flagship at 512 px render/match
# resolution (the reference's own crop size). Pixel-level match bias is
# roughly constant in px, so doubling the object's pixel span halves its
# angular effect.
set -u
cd /root/repo
timeout 5400 python -u examples/synthetic_e2e.py --preset full --steps 8000 \
  --frames 80 --image 512 --batch 4 --eval_conf_thr 0.05 \
  --loftr_ckpt ckpts/loftr_full_r3 --fine_refine --strict_map \
  --refine_iters 2 --matches_cache runs/cache/strict512_matches.npz \
  --save_run runs/e2e_r4_strict512 > logs/e2e_r4_strict512.log 2>&1
echo "STRICT512 DONE"
grep -h "held-out pose metrics\|map:" logs/e2e_r4_strict512.log
