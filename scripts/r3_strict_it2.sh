#!/bin/bash
# wait for the r3h wild run to release the TPU, then run the strict-orbit
# flagship with reprojection-centered iterative refinement
set -u
cd /root/repo
for i in $(seq 1 240); do
  if grep -q "wild-sequence metrics (refined)" logs/full_frame_e2e_r3h.log 2>/dev/null; then
    break
  fi
  sleep 15
done
sleep 20
timeout 3600 python -u examples/synthetic_e2e.py --preset full --steps 8000 \
  --frames 80 --eval_conf_thr 0.05 --loftr_ckpt ckpts/loftr_full_r3 \
  --fine_refine --strict_map --refine_iters 2 \
  --matches_cache runs/cache/strict_matches.npz \
  --save_run runs/e2e_r3_strict_it2 > logs/e2e_r3_strict_it2.log 2>&1
echo "STRICT_IT2 DONE"
