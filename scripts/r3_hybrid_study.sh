#!/bin/bash
set -u
cd /root/repo
for i in $(seq 1 400); do
  if grep -q "WILD_VARIANTS DONE" logs/r3_wild_variants_driver.log 2>/dev/null; then
    break
  fi
  sleep 15
done
sleep 15
timeout 1800 python -u examples/synthetic_e2e.py --preset full \
  --reuse_run runs/e2e_r3_orbit --eval_conf_thr 0.05 \
  --refine learned --tracker_ckpt ckpts/tracker_r3 --tracker_polish \
  --degrade_keep_n 30 --degrade_noise_px 4 --degrade_only_eval \
  > logs/refine_hybrid_r3.log 2>&1
echo "HYBRID_STUDY DONE"
