#!/bin/bash
# Round-4 queue 6: r4c (512-crop) re-evals with the lost-frame second
# attempt + host-path upload optimizations, all three wild regimes.
set -u
cd /root/repo
run() {
  name=$1; shift
  timeout 2400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
    --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
    --crop 512 --reuse_run runs/ffe_r4c --corrupt 2 "$@" > "logs/$name.log" 2>&1
  echo "== $name"
  grep -h "wild-sequence pose metrics\|lost-track recovery\|stats:" "logs/$name.log" | head -3
}
run ffe_r4c_retry
run ffe_r4c_retry_w006 --wander 0.06
run ffe_r4c_retry_r085 --wild_radius 0.85
echo "QUEUE6 DONE"
