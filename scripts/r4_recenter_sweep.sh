#!/bin/bash
# Round-4 item #2: inference-side 1cm@1deg chase on the strict-orbit
# protocol (80 frames, 16 held-out, reuse of runs/e2e_r3_strict_it2).
set -u
cd /root/repo
run() {
  name=$1; shift
  timeout 1200 python -u examples/synthetic_e2e.py --preset full --frames 80 \
    --reuse_run runs/e2e_r3_strict_it2 "$@" > "logs/r4_$name.log" 2>&1
  grep -h "held-out pose metrics" "logs/r4_$name.log" | sed "s/^/$name: /"
}
run baseline80        --eval_conf_thr 0.05
run recenter1         --eval_conf_thr 0.05 --pnp_recenter 1
run recenter1_tight15 --eval_conf_thr 0.05 --pnp_recenter 1 --pnp_tight 1.5
run recenter2_tight15 --eval_conf_thr 0.05 --pnp_recenter 2 --pnp_tight 1.5
run tight15           --eval_conf_thr 0.05 --pnp_tight 1.5
run recenter1_thr002  --eval_conf_thr 0.02 --pnp_recenter 1 --pnp_tight 1.5
echo "RECENTER_SWEEP DONE"
