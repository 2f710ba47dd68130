#!/bin/bash
# Round-4 queue 2: runs after the wild chain. Calibration self-calib eval,
# strict-512 eval sweeps, perf profiles.
set -u
cd /root/repo
for i in $(seq 1 960); do
  grep -q "WILD_CHAIN DONE" logs/r4_wild_chain_driver.log 2>/dev/null && break
  sleep 15
done
sleep 10
# 1. inferred-K + focal self-calibration on the round-4 wild run
timeout 2400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_run runs/ffe_r4a --corrupt 2 --calib_ckpt ckpts/calib_r3 --refine_focal \
  > logs/ffe_r4a_calib.log 2>&1
# 2. strict-512 eval variants (scene re-rendered at 512 from seed 0)
timeout 1800 python -u examples/synthetic_e2e.py --preset full --frames 80 --image 512 \
  --reuse_run runs/e2e_r4_strict512 --eval_conf_thr 0.05 --pnp_recenter 1 --pnp_tight 1.5 \
  > logs/r4_s512_recenter.log 2>&1
timeout 1800 python -u examples/synthetic_e2e.py --preset full --frames 80 --image 512 \
  --reuse_run runs/e2e_r4_strict512 --eval_conf_thr 0.02 \
  > logs/r4_s512_thr002.log 2>&1
timeout 2400 python -u examples/synthetic_e2e.py --preset full --frames 80 --image 512 \
  --reuse_run runs/e2e_r4_strict512 --eval_conf_thr 0.05 --refine correlation \
  > logs/r4_s512_refine.log 2>&1
# 3. perf: train-step attribution + closed-loop with pipelining
timeout 1200 python -u bench.py train_profile > logs/r4_train_profile.log 2>&1
timeout 1200 python -u bench.py closed_loop_real > logs/r4_closed_loop.log 2>&1
echo "QUEUE2 DONE"
grep -h "held-out pose metrics" logs/r4_s512_recenter.log logs/r4_s512_thr002.log 2>/dev/null
grep -h "INFERRED K\|self-calibrated\|AP delta" logs/ffe_r4a_calib.log 2>/dev/null
cat logs/r4_train_profile.log logs/r4_closed_loop.log 2>/dev/null | tail -4
