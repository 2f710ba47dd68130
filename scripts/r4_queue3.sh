#!/bin/bash
# Round-4 queue 3: drift-gate verification on the intermittent-failure
# protocol + wild temporal refinement + pipelined e2e timing.
set -u
cd /root/repo
for i in $(seq 1 960); do
  grep -q "QUEUE2 DONE" logs/r4_queue2_driver.log 2>/dev/null && break
  sleep 15
done
sleep 10
# 1. tightened gate (own_support_ratio 1.0) must still rescue degraded
# frames on the r3 intermittent protocol (r3 corr result: video ATE
# 2.46 -> 1.43, held-out ATE 5.3 -> 1.6)
timeout 1800 python -u examples/synthetic_e2e.py --preset full \
  --reuse_run runs/e2e_r3_orbit --eval_conf_thr 0.05 \
  --refine correlation \
  --degrade_keep_n 30 --degrade_noise_px 4 --degrade_only_eval \
  > logs/r4_refine_corr_gate.log 2>&1
grep -E "refined|accepted" logs/r4_refine_corr_gate.log | tail -5
# 2. wild r4a + temporal refinement
timeout 2400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_run runs/ffe_r4a --corrupt 2 --refine correlation \
  > logs/ffe_r4a_refine.log 2>&1
# 3. pipelined closed-loop inference in the real driver
timeout 2400 python -u examples/full_frame_e2e.py --preset full --scan_frames 160 \
  --points 800 --loftr_ckpt ckpts/loftr_full_r3 --ground_grid --eval_conf_thr 0.05 \
  --reuse_run runs/ffe_r4a --corrupt 2 --pipelined \
  > logs/ffe_r4a_pipelined.log 2>&1
echo "QUEUE3 DONE"
grep -h "fps closed-loop\|lost-track" logs/ffe_r4a_pipelined.log 2>/dev/null
