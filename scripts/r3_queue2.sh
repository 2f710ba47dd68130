#!/bin/bash
set -u
cd /root/repo

echo "=== A. calibration retrain (in-domain, high-res render) ==="
timeout 2700 python -u examples/train_calib.py --preset small --steps 3000 \
  --batch 32 --wild_frac 0.35 --render_size 512 --out ckpts/calib_r3 \
  > logs/calib_train_r3.log 2>&1
grep "held-out" logs/calib_train_r3.log

echo "=== B. tracker retrain (splat clips in the mix) ==="
timeout 1800 python -u examples/train_tracker.py --preset small --steps 1500 \
  --splat_prob 0.5 --out ckpts/tracker_r3 > logs/tracker_train_r3.log 2>&1
tail -2 logs/tracker_train_r3.log

echo "=== C. intermittent-failure study: learned tracker (in-domain) ==="
timeout 1800 python -u examples/synthetic_e2e.py --preset full \
  --reuse_run runs/e2e_r3_orbit --eval_conf_thr 0.05 \
  --refine learned --tracker_ckpt ckpts/tracker_r3 \
  --degrade_keep_n 30 --degrade_noise_px 4 --degrade_only_eval \
  > logs/refine_learned_r3.log 2>&1
grep -E "held-out|refined|accepted|rejected" logs/refine_learned_r3.log | tail -4

echo "=== D. same study: correlation backend (baseline) ==="
timeout 1800 python -u examples/synthetic_e2e.py --preset full \
  --reuse_run runs/e2e_r3_orbit --eval_conf_thr 0.05 \
  --refine correlation \
  --degrade_keep_n 30 --degrade_noise_px 4 --degrade_only_eval \
  > logs/refine_corr_r3.log 2>&1
grep -E "held-out|refined|accepted|rejected" logs/refine_corr_r3.log | tail -4

echo "=== E. strict-map orbit flagship (1cm@1deg attempt) ==="
timeout 3600 python -u examples/synthetic_e2e.py --preset full --steps 8000 \
  --frames 80 --eval_conf_thr 0.05 --loftr_ckpt ckpts/loftr_full_r3 \
  --fine_refine --strict_map --save_run runs/e2e_r3_strict \
  > logs/e2e_r3_strict.log 2>&1
grep -E "map:|held-out" logs/e2e_r3_strict.log | tail -3

echo "=== F. 15k-scale map pipeline on TPU (incl refine stage) ==="
timeout 2400 python -u examples/map_scale_profile.py --points 15000 \
  --frames 48 --refine --real_sampler > logs/map_scale_tpu.log 2>&1
tail -12 logs/map_scale_tpu.log

echo "=== G. benches ==="
timeout 900 python bench.py closed_loop_real > logs/bench_closed_loop.log 2>&1
tail -1 logs/bench_closed_loop.log
timeout 1800 python bench.py all > logs/bench_all_r3.log 2>&1
tail -6 logs/bench_all_r3.log
echo "QUEUE2 DONE"
