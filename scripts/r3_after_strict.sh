#!/bin/bash
set -u
cd /root/repo
for i in $(seq 1 300); do
  if grep -q "STRICT_IT2 DONE" logs/r3_strict_it2_driver.log 2>/dev/null; then
    break
  fi
  sleep 15
done
sleep 15
timeout 900 python -u examples/wild_diag.py --reuse_run runs/ffe_r3h --policy shift \
  > logs/wild_diag_r3h_shift.log 2>&1
timeout 900 python -u examples/wild_diag.py --reuse_run runs/ffe_r3h --policy visq \
  > logs/wild_diag_r3h_visq.log 2>&1
timeout 600 python bench.py > logs/bench_sanity_r3cont.log 2>&1
echo "AFTER_STRICT DONE"
