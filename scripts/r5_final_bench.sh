#!/bin/bash
# End-of-round clean bench (VERDICT #1 protocol): waits for queue 5 to
# drain, then runs the conv-ceiling probe and the FULL bench suite on the
# then-idle chip. Nothing is queued after this.
set -u
cd /root/repo
for i in $(seq 1 700); do
  grep -q "QUEUE5 DONE" logs/r5_queue5_driver.log 2>/dev/null && break
  sleep 15
done
timeout 600 python -u bench.py conv_ceiling > logs/r5_conv_ceiling.log 2>&1
echo "== conv_ceiling rc=$?"
tail -1 logs/r5_conv_ceiling.log
timeout 1800 python -u bench.py all > logs/bench_all_r5_final.log 2>&1
echo "== bench_all rc=$?"
grep -h '"metric"' logs/bench_all_r5_final.log
echo "FINALBENCH DONE"
