#!/bin/bash
# Round-3 measurement sequence: waits for the axon TPU tunnel, then runs
#   1. tpu_smoke (Mosaic lowering + bit-exactness gate)
#   2. perf_attr scale 22, degree-relabeled (v6 rowmatch plans)
#   3. perf_attr scale 22, natural order (pad 4.3% vs 12.4%)
#   4. bench.py headline
# sequentially (1-CPU host + one chip: never overlap heavy runs).
# Log: /tmp/measure_r3.log
set -u
cd /root/repo
LOG=/tmp/measure_r3.log
echo "== measure_r3 start $(date +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 240 python -c "import jax; jax.devices(); print('UP')" \
      2>/dev/null | grep -q UP; then
    break
  fi
  echo "$(date +%H:%M:%S) tunnel down, retrying" >> "$LOG"
  sleep 180
done
echo "== tunnel UP $(date +%H:%M:%S)" >> "$LOG"
run() {
  echo "== $* ($(date +%H:%M:%S))" >> "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  echo "== rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}
run python scripts/tpu_smoke.py 19
run python scripts/perf_attr.py 22 0 0 degree
run python scripts/perf_attr.py 22 0 0 none
run python bench.py
# full capture in case the tunnel recovered late in the round: the
# per-algorithm suite and the scale-24 refresh (plans are prewarmed)
run env BENCH_ALL=1 python bench.py
run env BENCH_SCALE=24 python bench.py
echo "== measure_r3 done $(date +%H:%M:%S)" >> "$LOG"
