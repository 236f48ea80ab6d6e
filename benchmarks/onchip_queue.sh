#!/bin/bash
# Sequential on-chip experiment queue. Waits for the axon tunnel to come
# back (it has been down for hours — see docs/PERF.md measurement traps),
# then runs every pending TPU measurement, one process at a time (the
# tunnel serializes processes anyway). Logs land in out/onchip/.
cd /root/repo || exit 1
mkdir -p out/onchip

echo "$(date -u +%FT%TZ) queue start; waiting for tunnel" >> out/onchip/queue.log

until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "$(date -u +%FT%TZ) tunnel still down" >> out/onchip/queue.log
  sleep 240
done
echo "$(date -u +%FT%TZ) TUNNEL UP - running queue" >> out/onchip/queue.log

run() {
  name=$1; tmo=$2; shift 2
  echo "$(date -u +%FT%TZ) start $name" >> out/onchip/queue.log
  timeout "$tmo" "$@" > "out/onchip/$name.out" 2> "out/onchip/$name.err"
  echo "$(date -u +%FT%TZ) done $name exit=$?" >> out/onchip/queue.log
}

run verify 1500 python -u benchmarks/verify_onchip.py
run gather_probe 1500 python -u benchmarks/gather_probe.py
run sortg_probe 1500 python -u benchmarks/sortg_probe.py
run bench 1800 python -u bench.py
run crossover 2700 python -u benchmarks/crossover_bench.py --counts 32,48,64,96,128
run config4 1800 python -u benchmarks/scale_bench.py --frames 10 --skip-xla
run culled_ab 5400 python -u benchmarks/culled_ab.py

echo "$(date -u +%FT%TZ) queue DONE" >> out/onchip/queue.log
