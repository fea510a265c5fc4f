#!/bin/bash
# Reduced round-3 TPU sweep: the rows SWEEP_r03.md needs + cache warm-up
# for the driver's end-of-round bench. Serialized (one TPU chip).
#
# Order matters: the cold --od-only leg runs FIRST so the persistent
# .jax_cache/.jax_cache/aot caches are warm for every later leg and for
# the driver's own `python bench.py` at end of round.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r3_sweep}
mkdir -p "$OUT"

run() {
    name=$1; shift
    echo "== $name $(date +%H:%M:%S) =="
    ( time timeout 1500 "$@" ) >"$OUT/$name.log" 2>&1
    echo "[$name rc=$? $(date +%H:%M:%S)]"
    tail -2 "$OUT/$name.log"
}

B="env NYX_BENCH_OD_TIMEOUT_S=1"
run od_cold           python bench.py --od-only                            # warms compile+AOT caches
run od_warm           python bench.py --od-only
run bench_pallas      python bench.py                                      # driver-mirror run (MC + OD leg, warm)
run bench_xla         $B env NYX_BENCH_GRAV_BACKEND=xla python bench.py
run bench_b100k       $B env NYX_BENCH_B=100000 python bench.py            # north star row
run example04_tpu     env NYX_EX04_DEGREE=50 python examples/04_lro_od.py
run example03_drift   python examples/03_geo_analysis.py --drift-bench
echo "== all done $(date +%H:%M:%S) =="
