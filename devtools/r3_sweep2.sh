#!/bin/bash
# Round-3 sweep phase 2: the Encke keep-or-demote decision row (with the
# round-3 fixes in place) and steps-per-iter variants. Chained after
# r3_sweep.sh by the session driver; serialized (one TPU chip).
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
run bench_encke       $B env NYX_BENCH_MODE=encke python bench.py
run bench_spi2        $B env NYX_BENCH_STEPS_PER_ITER=2 python bench.py
run bench_spi4        $B env NYX_BENCH_STEPS_PER_ITER=4 python bench.py
echo "== phase2 done $(date +%H:%M:%S) =="
