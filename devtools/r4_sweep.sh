#!/bin/bash
# Round-4 TPU sweep: every row SWEEP_r04.md needs + cache warm-up for
# the driver's end-of-round bench. Serialized (one TPU chip).
#
# Order: the cold --od-only leg runs FIRST so the persistent
# .jax_cache/.jax_cache/aot caches are warm for every later leg and for
# the driver's own `python bench.py` at end of round. That leg's
# `timeout` is a generous 3000 s: it is a cache-warming step whose wall
# time we RECORD but must not kill (ADVICE r3: the 1500 s cap left 47 s
# of headroom and a slow remote compile would cascade cold-compile
# timeouts through every later leg).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_sweep}
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
    name=$1; shift
    t=$1; shift
    echo "== $name $(date +%H:%M:%S) =="
    ( time timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
    echo "[$name rc=$? $(date +%H:%M:%S)]"
    tail -2 "$OUT/$name.log"
}

NO_OD=(env NYX_BENCH_OD_TIMEOUT_S=1)

run od_cold         3000 python bench.py --od-only      # warms compile+AOT caches (recorded, not budgeted)
run od_warm         1500 python bench.py --od-only
run tripwire_f64    1500 python devtools/check_f64_sublane.py
run bench_pallas    1500 python bench.py                # driver-mirror run (MC + OD leg, warm)
run bench_b100k     1500 "${NO_OD[@]}" env NYX_BENCH_B=100000 python bench.py   # north star row
run bench_xla       1500 "${NO_OD[@]}" env NYX_BENCH_GRAV_BACKEND=xla python bench.py
run bench_spi2      1500 "${NO_OD[@]}" env NYX_BENCH_STEPS_PER_ITER=2 python bench.py
run bench_spi4      1500 "${NO_OD[@]}" env NYX_BENCH_STEPS_PER_ITER=4 python bench.py
run bench_encke     1500 "${NO_OD[@]}" env NYX_BENCH_MODE=encke python bench.py  # keep-or-demote row
run example03_drift 1500 python examples/03_geo_analysis.py --drift-bench
run example03_raise 1800 python examples/03_geo_analysis.py
run example03_sk    2400 python examples/03_geo_analysis.py --stationkeeping
run example04_tpu   3000 python examples/04_lro_od.py   # 24 h, 80x80, two-way + SNC + rejection
run example02_tpu   1800 python examples/02_jwst_covar_monte_carlo.py
run example05_tpu   1800 python examples/05_caps_interlink_od.py
run example06_tpu   2400 python examples/06_lunar_od.py
echo "== all done $(date +%H:%M:%S) =="
