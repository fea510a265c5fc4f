#!/bin/bash
# Round-5 TPU sweep: every row SWEEP_r05.md needs + cache warm-up for the
# driver's end-of-round bench. Serialized (one TPU chip, one host core).
#
# Cold --od-only runs FIRST so the persistent .jax_cache / aot caches are
# warm for every later leg and for the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r5_sweep}
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
run bench_pallas    1800 python bench.py                # driver-mirror run (MC + OD legs, warm)
run bench_b100k     1500 "${NO_OD[@]}" env NYX_BENCH_B=100000 python bench.py   # north star row
run bench_encke     1500 "${NO_OD[@]}" env NYX_BENCH_MODE=encke python bench.py  # keep-or-demote row
run example01_tpu   1800 env NYX_EX01_TPU=1 python examples/01_orbit_prop.py
run example02_tpu   1800 python examples/02_jwst_covar_monte_carlo.py
run example03_drift 1500 python examples/03_geo_analysis.py --drift-bench
run example03_raise 3000 python examples/03_geo_analysis.py
run example03_sk    2400 python examples/03_geo_analysis.py --stationkeeping
run example04_tpu   7000 python examples/04_lro_od.py   # 24 h, 80x80, EKF + two-way + SNC + rejection
run example04_cpu   5400 env NYX_EX04_CPU=1 python examples/04_lro_od.py  # same config, CPU head-to-head
run example05_tpu   1800 python examples/05_caps_interlink_od.py
run example06_tpu   3000 python examples/06_lunar_od.py
echo "== all done $(date +%H:%M:%S) =="
