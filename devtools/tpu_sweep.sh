#!/bin/bash
# TPU perf sweep: run after the axon tunnel is confirmed up.
#   bash devtools/tpu_sweep.sh [outdir]
# Probes the device, then measures: bench.py (full-state default) with the
# XLA and Pallas gravity backends, batch/steps-per-iter variants, the
# B=100k north-star config, the Encke opt-in modes, the OD-only bench
# (twice: AOT-cold and AOT-warm), and the example smokes. Each step is
# individually time-bounded; results land in $OUT/*.log.

set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_sweep}
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 120 python -c "import jax; print(jax.devices())"; then
    echo "TPU tunnel is down (probe timed out) — aborting"
    exit 1
fi

run() {
    name=$1; shift
    echo "== $name =="
    ( time timeout 1800 "$@" ) >"$OUT/$name.log" 2>&1
    rc=$?
    tail -3 "$OUT/$name.log"
    echo "[$name rc=$rc]"
}

# NYX_BENCH_OD_TIMEOUT_S=1 skips the embedded OD sub-bench (od_only below
# measures it once); each MC entry then times pure propagation throughput.
B="env NYX_BENCH_OD_TIMEOUT_S=1"
run bench_full         $B python bench.py   # the default: full-state RK89
run bench_full_pallas  $B env NYX_BENCH_GRAV_BACKEND=pallas python bench.py
run bench_full_b8192   $B env NYX_BENCH_B=8192 python bench.py
run bench_full_spi4    $B env NYX_BENCH_STEPS_PER_ITER=4 python bench.py
run bench_full_b100k   $B env NYX_BENCH_B=100000 python bench.py  # north star
run bench_encke_abm    $B env NYX_BENCH_MODE=encke python bench.py
run bench_encke_rk     $B env NYX_BENCH_MODE=encke NYX_BENCH_ENCKE_INTEG=rk python bench.py
run od_only_cold       python bench.py --od-only
run od_only_warm       python bench.py --od-only
run example04          env NYX_EX04_DEGREE=50 python examples/04_lro_od.py
run example03_drift    python examples/03_geo_analysis.py --drift-bench
run example01_tpu      env NYX_EX01_TPU=1 python examples/01_orbit_prop.py

echo "== summary =="
grep -h '"metric"\|OD_STEPS_PER_S\|traj/s' "$OUT"/*.log | tail -12
