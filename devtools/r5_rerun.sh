#!/bin/bash
# Round-5 TPU re-run queue: the legs invalidated or improved after the
# first sweep (scan-budget fixes in ex03-sk/ex06, scan-mode walls in
# ex01/ex05). Serialized; appends into the same sweep output dir so
# r5_sweep_report.py picks the freshest log per leg.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r5_sweep}
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
    name=$1; shift
    t=$1; shift
    echo "== $name $(date +%H:%M:%S) =="
    ( time timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
    rc=$?
    echo "rc=$rc" >>"$OUT/$name.log"
    echo "[$name rc=$rc $(date +%H:%M:%S)]"
    tail -2 "$OUT/$name.log"
}

run example06_tpu   4500 python examples/06_lunar_od.py
run example03_sk    3000 python examples/03_geo_analysis.py --stationkeeping
run example05_tpu   1500 python examples/05_caps_interlink_od.py
run example01_tpu   1200 env NYX_EX01_TPU=1 python examples/01_orbit_prop.py
echo "== all done $(date +%H:%M:%S) =="
