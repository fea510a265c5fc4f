#!/bin/bash
# Watch for the axon TPU tunnel to come back, then run the perf sweep once.
#   bash devtools/tpu_watch.sh [outdir]
# Probes every 10 min (device discovery hangs when the relay is down, so
# each probe is a killable subprocess). Status lines go to stdout; when a
# probe succeeds the full devtools/tpu_sweep.sh matrix runs and the
# watcher exits.

set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_sweep}

while true; do
    if timeout 300 python -c "import jax; print(jax.devices())" \
        >/tmp/tpu_probe.log 2>&1; then
        echo "[tpu_watch] $(date -u +%H:%M:%S) tunnel UP: $(cat /tmp/tpu_probe.log)"
        bash devtools/tpu_sweep.sh "$OUT"
        echo "[tpu_watch] sweep done rc=$? — exiting"
        exit 0
    fi
    echo "[tpu_watch] $(date -u +%H:%M:%S) tunnel still down"
    sleep 600
done
