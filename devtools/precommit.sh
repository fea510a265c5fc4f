#!/bin/bash
# Pre-commit gate: NO snapshot ships with a red suite.
#   bash devtools/precommit.sh          # fast subset (~3 min, CPU mesh)
#   bash devtools/precommit.sh --full   # the whole suite (~20 min)
#
# Round-2 lesson: a default-changing commit (260fd83) landed without
# re-running the tests its change invalidated; HEAD shipped red. Run this
# before EVERY commit that touches nyx_tpu/ — the fast subset covers the
# integrator, MC (incl. Encke parity), OD filter math, and dynamics; the
# full suite is required before an end-of-round snapshot.
#
# Install as a git hook:  ln -sf ../../devtools/precommit.sh .git/hooks/pre-commit

set -u
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"

if [ "${1:-}" = "--full" ]; then
    exec python -m pytest tests/ -x -q
fi

# Fast subset: every suite whose physics a dynamics/integrator/MC/OD change
# can silently regress. -x: first failure aborts the commit.
exec python -m pytest -x -q \
    tests/test_propagators_gmat.py \
    tests/test_monte_carlo.py \
    tests/test_dynamics.py \
    "tests/test_od.py::TestScanFilter" \
    tests/test_orbit.py
