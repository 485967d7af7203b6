#!/bin/bash
# Round-3 unattended TPU measurement session. Waits for the tunneled chip
# (ADVICE r2: never bench without the availability check — CPU fallback
# numbers are misleading), then runs the decision-critical measurements in
# priority order, matching execution order:
#   1. oocyte Ewald A/B (default flags)         — VERDICT r2 item #1
#   2. oocyte Ewald A/B (near-poly + near-mxu variants)
#   3. oocyte dense-Pallas baseline
#   4. near-field variant microbench (KG=8, all variants)
#   5. headline bench (driver metric + crossover sweep)
# Logs land in $LOGDIR (default /tmp/chip_logs_r3). Safe to re-run: the
# oocyte precompute npz and the persistent XLA compile cache are reused.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs_r3}
WORK=${WORK:-/tmp/bench_oocyte_full}
mkdir -p "$LOGDIR"
cd "$REPO"

echo "[chip_session4] waiting for the TPU tunnel..."
up=0
for i in $(seq 1 400); do
    if timeout 180 python -c "import jax; assert any(d.platform != 'cpu' for d in jax.devices())" 2>/dev/null; then
        echo "[chip_session4] TPU up (attempt $i, $(date +%T))"
        up=1
        break
    fi
    sleep 90
done
if [ "$up" != 1 ]; then
    echo "[chip_session4] tunnel never came up; exiting without benches"
    exit 1
fi

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    echo "[chip_session4] >>> $name $(date +%T)"
    timeout "$tmo" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
    echo "[chip_session4] <<< $name rc=$? ($(tail -c 300 "$LOGDIR/$name.out" | tr '\n' ' '))"
}

run oocyte_ewald 2400 python scripts/bench_oocyte.py --evaluator ewald \
    --steps 3 --workdir "$WORK"
run oocyte_ewald_poly_mxu 2400 python scripts/bench_oocyte.py \
    --evaluator ewald --near-poly --near-mxu --steps 3 --workdir "$WORK"
run oocyte_pallas 2400 python scripts/bench_oocyte.py --evaluator pallas \
    --steps 3 --workdir "$WORK"
run near_kg8 1200 env SKELLY_NEAR_KG=8 python scripts/bench_near.py \
    --n 100000 --all-variants
run bench 2400 python bench.py
echo "[chip_session4] done $(date +%T)"
