#!/bin/bash
# One unattended TPU measurement session (v2): waits for the tunneled chip,
# then runs — in priority order, since the tunnel window is uncertain —
#   1. the headline bench (driver metric + crossover sweep)
#   2. near-field kernel variant sweep (KG x {A&S, poly, MXU} microbench)
#   3. oocyte-scale step A/B: dense pallas vs ewald, walls on/off,
#      near-variant flags, ewald_a sweep, warm-start off
# Logs land in $LOGDIR (default /tmp/chip_logs). Safe to re-run: the oocyte
# precompute npz and the persistent XLA compile cache are reused.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs}
WORK=${WORK:-/tmp/bench_oocyte_full}
mkdir -p "$LOGDIR"
cd "$REPO"

echo "[chip_session] waiting for the TPU tunnel..."
up=0
for i in $(seq 1 400); do
    if timeout 180 python -c "import jax; assert any(d.platform != 'cpu' for d in jax.devices())" 2>/dev/null; then
        echo "[chip_session] TPU up (attempt $i)"
        up=1
        break
    fi
    sleep 90
done
if [ "$up" != 1 ]; then
    echo "[chip_session] tunnel never came up; exiting without benches"
    exit 1
fi

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    echo "[chip_session] >>> $name"
    timeout "$tmo" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
    echo "[chip_session] <<< $name rc=$? ($(tail -c 300 "$LOGDIR/$name.out" | tr '\n' ' '))"
}

# 1. headline bench
run bench 1800 python bench.py

# 2. near-field kernel variants (microbench; each run is a few minutes)
run near_kg8 1800 env SKELLY_NEAR_KG=8 python scripts/bench_near.py \
    --n 100000 --all-variants
run near_kg16 1800 env SKELLY_NEAR_KG=16 python scripts/bench_near.py \
    --n 100000 --all-variants
run near_kg4 1800 env SKELLY_NEAR_KG=4 python scripts/bench_near.py \
    --n 100000 --all-variants

# 3. oocyte-scale A/B (each: compile + 3 steps)
run oocyte_pallas 3600 python scripts/bench_oocyte.py --evaluator pallas \
    --steps 3 --workdir "$WORK"
run oocyte_ewald 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --steps 3 --workdir "$WORK"
run oocyte_ewald_poly 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --near-poly --steps 3 --workdir "$WORK"
run oocyte_ewald_poly_mxu 3600 python scripts/bench_oocyte.py \
    --evaluator ewald --near-poly --near-mxu --steps 3 --workdir "$WORK"
# reference parity case: the upstream oocyte example runs WITHOUT walls
run oocyte_pallas_nowalls 3600 python scripts/bench_oocyte.py \
    --evaluator pallas --no-walls --steps 3 --workdir "$WORK"
run oocyte_ewald_nowalls 3600 python scripts/bench_oocyte.py \
    --evaluator ewald --no-walls --steps 3 --workdir "$WORK"
# splitting-width sweep (smaller a -> more far-field, less near-field)
run oocyte_ewald_a15 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --ewald-a 0.15 --steps 3 --workdir "$WORK"
run oocyte_ewald_a12 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --ewald-a 0.12 --steps 3 --workdir "$WORK"
# Belos x0=0 iteration-count parity (warm start off)
run oocyte_pallas_nowarm 3600 python scripts/bench_oocyte.py \
    --evaluator pallas --no-warm --steps 3 --workdir "$WORK"
echo "[chip_session] done; logs in $LOGDIR"
