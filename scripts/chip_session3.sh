#!/bin/bash
# SUPERSEDED by chip_session6.sh — kept for the round-2 measurement record.
# Round-2 finale session, execution order: near-variant microbench (KG=8) ->
# oocyte Ewald A/B (default, then poly+mxu) -> dense A/B -> near KG=16 ->
# headline bench. Logs to $LOGDIR (default /tmp/chip_logs3).
# NOTE (round 3): its oocyte numbers were later found poisoned (see
# dbfcc47 / VALIDATION.md); the TPU wait loop below was added per ADVICE r2
# so a downed tunnel can no longer silently produce CPU-fallback numbers.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs3}
WORK=${WORK:-/tmp/bench_oocyte_full}
mkdir -p "$LOGDIR"
cd "$REPO"

echo "[chip_session3] waiting for the TPU tunnel..."
up=0
for i in $(seq 1 400); do
    if timeout 180 python -c "import jax; assert any(d.platform != 'cpu' for d in jax.devices())" 2>/dev/null; then
        echo "[chip_session3] TPU up (attempt $i, $(date +%T))"
        up=1
        break
    fi
    sleep 90
done
if [ "$up" != 1 ]; then
    echo "[chip_session3] tunnel never came up; exiting without benches"
    exit 1
fi

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    echo "[chip_session3] >>> $name $(date +%T)"
    timeout "$tmo" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
    echo "[chip_session3] <<< $name rc=$? ($(tail -c 300 "$LOGDIR/$name.out" | tr '\n' ' '))"
}

run near_kg8 1200 env SKELLY_NEAR_KG=8 python scripts/bench_near.py \
    --n 100000 --all-variants
run oocyte_ewald 2400 python scripts/bench_oocyte.py --evaluator ewald \
    --steps 3 --workdir "$WORK"
run oocyte_ewald_poly_mxu 2400 python scripts/bench_oocyte.py \
    --evaluator ewald --near-poly --near-mxu --steps 3 --workdir "$WORK"
run oocyte_pallas 2400 python scripts/bench_oocyte.py --evaluator pallas \
    --steps 3 --workdir "$WORK"
run near_kg16 1200 env SKELLY_NEAR_KG=16 python scripts/bench_near.py \
    --n 100000 --all-variants
run bench 2400 python bench.py
echo "[chip_session3] done $(date +%T)"
