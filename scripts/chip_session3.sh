#!/bin/bash
# Trimmed round-2 finale session: the decision-critical measurements only,
# in priority order (near-variant microbench -> oocyte Ewald A/B -> dense
# A/B -> headline bench). Logs to $LOGDIR (default /tmp/chip_logs3).
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs3}
WORK=${WORK:-/tmp/bench_oocyte_full}
mkdir -p "$LOGDIR"
cd "$REPO"

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
