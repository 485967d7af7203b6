#!/bin/bash
# Round-3 unattended TPU session, POST-poisoning-fix (commit dbfcc47: QR
# fiber inverses + honest GMRES). Everything chip_session4 measured before
# 04:04 is invalid — fiber_error=1.0 meant 5/3000 non-finite fiber inverses
# were feeding NaN through a Givens fallback that reported residual 0.
# Re-measure the decision-critical set in priority order (VERDICT r2):
#   1. oocyte Ewald vs dense Pallas A/B (item #1 — pick the default)
#   2. 1M-point coupled run: matrix-free shell + ewald (item #5)
#   3. VPU slot pricing for the stokeslet MFU question (item #8)
#   4. near-field variants at KG=8 (routing decision input)
#   5. headline bench (driver metric + crossover sweep)
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs_r3b}
WORK=${WORK:-/tmp/bench_oocyte_full}
WORK1M=${WORK1M:-/tmp/bench_oocyte_1m}
mkdir -p "$LOGDIR"
cd "$REPO"

echo "[chip_session5] waiting for the TPU tunnel..."
up=0
for i in $(seq 1 400); do
    if timeout 180 python -c "import jax; assert any(d.platform != 'cpu' for d in jax.devices())" 2>/dev/null; then
        echo "[chip_session5] TPU up (attempt $i, $(date +%T))"
        up=1
        break
    fi
    sleep 90
done
if [ "$up" != 1 ]; then
    echo "[chip_session5] tunnel never came up; exiting without benches"
    exit 1
fi

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    echo "[chip_session5] >>> $name $(date +%T)"
    timeout "$tmo" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
    echo "[chip_session5] <<< $name rc=$? ($(tail -c 400 "$LOGDIR/$name.out" | tr '\n' ' '))"
}

run oocyte_ewald 2400 python scripts/bench_oocyte.py --evaluator ewald \
    --steps 3 --workdir "$WORK"
run oocyte_pallas 2400 python scripts/bench_oocyte.py --evaluator pallas \
    --steps 3 --workdir "$WORK"
run oocyte_1m 5400 python scripts/bench_oocyte.py --evaluator ewald \
    --fibers 20000 --fiber-nodes 48 --shell-nodes 40000 --ds-min 0.015 \
    --matrix-free --steps 2 --workdir "$WORK1M"
run vpu_ops 1800 python scripts/bench_vpu_ops.py
run near_kg8 1200 env SKELLY_NEAR_KG=8 python scripts/bench_near.py \
    --n 100000 --all-variants
run bench 2400 python bench.py
echo "[chip_session5] done $(date +%T)"
