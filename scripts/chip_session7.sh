#!/bin/bash
# Round-4 TPU session #1: plan-reuse A/B + the 1M-point run.
#   1. walls-on oocyte A/B (VERDICT r3 #1): dense Pallas vs ewald with
#      Verlet-skin plan reuse (default 0.25) vs ewald --plan-skin 0
#      (round-3 rebuild-every-step baseline). 6 timed steps so the
#      steady-state refresh cadence shows.
#   2. walls-off ewald leg with reuse (headline vs dense 0.362 s/step).
#   3. 1M-point coupled run (VERDICT r3 #2) on the chunked real spectra +
#      HBM-budgeted splitting width.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs_r4a}
WORKREF=${WORKREF:-/tmp/bench_oocyte_ref}
WORKWALL=${WORKWALL:-/tmp/bench_oocyte_walls}
WORK1M=${WORK1M:-/tmp/bench_oocyte_1m}
mkdir -p "$LOGDIR"
cd "$REPO"

echo "[chip_session7] waiting for the TPU tunnel..."
up=0
for i in $(seq 1 400); do
    if timeout 180 python -c "import jax; assert any(d.platform != 'cpu' for d in jax.devices())" 2>/dev/null; then
        echo "[chip_session7] TPU up (attempt $i, $(date +%T))"
        up=1
        break
    fi
    sleep 90
done
if [ "$up" != 1 ]; then
    echo "[chip_session7] tunnel never came up; exiting without benches"
    exit 1
fi

run() { # name timeout cmd... — one retry (compile-helper wedges hit the
        # persistent cache on the second pass)
    local name=$1 tmo=$2; shift 2
    for attempt in 1 2; do
        echo "[chip_session7] >>> $name (attempt $attempt) $(date +%T)"
        timeout "$tmo" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
        local rc=$?
        echo "[chip_session7] <<< $name rc=$rc ($(tail -c 400 "$LOGDIR/$name.out" | tr '\n' ' '))"
        [ $rc -eq 0 ] && break
    done
}

# leg 1: walls-on A/B — reuse vs rebuild-every-step vs dense
run walls_ewald_reuse 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --ds-min 0.1 --shell-nodes 6000 --steps 6 --workdir "$WORKWALL"
run walls_ewald_noreuse 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --plan-skin 0 --ds-min 0.1 --shell-nodes 6000 --steps 6 --workdir "$WORKWALL"
run walls_pallas 2700 python scripts/bench_oocyte.py --evaluator pallas \
    --ds-min 0.1 --shell-nodes 6000 --steps 6 --workdir "$WORKWALL"

# leg 2: walls-off ewald with reuse (dense reference: 0.362 s/step r3)
run ref_ewald_reuse 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --no-walls --ds-min 0.1 --shell-nodes 6000 --steps 6 --workdir "$WORKREF"

# leg 3: the 1M-point coupled run (chunked real spectra, auto-a HBM budget)
run oocyte_1m 7200 env SKELLY_EWALD_SPECTRA_GB=3.0 \
    python scripts/bench_oocyte.py --evaluator ewald \
    --fibers 31000 --fiber-nodes 32 --shell-nodes 8000 --ds-min 0.012 \
    --matrix-free --steps 3 --workdir "$WORK1M"

echo "[chip_session7] done $(date +%T)"
