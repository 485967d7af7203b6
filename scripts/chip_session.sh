#!/bin/bash
# One unattended TPU measurement session: waits for the tunneled chip, then
# runs the headline bench, the oocyte evaluator A/B, and an ewald_a sweep.
# Logs land in $LOGDIR (default /tmp/chip_logs). Safe to re-run: the oocyte
# precompute npz and the persistent XLA compile cache are reused.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs}
WORK=${WORK:-/tmp/bench_oocyte_full}
mkdir -p "$LOGDIR"
cd "$REPO"

echo "[chip_session] waiting for the TPU tunnel..."
for i in $(seq 1 200); do
    if timeout 180 python -c "import jax; assert any(d.platform != 'cpu' for d in jax.devices())" 2>/dev/null; then
        echo "[chip_session] TPU up (attempt $i)"
        break
    fi
    sleep 90
done

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    echo "[chip_session] >>> $name"
    timeout "$tmo" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
    echo "[chip_session] <<< $name rc=$? ($(tail -c 300 "$LOGDIR/$name.out" | tr '\n' ' '))"
}

run bench 1200 python bench.py
run oocyte_pallas 3600 python scripts/bench_oocyte.py --evaluator pallas \
    --steps 3 --workdir "$WORK"
run oocyte_pallas_nowarm 3600 python scripts/bench_oocyte.py \
    --evaluator pallas --no-warm --steps 3 --workdir "$WORK"
run oocyte_ewald_a18 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --steps 3 --workdir "$WORK"
run oocyte_ewald_a15 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --ewald-a 0.15 --steps 3 --workdir "$WORK"
run oocyte_ewald_a12 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --ewald-a 0.12 --steps 3 --workdir "$WORK"
echo "[chip_session] done; logs in $LOGDIR"
