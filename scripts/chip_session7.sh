#!/bin/bash
# Round-4 TPU session: plan-reuse A/B, the 1M-point run, the emulated
# cost-vs-tol curve, and the fixed VPU microbench.
#   1. walls-on oocyte A/B (VERDICT r3 #1): dense Pallas vs ewald with
#      Verlet-skin plan reuse vs ewald --plan-skin 0 (round-3 baseline).
#   2. walls-off ewald leg with reuse (headline vs dense 0.362 s/step).
#   3. 1M-point coupled run (VERDICT r3 #2) on chunked real spectra +
#      the HBM-budgeted splitting width.
#   4. emulated cost-vs-tol curve at oocyte scale (VERDICT r3 #4) with
#      the round-4 "rhs" tolerance scope — re-measures the 145-iteration
#      28.2 s/step round-3 point.
#   5. fixed bench_vpu_ops (VERDICT r3 #5): self-validating slot prices +
#      the stresslet select-variant A/B.
# Init-phase INFO lines (VERDICT r3 #8) land in every leg's .err file.
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

# leg 1: walls-on A/B — reuse vs dense vs rebuild-every-step
run walls_ewald_reuse 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --ds-min 0.1 --shell-nodes 6000 --steps 6 --workdir "$WORKWALL"
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

# leg 4: rebuild-every-step ewald baseline (isolates the reuse win)
run walls_ewald_noreuse 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --plan-skin 0 --ds-min 0.1 --shell-nodes 6000 --steps 6 --workdir "$WORKWALL"

# leg 5: emulated cost-vs-tol at oocyte scale (round-3: 28.2 s/step,
# 145 iters at 1e-8 under the old increment scope)
run emulated_tol8 3600 python scripts/bench_oocyte.py --evaluator pallas \
    --no-walls --ds-min 0.1 --shell-nodes 6000 --precision emulated \
    --tol 1e-8 --steps 3 --workdir "$WORKREF"

# leg 6: fixed VPU slot pricing + stresslet select A/B
run vpu_ops 1800 python scripts/bench_vpu_ops.py

run emulated_tol6 3600 python scripts/bench_oocyte.py --evaluator pallas \
    --no-walls --ds-min 0.1 --shell-nodes 6000 --precision emulated \
    --tol 1e-6 --steps 3 --workdir "$WORKREF"
run emulated_tol10 4500 python scripts/bench_oocyte.py --evaluator pallas \
    --no-walls --ds-min 0.1 --shell-nodes 6000 --precision emulated \
    --tol 1e-10 --steps 3 --workdir "$WORKREF"
run emulated_tol4 3600 python scripts/bench_oocyte.py --evaluator pallas \
    --no-walls --ds-min 0.1 --shell-nodes 6000 --precision emulated \
    --tol 1e-4 --steps 3 --workdir "$WORKREF"

echo "[chip_session7] done $(date +%T)"

# appended leg: smaller skin — if 0.25·r_cut inflates the near-field
# candidate set enough to eat the plan-build savings, 0.1 is the fallback
run walls_ewald_skin01 3600 python scripts/bench_oocyte.py --evaluator ewald \
    --plan-skin 0.1 --ds-min 0.1 --shell-nodes 6000 --steps 6 \
    --workdir "$WORKWALL"
echo "[chip_session7] appended legs done $(date +%T)"

# appended: the reference's SECOND flagship example (examples/ellipsoid:
# 2000 fibers x 64 nodes + 8000-node ellipsoidal periphery, 536k DOF) —
# BASELINE.md metric 2 coverage beyond the oocyte
run ellipsoid_pallas 3600 python scripts/bench_oocyte.py --shape ellipsoid \
    --no-walls --fibers 2000 --fiber-nodes 64 --shell-nodes 8000 \
    --ds-min 0.1 --evaluator pallas --steps 4 --workdir /tmp/bench_ellipsoid
run ellipsoid_ewald 3600 python scripts/bench_oocyte.py --shape ellipsoid \
    --no-walls --fibers 2000 --fiber-nodes 64 --shell-nodes 8000 \
    --ds-min 0.1 --evaluator ewald --steps 4 --workdir /tmp/bench_ellipsoid
echo "[chip_session7] ellipsoid legs done $(date +%T)"
