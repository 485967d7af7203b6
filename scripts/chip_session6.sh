#!/bin/bash
# Round-3 TPU session #3: the honest oocyte story. Round-3 findings this
# session invalidated every earlier coupled-step measurement:
#   (a) pre-dbfcc47 numbers were poisoned (NaN preconditioner blocks +
#       Givens fallback reporting "converged, residual 0"),
#   (b) the bench config itself was over-constrained — periphery_binding's
#       whole-fiber collision criterion (faithful to
#       fiber_finite_difference.cpp:80-87) plus-hinges every minus-clamped
#       surface fiber at t=0; the reference example never enables it.
# Measured on the reference's own example config (walls off, ds_min 0.1,
# 6000-node shell): dense Pallas 0.361 s/step at 399k DOF, converged,
# fiber_error 1.2e-4. This session completes the matrix:
#   1. ewald leg of the reference-config A/B   (VERDICT #1)
#   2. walls-on (repulsion, no binding) A/B    (harder honest scenario)
#   3. emulated-precision tol 1e-8 leg         (reference-parity tolerance)
#   4. 1M-point coupled run                    (VERDICT #5; shell 8000 —
#      the bf16 stored precond caps the shell; 40k nodes OOMed the helper)
#   5. VPU slot pricing (x64 fix landed)       (VERDICT #8)
#   6. headline bench (now includes the reference-config oocyte A/B)
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs_r3c}
WORKREF=${WORKREF:-/tmp/bench_oocyte_ref}
WORKWALL=${WORKWALL:-/tmp/bench_oocyte_walls}
WORK1M=${WORK1M:-/tmp/bench_oocyte_1m}
mkdir -p "$LOGDIR"
cd "$REPO"

echo "[chip_session6] waiting for the TPU tunnel..."
up=0
for i in $(seq 1 400); do
    if timeout 180 python -c "import jax; assert any(d.platform != 'cpu' for d in jax.devices())" 2>/dev/null; then
        echo "[chip_session6] TPU up (attempt $i, $(date +%T))"
        up=1
        break
    fi
    sleep 90
done
if [ "$up" != 1 ]; then
    echo "[chip_session6] tunnel never came up; exiting without benches"
    exit 1
fi

run() { # name timeout cmd... — one retry: the axon compile helper has been
        # wedging intermittently today; retries hit the persistent cache
    local name=$1 tmo=$2; shift 2
    for attempt in 1 2; do
        echo "[chip_session6] >>> $name (attempt $attempt) $(date +%T)"
        timeout "$tmo" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
        local rc=$?
        echo "[chip_session6] <<< $name rc=$rc ($(tail -c 400 "$LOGDIR/$name.out" | tr '\n' ' '))"
        [ $rc -eq 0 ] && break
    done
}

# (the reference-config ewald leg already ran interactively: 0.604 s/step,
# converged, vs dense Pallas 0.361 — see /tmp 16:20 log + VALIDATION.md)
run oocyte_walls_pallas 2700 python scripts/bench_oocyte.py --evaluator pallas \
    --ds-min 0.1 --shell-nodes 6000 --steps 3 --workdir "$WORKWALL"
run oocyte_walls_ewald 2700 python scripts/bench_oocyte.py --evaluator ewald \
    --ds-min 0.1 --shell-nodes 6000 --steps 3 --workdir "$WORKWALL"
run oocyte_emulated 3600 python scripts/bench_oocyte.py --evaluator pallas \
    --no-walls --ds-min 0.1 --shell-nodes 6000 --precision emulated \
    --tol 1e-8 --steps 3 --workdir "$WORKREF"
run oocyte_1m 5400 python scripts/bench_oocyte.py --evaluator ewald \
    --fibers 31000 --fiber-nodes 32 --shell-nodes 8000 --ds-min 0.012 \
    --matrix-free --steps 2 --workdir "$WORK1M"
run vpu_ops 1800 python scripts/bench_vpu_ops.py
run bench 4500 env SKELLY_BENCH_OOCYTE_WORKDIR="$WORKREF" python bench.py
echo "[chip_session6] done $(date +%T)"
