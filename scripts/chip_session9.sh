#!/bin/bash
# Round-4 TPU session 9: close the remaining per-apply gap + deciders.
#   1. ewald split tuning on the real flagship geometry (a-scales x skin),
#      near/far component split — finds the fast point for the coupled legs.
#   2. Coupled oocyte + ellipsoid at the tuned point, device-built shell
#      (init drop), skin from the tuner.
#   3. vpu_ops x3: the stresslet single-select vs double-where decider
#      (vpu_ops3 leaned double-where +6% at 2-4% spread; need consistency).
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs_r4c}
mkdir -p "$LOGDIR"
cd "$REPO"

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    for attempt in 1 2; do
        echo "[chip_session9] >>> $name (attempt $attempt) $(date +%T)"
        timeout "$tmo" "$@" >"$LOGDIR/$name.a$attempt.out" \
                           2>"$LOGDIR/$name.a$attempt.err"
        local rc=$?
        echo "[chip_session9] <<< $name rc=$rc ($(tail -c 300 "$LOGDIR/$name.a$attempt.out" | tr '\n' ' '))"
        [ $rc -eq 0 ] && break
    done
}

# leg 0: split tuner on the oocyte geometry, both skins
run tune_oocyte_skin25 3600 python scripts/bench_ewald_tune.py \
    --fibers 3000 --fiber-nodes 32 --shell-nodes 6000 --ds-min 0.1 \
    --a-scales 0.7,1.0,1.4,2.0 --skin 0.25
run tune_oocyte_skin10 3600 python scripts/bench_ewald_tune.py \
    --fibers 3000 --fiber-nodes 32 --shell-nodes 6000 --ds-min 0.1 \
    --a-scales 0.7,1.0,1.4,2.0 --skin 0.10

# leg 0b: near-field kernel variants at the default split point
run tune_oocyte_poly 3600 python scripts/bench_ewald_tune.py \
    --fibers 3000 --fiber-nodes 32 --shell-nodes 6000 --ds-min 0.1 \
    --a-scales 1.0,1.4 --skin 0.10 --near-poly
run tune_oocyte_mxu 3600 python scripts/bench_ewald_tune.py \
    --fibers 3000 --fiber-nodes 32 --shell-nodes 6000 --ds-min 0.1 \
    --a-scales 1.0,1.4 --skin 0.10 --near-mxu

# leg 1: stresslet select decider (3 independent runs)
run vpu_ops_a 1800 python scripts/bench_vpu_ops.py
run vpu_ops_b 1800 python scripts/bench_vpu_ops.py
run vpu_ops_c 1800 python scripts/bench_vpu_ops.py

# leg 2: coupled oocyte walls-off A/B at the best tuned point.
#   NOTE: inspect tune_oocyte_* output and override EWALD_A/SKIN below
#   before launching if the tuner found a better point; defaults rerun
#   the session-7 configuration with the device-built shell.
EWALD_A=${EWALD_A:-}
SKIN=${SKIN:-0.10}
EXTRA=()
[ -n "$EWALD_A" ] && EXTRA+=(--ewald-a "$EWALD_A")
run ref_pallas_devshell 2700 python scripts/bench_oocyte.py \
    --evaluator pallas --no-walls --ds-min 0.1 --shell-nodes 6000 \
    --steps 6 --workdir /tmp/bench_oocyte_ref
run ref_ewald_tuned 3600 python scripts/bench_oocyte.py \
    --evaluator ewald --no-walls --ds-min 0.1 --shell-nodes 6000 \
    --steps 6 --plan-skin "$SKIN" "${EXTRA[@]}" \
    --workdir /tmp/bench_oocyte_ref

# leg 3: ellipsoid ewald at skin 0.10 (session-7 win was at 0.25;
# flags match the session-7 ellipsoid legs except steps 4->6)
run ellipsoid_ewald_skin10 3600 python scripts/bench_oocyte.py \
    --shape ellipsoid --evaluator ewald --no-walls --fibers 2000 \
    --fiber-nodes 64 --shell-nodes 8000 --ds-min 0.1 \
    --steps 6 --plan-skin "$SKIN" --workdir /tmp/bench_ellipsoid

echo "[chip_session9] done $(date +%T)"
