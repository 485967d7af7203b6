#!/bin/bash
# Round-5 TPU session 10 (run AFTER the 1M leg; one chip job at a time):
#   0. VPU ceiling calibration (--calibrate): settles the dual-issue
#      question, writes docs/bench_records/vpu_ceiling.json (bench.py's
#      MFU denominator).  [VERDICT r5 #5]
#   1. vpu_ops x3: the stresslet select decider at higher repeats.
#      [VERDICT r5 #8]
#   2. ewald split tuner on the oocyte geometry (skin x a-scales,
#      near-poly/mxu) -> the fast point for the coupled legs.
#      [VERDICT r5 #3]
#   3. coupled oocyte walls-off A/B at the tuned point + emulated oocyte
#      re-measure at tol 1e-8 post tol-scope fix.  [VERDICT r5 #3, #8]
#   4. bench.py full run to seed docs/bench_records with a fresh record
#      (crossover + oocyte) so the driver's BENCH_r05 headline carries
#      cached deep legs even under a tight budget.  [VERDICT r5 #2]
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-$REPO/docs/chip_logs/r5b}
mkdir -p "$LOGDIR"
cd "$REPO"

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    for attempt in 1 2; do
        echo "[chip_session10] >>> $name (attempt $attempt) $(date +%T)"
        timeout "$tmo" "$@" >"$LOGDIR/$name.a$attempt.out" \
                           2>"$LOGDIR/$name.a$attempt.err"
        local rc=$?
        echo "[chip_session10] <<< $name rc=$rc ($(tail -c 300 "$LOGDIR/$name.a$attempt.out" | tr '\n' ' '))"
        [ $rc -eq 0 ] && break
    done
}

run calibrate 1200 python scripts/bench_vpu_ops.py --calibrate

run vpu_ops_a 1800 python scripts/bench_vpu_ops.py
run vpu_ops_b 1800 python scripts/bench_vpu_ops.py
run vpu_ops_c 1800 python scripts/bench_vpu_ops.py

# split tuner: both skins + kernel variants at the oocyte geometry
run tune_skin10 3600 python scripts/bench_ewald_tune.py \
    --fibers 3000 --fiber-nodes 32 --shell-nodes 6000 --ds-min 0.1 \
    --a-scales 0.7,1.0,1.4,2.0 --skin 0.10
run tune_skin25 3600 python scripts/bench_ewald_tune.py \
    --fibers 3000 --fiber-nodes 32 --shell-nodes 6000 --ds-min 0.1 \
    --a-scales 1.0,1.4 --skin 0.25
run tune_poly 2400 python scripts/bench_ewald_tune.py \
    --fibers 3000 --fiber-nodes 32 --shell-nodes 6000 --ds-min 0.1 \
    --a-scales 1.0,1.4 --skin 0.10 --near-poly

# coupled oocyte A/B, defaults unless EWALD_A/SKIN are exported
EWALD_A=${EWALD_A:-}
SKIN=${SKIN:-0.10}
EXTRA=()
[ -n "$EWALD_A" ] && EXTRA+=(--ewald-a "$EWALD_A")
run ref_pallas 2700 python scripts/bench_oocyte.py \
    --evaluator pallas --no-walls --ds-min 0.1 --shell-nodes 6000 \
    --steps 6 --workdir /tmp/bench_oocyte_ref
run ref_ewald 3600 python scripts/bench_oocyte.py \
    --evaluator ewald --no-walls --ds-min 0.1 --shell-nodes 6000 \
    --steps 6 --plan-skin "$SKIN" "${EXTRA[@]}" \
    --workdir /tmp/bench_oocyte_ref

# emulated oocyte at the reference's tight-tolerance regime, post
# tol-scope fix (VALIDATION "queued" row)
run ref_emulated_tol8 3600 python scripts/bench_oocyte.py \
    --evaluator pallas --no-walls --ds-min 0.1 --shell-nodes 6000 \
    --steps 3 --precision emulated --tol 1e-8 \
    --workdir /tmp/bench_oocyte_ref

# full bench: seeds docs/bench_records (headline prints early by design)
run bench_full 3000 python bench.py

echo "[chip_session10] done $(date +%T)"
