#!/bin/bash
# Round-4 TPU session 8: the 1M-point retry after the scoped-vmem fix.
#   The session-7 oocyte_1m leg died at COMPILE time: XLA:TPU's 16 MiB
#   scoped-vmem budget was exceeded by a prefix-scan fusion of the 1M-point
#   binning sorts (reduce-window scratch 19.10 MiB — r4a/oocyte_1m.err),
#   which killed the tpu_compile_helper. System's jits now accept
#   SKELLY_XLA_SCOPED_VMEM_KIB (PJRT per-compile option).
# Leg 0 probes that the backend honors compiler_options at all.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
LOGDIR=${LOGDIR:-/tmp/chip_logs_r4b}
WORK1M=${WORK1M:-/tmp/bench_oocyte_1m}
mkdir -p "$LOGDIR"
cd "$REPO"

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    for attempt in 1 2; do
        echo "[chip_session8] >>> $name (attempt $attempt) $(date +%T)"
        timeout "$tmo" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
        local rc=$?
        echo "[chip_session8] <<< $name rc=$rc ($(tail -c 400 "$LOGDIR/$name.out" | tr '\n' ' '))"
        [ $rc -eq 0 ] && break
    done
}

run probe_compiler_options 600 python - <<'EOF'
import jax, jax.numpy as jnp
f = jax.jit(lambda x: jnp.sin(x) * 2.0,
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": 24576})
print("compiler_options ok:", float(f(jnp.float32(0.5))))
EOF

run oocyte_1m 7200 env SKELLY_EWALD_SPECTRA_GB=3.0 \
    SKELLY_XLA_SCOPED_VMEM_KIB=25600 \
    python scripts/bench_oocyte.py --evaluator ewald \
    --fibers 31000 --fiber-nodes 32 --shell-nodes 8000 --ds-min 0.012 \
    --matrix-free --steps 3 --workdir "$WORK1M"

echo "[chip_session8] done $(date +%T)"
