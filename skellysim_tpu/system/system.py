"""System orchestration: init from config, implicit solve, time loop, I/O.

TPU-native analogue of the reference's System namespace (src/core/system.cpp):
the per-timestep work — operator/cache assembly, RHS build, matrix-free GMRES
over the block solution vector [fibers | shell | bodies], state advance, and
the fiber error metric — is traced into one jitted function, so a timestep is
a single XLA computation. The host loop only does adaptive-dt control flow,
backup/restore (cheap pytree references), and trajectory writes
(system.cpp:516-571).

Solution vector layout (system.cpp:69-90): [fibers (4n per fiber) | shell
(3 per node) | bodies (3n+6 per body)].
"""

from __future__ import annotations

import os
import json
import logging
import time as _walltime
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from skellysim_tpu.body import container as bcont
from skellysim_tpu.io import trajectory as tio
from skellysim_tpu.periphery import Shell, ShellState
from skellysim_tpu.periphery import shell as shell_ops
from skellysim_tpu.solver import (GmresCarry, GmresResult, gmres,
                                  gmres_segment)
from skellysim_tpu.system import fiber_system as fs
from skellysim_tpu.system.sources import BackgroundFlow, PointSources
from skellysim_tpu.utils.rng import RNG


def _sys_jit(fun, **jit_kwargs):
    """jax.jit with an optional scoped-vmem override.

    XLA:TPU budgets 16 MiB of "scoped" VMEM for per-op scratch; the compile
    of the ≥1e6-point step exceeds it inside a prefix-scan fusion of the
    slab/cell binning sorts (observed: reduce-window scratch 19.1 MiB >
    16 MiB, chip log r4a/oocyte_1m.err). SKELLY_XLA_SCOPED_VMEM_KIB raises
    the budget per-compile via PJRT compiler options — the supported knob
    for exactly this — without touching smaller configs' defaults."""
    kib = os.environ.get("SKELLY_XLA_SCOPED_VMEM_KIB")
    if kib:
        try:
            platform = jax.devices()[0].platform
        except Exception:  # noqa: BLE001 — backend probe must not break import
            platform = "cpu"
        # explicit TPU allowlist ("tpu" proper and the tunneled "axon"
        # backend) — other platforms reject the unknown compile option
        if platform in ("tpu", "axon"):
            try:
                kib_int = int(kib)
            except ValueError:
                logger.warning(
                    "SKELLY_XLA_SCOPED_VMEM_KIB=%r is not an integer; "
                    "falling back to plain jax.jit", kib)
            else:
                return jax.jit(fun, compiler_options={
                    "xla_tpu_scoped_vmem_limit_kib": kib_int},
                    **jit_kwargs)
    return jax.jit(fun, **jit_kwargs)

logger = logging.getLogger("skellysim_tpu")


def select_evaluators(pair_evaluator: str):
    """Map the config's pair_evaluator to kernel implementations.

    "direct"/"CPU" → pure-XLA kernels in the state dtype (f64): the
    tight-tolerance path, and the analogue of the reference's CPU evaluator.
    "pallas"/"GPU"/"FMM" → Pallas f32 tiled TPU kernels: the per-chip
    speed-of-light path (the reference's GPU/FMM slot).
    Returns (stokeslet_fn, stresslet_fn), None meaning library default.
    """
    if pair_evaluator in ("pallas", "GPU", "FMM"):
        accel = any(d.platform != "cpu" for d in jax.devices())
        if not accel:
            # Pallas TPU kernels cannot compile on the CPU backend; fall back
            # to the XLA evaluators (same physics, the reference's CPU slot)
            logger.info("pair_evaluator %r requested without an accelerator; "
                        "using the XLA direct evaluators", pair_evaluator)
            return None, None
        from skellysim_tpu.kernels.pallas_tpu import (
            stokeslet_apply_pallas,
            stresslet_apply_pallas,
        )

        return stokeslet_apply_pallas, stresslet_apply_pallas
    return None, None


def _measured_tier_pick():
    """Hybrid tier decision from MEASURED apply times, not a constant.

    Reads the newest bench record (docs/bench_records/bench_*.json, written
    by bench.py on the real chip) and builds per-coupling cost models from
    its crossover table {n: dense ms, ewald ms}:

      dense_ms(n_src, n_trg)  = n_src·n_trg / rate   (rate from the largest
                                measured dense point — the pairwise kernels
                                are throughput-flat at scale)
      ewald_ms(n_src, n_trg)  = piecewise-linear in (n_src+n_trg)/2 over
                                the measured points, linear extrapolation
                                beyond (the spectral apply is O(N))

    Returns (tier_fn, description) choosing ewald when its modeled apply
    is cheaper, or None when no record with a crossover table exists (the
    caller falls back to the 2e9-pair heuristic). Override either way with
    params.ewald_hybrid = False (all-ewald)."""
    import glob
    import json as _json

    rec_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "docs", "bench_records")
    best, best_t = None, -1.0
    for path in glob.glob(os.path.join(rec_dir, "bench_*.json")):
        try:
            t = os.path.getmtime(path)
            with open(path) as fh:
                rec = _json.load(fh)
        except Exception:  # noqa: BLE001 — a bad record must not break init
            continue
        cross = rec.get("crossover_ms_per_apply") or {}
        pts = {int(n): v for n, v in cross.items()
               if v.get("dense_s") and v.get("ewald_s")}
        if len(pts) >= 2 and t > best_t:
            best, best_t = (pts, os.path.basename(path)), t
    if best is None:
        return None
    pts, fname = best
    ns = sorted(pts)
    n_big = max(n for n in ns if pts[n]["dense_s"])
    dense_rate = n_big * n_big / pts[n_big]["dense_s"]     # pairs per ms
    xs = np.asarray(ns, np.float64)
    ys = np.asarray([pts[n]["ewald_s"] for n in ns], np.float64)

    def ewald_ms(n_eff):
        if n_eff <= xs[0]:
            return ys[0]
        if n_eff >= xs[-1]:   # O(N) extrapolation from the last segment
            slope = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2])
            return ys[-1] + slope * (n_eff - xs[-1])
        return float(np.interp(n_eff, xs, ys))

    def tier(n_src, n_trg):
        if n_src == 0 or n_trg == 0:
            return False
        d = n_src * n_trg / dense_rate
        e = ewald_ms(0.5 * (n_src + n_trg))
        return e < d

    return tier, f"measured crossover model ({fname})"


def _pairlist_total(pts: np.ndarray, lo, r_cut: float,
                    skin: float = 0.0) -> int:
    """Candidate cluster-pair total for capacity sizing — delegates to the
    plan builder's own counting (ewald_near_cluster.candidate_total) so the
    estimate can never drift from make_plan's device logic. ``skin`` must
    match the skin the plans will be built with (it widens the candidate
    horizon and therefore the capacity)."""
    from skellysim_tpu.kernels.ewald_near_cluster import candidate_total

    p = jnp.asarray(pts)
    return candidate_total(p, p, jnp.asarray(lo, p.dtype), float(r_cut),
                           skin=float(skin))


class Params:
    """Runtime parameters with the reference's C++ fallback defaults
    (src/core/params.cpp:3-20)."""

    def __init__(self, table: dict):
        g = table.get
        self.eta = g("eta", 1.0)
        self.dt_initial = g("dt_initial", 1e-2)
        self.dt_min = g("dt_min", 1e-4)
        self.dt_max = g("dt_max", 2.0)
        self.beta_up = g("beta_up", 1.2)
        self.beta_down = g("beta_down", 0.5)
        self.adaptive_timestep_flag = g("adaptive_timestep_flag", True)
        self.dt_write = g("dt_write", 0.25)
        self.t_final = g("t_final", 1.0)
        self.gmres_tol = g("gmres_tol", 1e-10)
        self.fiber_error_tol = g("fiber_error_tol", 1e-1)
        self.seed = g("seed", 1)
        self.implicit_motor_activation_delay = g("implicit_motor_activation_delay", 0.0)
        self.periphery_interaction_flag = g("periphery_interaction_flag", False)
        self.pair_evaluator = g("pair_evaluator", "direct")
        # spectral-Ewald evaluator knobs (pair_evaluator = "ewald"):
        # splitting width a (None → mean source spacing), grid resolution,
        # and a fixed bounding box [lo, hi] (None → geometry extent + margin)
        self.ewald_a = g("ewald_a", None)
        self.ewald_points_per_a = g("ewald_points_per_a", 3.0)
        self.ewald_support = g("ewald_support", None)
        self.ewald_box = g("ewald_box", None)
        self.ewald_cap = g("ewald_cap", 192)
        self.ewald_tol_override = g("ewald_tol_override", False)
        self.ewald_hybrid = g("ewald_hybrid", True)
        self.ewald_cut_in_a = g("ewald_cut_in_a", None)
        self.ewald_near_mxu = g("ewald_near_mxu", False)
        self.ewald_near_poly = g("ewald_near_poly", False)
        # bf16 storage for the fiber block-Jacobi inverse (precond only —
        # convergence knob, never accuracy); halves the dominant resident
        # array of the ≥1e6-point regime (fd_fiber.factorize docstring)
        self.fiber_precond_bf16 = g("fiber_precond_bf16", False)
        # Verlet-skin plan reuse across timesteps, as a fraction of r_cut:
        # plans rebuild only when some point has moved > min(skin/2, h/2)
        # since their build (near) / > h/2 (far) instead of every step.
        # 0 disables reuse (per-step rebuild, the round-3 behavior).
        self.ewald_plan_skin = g("ewald_plan_skin", 0.25)
        # emulated-precision tolerance scope: "rhs" = Belos parity
        # (||b - Ax|| <= tol*||b||); "increment" = tol on the increment
        # solve (round-3 behavior; more iterations, more accuracy)
        self.emulated_tol_scope = g("emulated_tol_scope", "rhs")
        self.compat_timestep_clock = g("compat_timestep_clock", False)
        # device-mesh wiring (the mpirun analogue): int shard count, or
        # "auto" for jax.device_count(); None runs single-device
        self.n_devices = g("n_devices", None)
        self.gmres_restart = g("gmres_restart", None)
        # host-driven GMRES restart segmentation: one restart cycle per
        # jitted call, partial solution threaded back as x0. None = auto
        # (on for >1.2e6-DOF systems on the tunneled TPU backend, whose
        # worker kills single program executions beyond ~1 minute —
        # docs/chip_logs/r5a/probe_watchdog*)
        self.gmres_segmented = g("gmres_segmented", None)
        self.gmres_warm_start = g("gmres_warm_start", True)
        self.precision = g("precision", "double")
        self.fiber_type = g("fiber_type", "None")
        self.dynamic_instability = table.get("dynamic_instability", None)
        pb = table.get("periphery_binding", None)
        self.periphery_binding = {
            "active": pb.get("active", False) if pb else False,
            "polar_angle_start": pb.get("polar_angle_start", 0.0) if pb else 0.0,
            "polar_angle_end": pb.get("polar_angle_end", np.pi) if pb else np.pi,
            "threshold": pb.get("threshold", 0.75) if pb else 0.75,
        }
        fpi = table.get("fiber_periphery_interaction", {})
        self.fp_f0 = fpi.get("f_0", 20.0)
        self.fp_l0 = fpi.get("l_0", 0.05)


class System:
    """One simulation: state + the compiled step + trajectory stream."""

    def __init__(self, config: dict, output_file: str = "skelly_sim.out",
                 resume: bool = False, listen: bool = False,
                 n_devices=None):
        _t0 = _walltime.perf_counter()
        _phase = {"t": _t0}

        def _mark(name):
            # init-phase attribution (VERDICT r3 #8: the 5-10 min oocyte
            # init was never broken down); one INFO line per phase
            now = _walltime.perf_counter()
            if now - _phase["t"] > 0.05:
                logger.info("init phase %-22s %.2fs", name, now - _phase["t"])
            _phase["t"] = now

        self.config = config
        self.params = Params(config.get("params", {}))
        self.time = 0.0
        self.dt = self.params.dt_initial
        # "single" runs the whole solve in f32 — the TPU production mode
        # (no f64 vector hardware); "double" is the tight-tolerance default;
        # "emulated" is f32 storage/compute with the increment-form solve
        # and double-word state (utils/compensated.py) — the on-chip route
        # to the reference's gmres_tol 1e-10 regime (params.cpp:14).
        self.dtype = (jnp.float32 if self.params.precision in
                      ("single", "float32", "f32", "emulated")
                      else jnp.float64)
        self.emulated = self.params.precision == "emulated"

        self.fibers = fs.FiberEnsemble.from_tables(config.get("fibers", []),
                                                   dtype=self.dtype,
                                                   emulated=self.emulated)
        _mark("fiber ensemble")
        self.point_sources = PointSources.from_tables(
            config.get("point_sources", []), dtype=self.dtype)
        self.background = BackgroundFlow.from_table(
            config.get("background", {}), dtype=self.dtype)

        self.shell: Optional[Shell] = None
        if "periphery" in config:
            if config["periphery"].get("build_on_device"):
                self.shell = shell_ops.shell_from_geometry(config["periphery"],
                                                           dtype=self.dtype)
            else:
                self.shell = Shell.from_precompute(config["periphery"],
                                                   dtype=self.dtype)
        _mark("shell operators")
        self.bodies = bcont.BodyContainer.from_tables(config.get("bodies", []),
                                                      dtype=self.dtype)
        _mark("bodies")

        if self.shell is not None and self.background.is_active:
            raise ValueError("Background sources are incompatible with peripheries "
                             "(reference sanity_check, system.cpp:625-626)")

        # shared + per-process streams (trng split, rng.cpp:18-32): shared
        # draws agree on every process, local draws are process-unique
        self.rng = RNG(self.params.seed, jax.process_index(),
                       jax.process_count())
        self._log_params()

        self._writer: Optional[tio.TrajectoryWriter] = None
        self._output_file = output_file
        self._listen = listen
        self._curr_solution_dev = None
        self._curr_solution_host: Optional[np.ndarray] = None
        self._last_fiber_collision: Optional[bool] = None
        self.curr_solution = np.zeros(self.total_solution_size())
        if resume:
            self._resume_from(output_file)

        # Distribution is init's job (reference: fibers are distributed at
        # System::init with zero user code, system.cpp:632-720,
        # fiber_container_finite_difference.cpp:95-127). Constructor arg
        # wins over params.n_devices; both default to single-device.
        self.mesh = None
        nd = n_devices if n_devices is not None else self.params.n_devices
        if nd is not None:
            self._apply_mesh(nd)
            _mark("mesh sharding")

        # Verlet-skin plan carry (pair_evaluator="ewald"): plans built by
        # _plan_init_fn / rebuilt in-step, reused across steps while the
        # displacement monitor allows. None = (re)seed on next step.
        self._plan_state = None
        self._plan_rebuilds = 0
        self._plan_seeds = 0
        self._plan_steps = 0
        if self.params.pair_evaluator == "ewald" and self.mesh is None:
            # build the evaluators (grid spectra + capacity sizing) HERE so
            # the first step's wall time is trace+compile only; the mesh
            # path built them in _apply_mesh already
            self._ewald_objects()
            _mark("ewald evaluators")
        self._step_fn = self._build_step_fn()
        self._collision_fn = self._build_collision_fn()
        self._velocity_fn = self._build_velocity_fn()
        _mark("step-fn trace setup")
        logger.info("init total %.2fs (compile happens at the first step)",
                    _walltime.perf_counter() - _t0)

    def _apply_mesh(self, n_devices) -> None:
        """Shard the system state over a device mesh — the mpirun analogue.

        Matches the reference's init-time distribution
        (system.cpp:632-720): fiber blocks shard on the batch axis
        (round-robin fiber distribution,
        fiber_container_finite_difference.cpp:95-127), periphery dense
        operators row-shard (Scatterv rows, periphery.cpp:408-442), bodies
        stay replicated (rank-0 residency, body_container.hpp:77-99), and
        the spectral-Ewald evaluators get the mesh for their sharded
        far/near applies. Multi-host-safe: parallel/mesh.put_global builds
        global jax.Arrays from the replicated host config on pods.
        """
        from skellysim_tpu.parallel import mesh as pmesh

        if n_devices in ("auto", True):
            n_devices = jax.device_count()
        n_devices = int(n_devices)
        if n_devices <= 1:
            return
        self.mesh = pmesh.make_mesh(n_devices)
        self._mesh_devices = n_devices

        old_sizes = [4 * b.n_fibers * b.n_nodes for b in self.fibers.blocks]
        old_sol = self.curr_solution
        self._reshard_fibers()

        # remap the solution vector across the padded per-block layout
        # (padding appends rows at each block's end, shifting later blocks)
        new_sizes = [4 * b.n_fibers * b.n_nodes for b in self.fibers.blocks]
        if new_sizes != old_sizes:
            sol = np.zeros(self.total_solution_size())
            oo = no = 0
            for osz, nsz in zip(old_sizes, new_sizes):
                sol[no:no + osz] = old_sol[oo:oo + osz]
                oo += osz
                no += nsz
            sol[no:] = old_sol[oo:]
            self.curr_solution = sol

        if self.shell is not None:
            self.shell.state = pmesh.shard_shell_state(self.shell.state,
                                                       self.mesh)
        if self.params.pair_evaluator == "ewald":
            stk, st = self._ewald_objects()
            stk.mesh = st.mesh = self.mesh
            from skellysim_tpu.kernels.ewald_sharded import (shard_spectra,
                                                             slab_grid_ok)

            if slab_grid_ok(stk.grid, n_devices):
                # place the tabulated spectra y-sharded so each device
                # physically holds 1/n_devices of the dominant buffer —
                # matches far_field_apply_slabbed's in_specs exactly
                grid_sh = shard_spectra(stk.grid, self.mesh)
                stk.grid = grid_sh
                st.grid = grid_sh
                logger.info("ewald spectra y-sharded across %d devices "
                            "(%.0f MB/device)", n_devices,
                            7 * grid_sh.shape[0] * grid_sh.shape[1]
                            * (grid_sh.shape[2] // 2 + 1)
                            * jnp.dtype(self.dtype).itemsize
                            / n_devices / 2**20)
            else:
                logger.info("ewald grid %s not slab-decomposable across %d "
                            "devices; far field falls back to the "
                            "replicated-convolve path", stk.grid.shape,
                            n_devices)
        logger.info("mesh: %d devices (%s); fibers batch-sharded, "
                    "shell rows sharded, bodies replicated",
                    n_devices, self.mesh.devices.ravel()[0].platform)

    def _reshard_fibers(self) -> None:
        """(Re)pad every fiber block to the mesh size and shard its batch
        axis. Called at init and after dynamic-instability capacity growth
        (whose grow chunks need not divide the mesh)."""
        from skellysim_tpu.parallel import mesh as pmesh

        blocks = []
        for blk in self.fibers.blocks:
            padded, _ = pmesh.pad_batch_to(blk, self._mesh_devices)
            blocks.append(pmesh.shard_block_leaves(padded, self.mesh))
        self.fibers.blocks = blocks
        # per-process distribution audit, mirroring the reference's MPI
        # count assertions (unit_test_fibercontainer_finite_difference_mpi:
        # 10 fibers -> 5 local per rank); tests grep this line
        local = sum(sum(s.data.shape[0] for s in b.x.addressable_shards)
                    for b in blocks)
        total = sum(b.n_fibers for b in blocks)
        logger.info("mesh: %d devices / %d process(es); local fiber rows "
                    "%d of %d", self._mesh_devices, jax.process_count(),
                    local, total)

    def _log_params(self):
        """Startup parameter dump (Params::print, src/core/params.cpp:82-106)."""
        p = self.params
        for name in ("eta", "dt_initial", "dt_min", "dt_max", "beta_up",
                     "beta_down", "adaptive_timestep_flag", "dt_write",
                     "t_final", "gmres_tol", "fiber_error_tol", "seed",
                     "pair_evaluator", "precision"):
            logger.info("%-34s = %s", name, getattr(p, name))
        logger.info("%-34s = %d fibers / %d shell nodes / %d bodies",
                    "system", self.fibers.n_fibers,
                    self.shell.state.n_nodes if self.shell else 0,
                    self.bodies.n_bodies)

    # ---- sizes ----
    def fiber_solution_size(self) -> int:
        return self.fibers.solution_size

    def _ewald_objects(self):
        """Build (stokeslet, stresslet) spectral-Ewald evaluators sized to
        the system geometry — the linear-scaling far-field tier standing in
        for the reference's FMM evaluator slot (system.cpp evaluator
        selection; docs/farfield_plan.md).

        The grid box is FIXED at build time: geometry extent + 15% margin
        (or params.ewald_box). Confined systems stay inside; escaping
        sources/targets would alias, so prefer an explicit box for
        unconfined runs.

        The spectra are NOT baked into the jitted step/velocity functions:
        they are threaded through as arguments (``self._ewald_state``) so
        outer jits never embed tens of MB of HLO constants (remote compile
        services reject such payloads).
        """
        if getattr(self, "_ewald_pair", None) is not None:
            return self._ewald_pair
        from skellysim_tpu.kernels.ewald import EwaldStokeslet, EwaldStresslet

        _t = _walltime.perf_counter()
        geom = [fs.positions(self.fibers.blocks)]
        if self.shell is not None:
            geom.append(self.shell.state.nodes)
        if self.bodies.n_bodies:
            caches = bcont.update_caches(self.bodies.states(), self.params.eta)
            geom.append(bcont.positions(caches))
        # multi-process: the fiber batch is process-sharded — allgather to
        # hosts before the host-side box/capacity sizing (collective)
        from skellysim_tpu.parallel import mesh as _pmesh

        geom = _pmesh.host_global(geom)
        pts = [np.asarray(g).reshape(-1, 3) for g in geom if np.size(g)]
        allp = np.concatenate(pts, axis=0) if pts else np.zeros((1, 3))
        # the np.asarray pulls block on every queued device op (fiber repin,
        # the matrix-free shell build) — this timer attributes that backlog
        # (1M-run init mystery: ~530 s inside this phase, r4b logs)
        if _walltime.perf_counter() - _t > 1.0:
            logger.info("ewald geometry gather (incl. queued device work): "
                        "%.2fs", _walltime.perf_counter() - _t)
        if self.params.ewald_box is not None:
            lo, hi = (np.asarray(v, np.float64) for v in self.params.ewald_box)
        else:
            lo, hi = allp.min(0), allp.max(0)
            pad = 0.15 * max(float((hi - lo).max()), 1.0)
            lo, hi = lo - pad, hi + pad
        a = self.params.ewald_a
        if a is None:
            vol = float(np.prod(hi - lo))
            a = max((vol / max(len(allp), 1)) ** (1.0 / 3.0), 1e-3)
            # HBM-aware splitting width: the 7 stored real spectra cost
            # 28 B per padded-grid cell, and grid cells scale as 1/a³. At
            # ≥1e6-point densities the mean-spacing default overruns the
            # chip (round-3: 768×313×625 FFT temps OOM'd the 1M run,
            # docs/chip_logs/r3c/). Grow a until the spectra fit the
            # budget — O(N) memory, trading far-field grid work for near
            # pairs (r_cut scales with a). Explicit params.ewald_a wins.
            from skellysim_tpu.kernels.ewald import spectra_bytes

            budget = float(os.environ.get("SKELLY_EWALD_SPECTRA_GB", "3.0"))
            budget_b = budget * 2**30
            itemsize = 4 if self.dtype == jnp.float32 else 8
            ppa = self.params.ewald_points_per_a
            for _ in range(40):
                need = spectra_bytes(lo, hi, a, ppa,
                                     self.params.ewald_support,
                                     itemsize=itemsize)
                if need <= budget_b:
                    break
                a *= min((need / budget_b) ** (1.0 / 3.0), 1.3)
            else:
                raise RuntimeError(
                    "could not fit the Ewald spectra into "
                    f"SKELLY_EWALD_SPECTRA_GB={budget} — the taper/window "
                    "padding gives the grid a ~10 MiB floor per box; raise "
                    "the budget")
            if need < budget_b and a > 1.001 * max(
                    (vol / max(len(allp), 1)) ** (1.0 / 3.0), 1e-3):
                logger.info(
                    "ewald: splitting width grown to a=%.4g so the spectra "
                    "fit %.1f GB (%.2f GB); near-field r_cut scales with it",
                    a, budget, need / 2**30)
        # tol-aware near-field truncation: erfc(3.0) ≈ 2.2e-5 relative tail —
        # below the f32 evaluator floor and the >= 1e-4 solve tolerances this
        # tier targets; tighter tolerances keep the 3.5a (~5e-6) default.
        # Candidate pair count scales ~ (r_cut + cluster_extent)³, so this is
        # a direct near-field time knob (params.ewald_cut_in_a overrides).
        cut = self.params.ewald_cut_in_a
        support = self.params.ewald_support
        if cut is None:
            cut = 3.0 if self.params.gmres_tol >= 1e-4 else 3.5
        if support is None and self.params.gmres_tol >= 1e-4:
            # measured floors (f32, points_per_a 2.5): support 9 → 1.7e-6,
            # 7 → 2.0e-5, 5 → 3.4e-4; the 1e-4 regime affords 7 (spread and
            # interp cost scale with the window width)
            support = 7
        kw = dict(lo=lo, hi=hi, a=float(a), cut_in_a=float(cut),
                  points_per_a=self.params.ewald_points_per_a,
                  support=support,
                  cap=self.params.ewald_cap, dtype=self.dtype,
                  near_mxu=self.params.ewald_near_mxu,
                  near_poly=self.params.ewald_near_poly,
                  # mesh runs: pad the FFT y dim so the slab-decomposed
                  # distributed far field can transpose across the devices
                  # (ewald_sharded.far_field_apply_slabbed)
                  y_multiple=(getattr(self, "_mesh_devices", 1)
                              if self.mesh is not None else 1))
        _t = _walltime.perf_counter()
        stk = EwaldStokeslet(**kw)
        jax.block_until_ready(stk.grid.khat)
        logger.info("ewald spectra tabulation: %.2fs (grid %s)",
                    _walltime.perf_counter() - _t, stk.grid.shape)
        st = EwaldStresslet(grid=stk.grid, **kw)

        # Geometry-informed capacities. Both the near-field cell lists and
        # the far-field x-slabs drop overflow points, and both cost linearly
        # in their capacity — worst-case sizing (8× uniform mean) made the
        # oocyte-scale solve spend most of its time multiplying padding.
        # Measure the actual occupancy of the initial geometry and add 2×
        # headroom for motion/nucleation.
        def _round_up(v, q):
            return int(-(-int(v) // q) * q)

        gh = stk.grid.h
        glo = np.asarray(stk.grid.lo, np.float64)
        sx = np.floor((allp[:, 0] - glo[0]) / gh + 0.5).astype(int)
        slab_occ = np.bincount(sx - sx.min()).max()
        stk.slab_cap = st.slab_cap = _round_up(2.0 * slab_occ + 64, 128)

        def _near_cap(pts, ev):
            ci = np.floor((pts - ev.lo[None, :]) / ev.cell).astype(int)
            key = ((ci[:, 0] * ev.n_cells[1] + ci[:, 1]) * ev.n_cells[2]
                   + ci[:, 2])
            # 128-quantized: the Pallas near kernel tiles targets in
            # 128-lane blocks and keeps sources on full 128-multiple lanes
            return _round_up(2.0 * np.bincount(key).max() + 32, 128)

        stk.cap = _near_cap(allp, stk)
        # stresslet sources are only the shell/body surfaces — far sparser
        surf = [np.asarray(self.shell.state.nodes)] if self.shell else []
        if self.bodies.n_bodies:
            surf.append(np.asarray(bcont.positions(caches)).reshape(-1, 3))
        st.cap = (_near_cap(np.concatenate(surf, axis=0), st)
                  if surf else stk.cap)
        stk.cap_t = st.cap_t = _near_cap(allp, stk)
        # COO pairlist capacity: measure the candidate-pair total of the
        # initial geometry (conservatively src = trg = all points) and add
        # 1.5× headroom — a mid-run regrow means a full recompile on a
        # remote-compile backend, so size generously up front. Sized at the
        # skin-widened horizon the production plans use (Verlet reuse).
        stk.skin = st.skin = float(self.params.ewald_plan_skin) * stk.r_cut
        _t = _walltime.perf_counter()
        total = _pairlist_total(allp, stk.lo, stk.r_cut, skin=stk.skin)
        logger.info("ewald capacity sizing: %.2fs",
                    _walltime.perf_counter() - _t)
        stk.pair_total = st.pair_total = _round_up(1.5 * total + 64, 4096)
        logger.info("ewald evaluators: box %s..%s a=%.4g grid=%s "
                    "slab_cap=%d near_caps=(%d,%d) pair_total=%d",
                    np.round(lo, 3), np.round(hi, 3), a, stk.grid.shape,
                    stk.slab_cap, stk.cap, st.cap, stk.pair_total)
        if (self.dtype == jnp.float32 and self.params.gmres_tol < 1e-4
                and not self.params.ewald_tol_override):
            # fail fast: below the evaluator's noise floor GMRES stalls and
            # burns restart×max_restarts iterations per step for no accuracy
            # (reference sanity_check precedent, system.cpp:618-627)
            raise ValueError(
                f"gmres_tol {self.params.gmres_tol:.1e} is below the f32 "
                "spectral-Ewald evaluator accuracy (~2e-5 relative): GMRES "
                "would stall at the evaluator noise floor. Use gmres_tol "
                ">= 1e-4, precision='double' (CPU), or pair_evaluator="
                "'pallas'/'direct'; set params.ewald_tol_override = true "
                "to proceed anyway.")
        self._ewald_pair = (stk, st)
        self._ewald_state = stk.spectra()
        return self._ewald_pair

    def shell_solution_size(self) -> int:
        return self.shell.state.solution_size if self.shell else 0

    def body_solution_size(self) -> int:
        return self.bodies.solution_size

    def total_solution_size(self) -> int:
        return (self.fiber_solution_size() + self.shell_solution_size()
                + self.body_solution_size())

    @property
    def curr_solution(self) -> np.ndarray:
        """Host copy of the latest solve's solution vector, fetched lazily.

        The step keeps the solution on device; materializing ~MB-scale
        vectors to host every step is pure waste on tunneled backends
        (~1 MB/s links) — analysis consumers (velocity_at_targets, the
        listener, tests) trigger the one transfer they need here.
        """
        if self._curr_solution_host is None:
            self._curr_solution_host = np.asarray(self._curr_solution_dev)
        return self._curr_solution_host

    @curr_solution.setter
    def curr_solution(self, value) -> None:
        self._curr_solution_dev = value
        self._curr_solution_host = None

    def _auto_gmres_restart(self) -> int:
        """Memory-aware GMRES restart length ("Num Blocks").

        300 is Belos PseudoBlockGmresSolMgr's default; the Krylov basis is a
        (restart+1, n) buffer, which at large n dominates HBM (788k DOF f64
        → 1.9 GB at 300). Cap the basis at ~15% of the device memory limit
        (the step also holds the state, operators, and Ewald spectra) so big
        configs run without hand-tuning params.gmres_restart.
        """
        n = max(self.total_solution_size(), 1)
        itemsize = jnp.dtype(self.dtype).itemsize
        limit = None
        try:
            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit")
        except Exception:
            pass
        budget = 0.15 * limit if limit else 2e9
        cap = int(budget // (n * itemsize)) - 1
        restart = max(30, min(300, cap, n))
        if restart < min(300, n):
            logger.info("gmres_restart auto-capped to %d (Krylov basis "
                        "%.2f GB within the %.1f GB budget); set "
                        "params.gmres_restart to override", restart,
                        (restart + 1) * n * itemsize / 1e9, budget / 1e9)
        return restart

    # ---- compiled timestep ----
    def _build_step_fn(self):
        p = self.params
        gmres_tol = p.gmres_tol
        collide_fn = self._build_collision_fn()
        # SKELLY_DEBUG_SOLVE=1: per-step RHS/solve diagnostics via
        # jax.debug.print (norms + non-finite counts) — the tool for
        # diagnosing degenerate solves on remote chips
        _debug_solve = bool(os.environ.get("SKELLY_DEBUG_SOLVE"))
        restart = self.params.gmres_restart or self._auto_gmres_restart()
        warm_start = bool(p.gmres_warm_start)
        # segmentation: one GMRES restart cycle per jitted program, driven
        # from the host (System.step threads the partial solution back as
        # x0). Auto-on for >1.2e6-DOF systems on accelerators: the tunneled
        # TPU worker kills single program executions beyond ~1 minute
        # (docs/chip_logs/r5a/probe_watchdog*), which the one-shot step hits
        # at that scale. Identical mathematics (restarted GMRES), a cache
        # rebuild per segment of overhead.
        if p.gmres_segmented is None:
            segmented = (self.total_solution_size() > 1_200_000
                         and jax.default_backend() != "cpu"
                         and not self.emulated)
        else:
            segmented = bool(p.gmres_segmented) and not self.emulated
        seg_iters = 8
        if segmented:
            # The per-PROGRAM iteration budget (seg_iters) is watchdog-bound;
            # the Krylov BASIS (restart) is memory-bound only — the Arnoldi
            # carry threads through the host loop, so one cycle spans many
            # programs (gmres_segment). 64 f32 basis vectors at 4M DOF ≈ 1 GB.
            restart = min(restart, 64)
            try:
                seg_iters = max(1, int(os.environ.get(
                    "SKELLY_GMRES_SEG_ITERS", "8")))
            except ValueError:
                seg_iters = 8
            seg_iters = min(seg_iters, restart)
            logger.info("gmres segmented: %d-iteration Arnoldi continuation "
                        "segments of one GMRES(%d) cycle per program",
                        seg_iters, restart)
        self._segmented = segmented
        self._seg_restart = restart
        eta = p.eta
        delay = p.implicit_motor_activation_delay
        has_points = int(np.asarray(self.point_sources.position).shape[0]) > 0
        has_background = self.background.is_active
        has_shell = self.shell is not None
        interaction = p.periphery_interaction_flag and has_shell
        shell_shape = self.shell.interaction_shape if has_shell else None
        shell_radius = self.shell.radius if has_shell else 0.0
        shell_abc = self.shell.abc if has_shell else (0.0, 0.0, 0.0)
        shell_meridian = (jnp.asarray(self.shell.meridian, self.dtype)
                          if has_shell and self.shell.meridian is not None
                          else None)
        pb = p.periphery_binding
        pb_active = bool(pb["active"]) and has_shell
        fp_f0, fp_l0 = p.fp_f0, p.fp_l0
        ops = self.fibers.ops
        emulated = self.emulated
        tol_scope_rhs = p.emulated_tol_scope != "increment"
        ops_lo = self.fibers.ops_lo
        F = self.fiber_solution_size()
        Nf = self.fibers.node_count

        def _shell_collision_any(points, threshold):
            if shell_shape == "sphere":
                return shell_ops.sphere_collision(shell_radius, points, threshold)
            if shell_shape == "ellipsoid":
                return shell_ops.ellipsoid_collision(shell_abc, points, threshold)
            if shell_meridian is not None:
                return shell_ops.revolution_collision(shell_meridian, points,
                                                      threshold)
            return jnp.asarray(False)

        def _repulsion(block):
            skip = block.minus_clamped | (block.binding_body >= 0)
            if shell_shape == "sphere":
                return shell_ops.sphere_fiber_repulsion(shell_radius, block.x, skip, fp_f0, fp_l0)
            if shell_shape == "ellipsoid":
                return shell_ops.ellipsoid_fiber_repulsion(shell_abc, block.x, skip, fp_f0, fp_l0)
            if shell_meridian is not None:
                return shell_ops.revolution_fiber_repulsion(
                    shell_meridian, block.x, skip, fp_f0, fp_l0)
            return jnp.zeros_like(block.x)

        has_bodies = self.bodies.n_bodies > 0
        n_bodies = self.bodies.n_bodies
        Nb = self.bodies.node_count
        Sz_shell = self.shell_solution_size()
        force_types = tuple(self.bodies.force_types())
        max_sites = self.bodies.max_sites()
        FS = F + Sz_shell
        ev_stk0, ev_str0 = select_evaluators(p.pair_evaluator)
        use_ewald = p.pair_evaluator == "ewald"
        if use_ewald:
            ew_stk, ew_str = self._ewald_objects()
            # Hybrid tier selection (trace-time — all counts are static).
            # One spectral apply costs O(n_src+n_trg) spread/interp plus the
            # grid FFTs — a few hundred ms at oocyte scale — no matter how
            # FEW sources there are. Couplings with a small dense pair count
            # (the shell/body double layers: thousands of surface nodes vs
            # 1e5 fiber nodes) are faster through the dense tiled kernels,
            # and the Hasimoto split is exact, so mixing tiers is exact too.
            # 2e9 pairs ≈ 100-150 ms of dense Pallas work on a v5e — about
            # half a spectral apply at single-chip scales.
            n_shell_nodes = self.shell.state.n_nodes if has_shell else 0
            n_all_nodes = Nf + n_shell_nodes + Nb
            _pick = _measured_tier_pick()
            if not p.ewald_hybrid:
                tier = lambda n_s, n_t: True
                _how = "hybrid off"
            elif _pick is not None:
                tier, _how = _pick
            else:
                # fallback heuristic when no measured crossover record
                # exists: 2e9 pairs ≈ 100-150 ms of dense Pallas work
                tier = lambda n_s, n_t: n_s * n_t > 2e9
                _how = "heuristic cutoff 2e9 pairs (no bench record)"
            ewald_fib_tier = tier(Nf, n_all_nodes)
            ewald_shell_tier = tier(n_shell_nodes, Nf + Nb)
            ewald_body_tier = tier(Nb, n_all_nodes)
            dense_stk, dense_str = select_evaluators("pallas")
            if p.ewald_hybrid:
                logger.info(
                    "ewald hybrid tiers: fiber stokeslet=%s shell "
                    "stresslet=%s body stresslet=%s (dense pair counts "
                    "%.2g / %.2g / %.2g; %s)",
                    "ewald" if ewald_fib_tier else "dense",
                    "ewald" if ewald_shell_tier else "dense",
                    "ewald" if ewald_body_tier else "dense",
                    Nf * n_all_nodes, n_shell_nodes * (Nf + Nb),
                    Nb * n_all_nodes, _how)

        if use_ewald:
            from skellysim_tpu.kernels.ewald import _use_slab

            plan_skin = float(getattr(ew_stk, "skin", 0.0))
            far_bound = 0.5 * float(ew_stk.grid.h)
            if ew_stk.mesh is not None:
                from skellysim_tpu.kernels.ewald_sharded import slab_grid_ok

                # sharded far plans (selection + per-device bins) exist
                # whenever the grid slab-decomposes; they rebuild instead
                # of refreshing (ownership can change) but still amortize
                # the sorts across every GMRES apply of a step
                has_far_plans = slab_grid_ok(
                    ew_stk.grid, getattr(self, "_mesh_devices", 1))
            else:
                has_far_plans = _use_slab()
            any_tier = (ewald_fib_tier or (has_shell and ewald_shell_tier)
                        or (has_bodies and ewald_body_tier))
            plan_reuse = plan_skin > 0 and any_tier
        else:
            plan_skin = far_bound = 0.0
            has_far_plans = plan_reuse = False

        def _tier_specs(r_fib, r_all, r_fibbody):
            """(key, evaluator, src, trg) for every coupling the hybrid
            routes through the spectral tier — shared between step_fn's
            per-step plan logic and plan_init_fn so the plan pytrees cannot
            drift structurally."""
            specs = []
            if ewald_fib_tier:
                specs.append(("fib", ew_stk, r_fib, r_all))
            if has_shell and ewald_shell_tier:
                specs.append(("shell", ew_str,
                              r_all[Nf:Nf + n_shell_nodes], r_fibbody))
            if has_bodies and ewald_body_tier:
                specs.append(("body", ew_str,
                              r_all[r_all.shape[0] - Nb:], r_all))
            return specs

        def step_fn(blocks, shell_state, body_states, point_sources, background,
                    dt, time, ewald_state=None, plan_state=None, x0=None,
                    gmres_carry=None):
            gmres_carry_out = None
            ev_stk, ev_str = ev_stk0, ev_str0
            # --- boundary conditions (update_boundary_conditions) ---
            bc_minus = [jnp.where(b.minus_clamped | (b.binding_body >= 0), 1, 0)
                        for b in blocks]
            if pb_active:
                bc_plus = []
                for b in blocks:
                    end = b.x[:, -1, :]
                    end_hat = end / jnp.maximum(jnp.linalg.norm(end, axis=-1, keepdims=True), 1e-300)
                    angle = jnp.arccos(jnp.clip(end_hat[:, 2], -1.0, 1.0))
                    near = jax.vmap(lambda xf: _shell_collision_any(xf, pb["threshold"]))(b.x)
                    hinged = ((angle >= pb["polar_angle_start"])
                              & (angle <= pb["polar_angle_end"]) & near)
                    bc_plus.append(hinged.astype(jnp.int32))
            else:
                bc_plus = [jnp.zeros(b.n_fibers, jnp.int32) for b in blocks]

            body_caches = bcont.update_caches(body_states, eta) if has_bodies else []

            r_fib = fs.positions(blocks)
            r_parts = [r_fib]
            if has_shell:
                r_parts.append(shell_state.nodes)
            if has_bodies:
                r_parts.append(bcont.positions(body_caches))
            r_all = jnp.concatenate(r_parts, axis=0)
            # shell flow reaches fibers and bodies, not itself
            r_fibbody = (jnp.concatenate([r_fib, r_all[r_all.shape[0] - Nb:]])
                         if has_bodies else r_fib)

            ewald_dropped = jnp.zeros((), jnp.int32)
            plan_rebuilds = jnp.zeros((), jnp.int32)
            new_plan_state = None
            if use_ewald:
                # Near-field binning depends only on POSITIONS, which are
                # fixed for the whole step: each (src, trg) plan is built
                # (or refreshed) ONCE here, outside the GMRES loop, and
                # shared across every matvec (and between the prep flow and
                # the solve). The plans also COUNT capacity overflow; the
                # host regrows capacities and re-runs when ewald_dropped > 0
                # instead of silently losing interactions. Tiers the hybrid
                # routed to the dense kernels build no plan and count no
                # overflow.
                #
                # Verlet-skin reuse (plan_state is not None): plans carry
                # over from previous steps and REBUILD only when some point
                # has moved beyond the validity bound since that family's
                # build — skin/2 for the near pairlist (candidates at
                # r_cut+skin still cover every pair within r_cut), h/2 for
                # the far slab bins (wide x windows cover every nonzero tap
                # of the drifted ES window). The per-step cost drops from
                # the full Morton/searchsorted build (~0.3 s at oocyte
                # scale) to a few gathers. Analogue: the reference's FMM
                # tree reuse (include/kernels.hpp:80-118 evaluator caching).
                tier_specs = _tier_specs(r_fib, r_all, r_fibbody)
                plans = {}
                fars = {}
                ref_far = r_all
                wide = False
                if tier_specs and plan_state is not None:
                    # ~(d <= bound) instead of d > bound: a non-finite
                    # position (poisoned state, fresh DI slot) must force a
                    # REBUILD, never a silent refresh
                    d2 = jnp.sum(
                        jnp.square(r_all - plan_state["ref_near"]), axis=-1)
                    near_stale = ~(jnp.max(d2) <= (0.5 * plan_skin) ** 2)

                    def _near_rebuild(_):
                        return {k: ev.make_near_plan(src, trg,
                                                     skin=plan_skin)
                                for k, ev, src, trg in tier_specs}, r_all

                    def _near_refresh(_):
                        return {k: ev.refresh_near(plan_state["near"][k],
                                                   src, trg)
                                for k, ev, src, trg in tier_specs}, \
                            plan_state["ref_near"]

                    plans, ref_near = jax.lax.cond(
                        near_stale, _near_rebuild, _near_refresh, None)
                    plan_rebuilds += near_stale.astype(jnp.int32)

                    if has_far_plans:
                        d2f = jnp.sum(
                            jnp.square(r_all - plan_state["ref_far"]),
                            axis=-1)
                        far_stale = ~(jnp.max(d2f) <= far_bound ** 2)

                        def _far_rebuild(_):
                            return {k: ev.make_far_plan(src, trg)
                                    for k, ev, src, trg in tier_specs}, \
                                r_all

                        def _far_refresh(_):
                            return {k: ev.refresh_far(plan_state["far"][k],
                                                      src, trg)
                                    for k, ev, src, trg in tier_specs}, \
                                plan_state["ref_far"]

                        fars, ref_far = jax.lax.cond(
                            far_stale, _far_rebuild, _far_refresh, None)
                        plan_rebuilds += far_stale.astype(jnp.int32)
                    else:
                        fars = {k: None for k, _, _, _ in tier_specs}
                        ref_far = r_all
                    new_plan_state = {"ref_near": ref_near,
                                      "ref_far": ref_far,
                                      "near": plans, "far": fars}
                    wide = True   # static: refreshed far bins need the ±1
                    # extra x row; exact (pure zero-padding) for fresh ones
                elif tier_specs:
                    # per-step rebuild (ewald_plan_skin = 0, round-3 path)
                    plans = {k: ev.make_near_plan(src, trg)
                             for k, ev, src, trg in tier_specs}
                    fars = {k: ev.make_far_plan(src, trg)
                            for k, ev, src, trg in tier_specs}
                    ref_far = r_all
                    wide = False
                for k, _, _, _ in tier_specs:
                    ewald_dropped = ewald_dropped + plans[k].dropped
                if has_far_plans and ew_stk.mesh is not None:
                    # sharded far plans: per-device select-cap overflow
                    for k, _, _, _ in tier_specs:
                        if fars.get(k) is not None:
                            ewald_dropped = ewald_dropped + jnp.max(
                                fars[k]["dropped"])

                if ewald_fib_tier:
                    from skellysim_tpu.kernels.ewald import slab_dropped as _sd
                    g = ew_stk.grid
                    # slab occupancy of the positions the far bins were
                    # actually BUILT from (= ref_far; r_all when fresh)
                    ewald_dropped = ewald_dropped + _sd(
                        ref_far.astype(ew_stk.dtype), g.lo, g.h,
                        int(g.logical[0]), ew_stk.slab_cap)
                    # points escaping the grid box would spread/interp with
                    # clamped or vanishing windows — silently wrong physics.
                    # Count them with the other overflow modes; the host
                    # rebuilds the evaluators on a fresh box.
                    blo = jnp.asarray(ew_stk.box_lo, r_all.dtype)
                    bhi = jnp.asarray(ew_stk.box_hi, r_all.dtype)
                    ewald_dropped = ewald_dropped + jnp.sum(
                        jnp.any((r_all < blo[None]) | (r_all > bhi[None]),
                                axis=-1)).astype(jnp.int32)

                    def ev_stk(r_src, f_src, r_trg, eta_=eta):
                        assert r_src.shape[0] == r_fib.shape[0], \
                            "stokeslet plan mismatch"
                        return ew_stk.apply_with(ewald_state, r_src, f_src,
                                                 r_trg, eta_,
                                                 plan=plans["fib"],
                                                 far_plan=fars["fib"],
                                                 wide=wide)
                else:
                    ev_stk = dense_stk

                if has_shell and ewald_shell_tier:
                    def ev_str_shell(r_src, S, r_trg, eta_=eta):
                        return ew_str.apply_with(ewald_state, r_src, S,
                                                 r_trg, eta_,
                                                 plan=plans["shell"],
                                                 far_plan=fars["shell"],
                                                 wide=wide)
                else:
                    ev_str_shell = dense_str
                if has_bodies and ewald_body_tier:
                    def ev_str_body(r_src, S, r_trg, eta_=eta):
                        return ew_str.apply_with(ewald_state, r_src, S,
                                                 r_trg, eta_,
                                                 plan=plans["body"],
                                                 far_plan=fars["body"],
                                                 wide=wide)
                else:
                    ev_str_body = dense_str
            else:
                ev_str_shell = ev_str_body = ev_str

            # --- pre-solve external forces and velocities (prep_state) ---
            # steric wall repulsion only when periphery_interaction_flag is
            # set — the reference's DEFAULT IS FALSE (params.cpp:18), and
            # applying it unconditionally biased the fdfiber-compression
            # regression (golden run has binding but no repulsion) by ~1.2%
            if has_shell and interaction:
                f_ext = [_repulsion(b) for b in blocks]
                f_ext_cat = jnp.concatenate([f.reshape(-1, 3) for f in f_ext], axis=0) \
                    if f_ext else jnp.zeros((0, 3))
                v_all = fs.flow(blocks, ops, r_all, f_ext_cat, eta, subtract_self=True,
                                evaluator=ev_stk)
            else:
                f_ext = [jnp.zeros_like(b.x) for b in blocks]
                v_all = jnp.zeros_like(r_all)
            if has_points:
                v_all = v_all + point_sources.flow(r_all, eta, time)
            if has_background:
                v_all = v_all + background.flow(r_all, eta)
            if has_bodies:
                ext_ft = bcont.external_forces_torques(body_states, force_types, time)
                centers = jnp.stack([s.position for s in body_states])
                from skellysim_tpu.kernels.reference import rotlet_apply, stokeslet_apply

                v_all = v_all + stokeslet_apply(centers, ext_ft[:, :3], r_all, eta)
                v_all = v_all + rotlet_apply(centers, ext_ft[:, 3:], r_all, eta)

            motor_on = (time >= delay).astype(r_all.dtype)
            motor = [motor_on * m for m in fs.constant_motor_force(blocks, ops)]
            total_f = [m + fe for m, fe in zip(motor, f_ext)]

            v_fib = v_all[:Nf]
            v_split = fs.split_nodes(blocks, v_fib)
            caches = fs.update_caches(
                blocks, ops, eta, dt, bc_minus, bc_plus,
                flows=v_split, f_externals=total_f,
                v_on_fibers=v_split, f_on_fibers=f_ext,
                ops_lo=ops_lo if emulated else None,
                precond_bf16=bool(self.params.fiber_precond_bf16),
            )
            rhs_parts = [fs.rhs(caches)]
            if has_shell:
                rhs_parts.append(shell_ops.update_rhs(v_all[Nf:Nf + shell_state.n_nodes]))
            if has_bodies:
                rhs_parts.append(bcont.rhs(body_states, v_all[r_all.shape[0] - Nb:]))
            b_vec = jnp.concatenate(rhs_parts)
            dbg = None
            if _debug_solve:
                # extra step outputs (the axon backend has no host
                # callbacks, so no jax.debug.print): RHS norm/non-finite
                # counts per block for remote-chip solve diagnosis
                dbg = {
                    "b_norm": jnp.linalg.norm(b_vec),
                    "b_fib_norm": jnp.linalg.norm(b_vec[:F]),
                    "b_rest_norm": jnp.linalg.norm(b_vec[F:]),
                    "b_nonfinite": jnp.sum(~jnp.isfinite(b_vec)),
                    "v_all_norm": jnp.linalg.norm(v_all),
                    "v_nonfinite": jnp.sum(~jnp.isfinite(v_all)),
                }

            # --- matrix-free operator (System::apply_matvec, system.cpp:269-324) ---
            def matvec_impl(x, include_A=True):
                x_f = x[:F]
                fw = fs.apply_fiber_force(blocks, caches, x_f)
                v = fs.flow(blocks, ops, r_all, fw, eta, subtract_self=True,
                            evaluator=ev_stk)
                if has_shell:
                    x_s = x[F:FS]
                    u_sh = shell_ops.flow(shell_state, r_fibbody, x_s, eta,
                                          evaluator=ev_str_shell)
                    v = v.at[:Nf].add(u_sh[:Nf])
                    if has_bodies:
                        v = v.at[r_all.shape[0] - Nb:].add(u_sh[Nf:])
                if has_bodies:
                    x_b = x[FS:]
                    x_fib_split = fs.split_solution(blocks, x_f)
                    v_on_fib, link_ft = bcont.link_conditions(
                        blocks, ops, caches, x_fib_split, x_b,
                        body_states, body_caches, max_sites)
                    # body CENTER stokeslets/rotlets are O(n_bodies) sources:
                    # the dense evaluator is exact and cheaper than a full
                    # grid pass, so the ewald tier never handles them
                    v = v + bcont.flow(body_states, body_caches, r_all, x_b,
                                       link_ft, eta,
                                       evaluator_stresslet=ev_str_body,
                                       evaluator_stokeslet=(
                                           None if use_ewald else ev_stk))
                else:
                    v_on_fib = None
                res = [fs.matvec(blocks, ops, caches, x_f, v[:Nf],
                                 v_boundary=v_on_fib, include_A=include_A,
                                 exact_A=emulated)]
                if has_shell:
                    res.append(shell_ops.matvec(shell_state, x[F:FS],
                                                v[Nf:Nf + shell_state.n_nodes]))
                if has_bodies:
                    res.append(bcont.matvec(body_states, body_caches,
                                            v[r_all.shape[0] - Nb:], x[FS:]))
                return jnp.concatenate(res)

            def matvec_fn(x):
                return matvec_impl(x)

            def precond_fn(x):
                res = [fs.precondition(blocks, caches, x[:F])]
                if has_shell:
                    res.append(shell_ops.precondition(shell_state, x[F:FS]))
                if has_bodies:
                    res.append(bcont.precondition(body_states, body_caches, x[FS:]))
                return jnp.concatenate(res)

            if _debug_solve:
                # operator probes: A(M(b̂)) must be O(1) and finite — an
                # exactly-zero or non-finite result here is a backend/kernel
                # failure inside the jitted step, not a physics state
                bhat = b_vec / jnp.maximum(jnp.linalg.norm(b_vec), 1e-30)
                dbg_mb = precond_fn(bhat)
                dbg_amb = matvec_impl(dbg_mb)
                dbg.update({
                    "precond_b_norm": jnp.linalg.norm(dbg_mb),
                    "precond_b_nonfinite": jnp.sum(~jnp.isfinite(dbg_mb)),
                    "A_precond_b_norm": jnp.linalg.norm(dbg_amb),
                    "A_precond_b_nonfinite": jnp.sum(~jnp.isfinite(dbg_amb)),
                })

            if emulated:
                # Increment-form (iterative-refinement) solve: GMRES finds
                # δ = s_new − s_prev from the double-word-accurate residual
                # r₀ = b − M(s_prev); the f32 operator only shapes
                # convergence, r₀'s precision sets the attainable physics
                # accuracy (see ff.residual_delta). The fiber part of
                # M(s_prev) is evaluated in factored dd arithmetic; the
                # shell/body rows (no 1/dt-scale cancellation) come from one
                # plain f32 coupling evaluation (matvec_impl include_A=False
                # skips only the fiber dense-A application).
                s_prev = jnp.concatenate(
                    [fs.pack_solution(blocks)]
                    + ([shell_state.solution] if has_shell else [])
                    + ([jnp.zeros(b_vec.shape[0] - FS, b_vec.dtype)]
                       if has_bodies else []))
                mW = matvec_impl(s_prev, include_A=False)
                R_fib = fs.residual_delta(
                    blocks, ops, ops_lo, eta, dt, bc_minus, bc_plus,
                    flows=v_split, f_externals=total_f,
                    v_on_fibers=v_split, f_on_fibers=f_ext)
                r0 = jnp.concatenate([R_fib - mW[:F], b_vec[F:] - mW[F:]])
                # Tolerance scope (params.emulated_tol_scope):
                #   "rhs" (default): Belos' criterion ||b − A x|| ≤ tol·||b||
                #     (solver_hydro.cpp:71). gmres() normalizes by ITS rhs —
                #     here the residual r0, which a warm start already makes
                #     ~1e-4·||b|| — so passing gmres_tol verbatim over-solves
                #     by exactly the warm-start quality factor (measured: a
                #     constant ~+20-iteration premium at EVERY tol at 15k
                #     DOF, scripts/study_tight_tol.py). Rescale so the
                #     absolute target is tol·||b||, like the plain path.
                #   "increment": the round-3 behavior — tol applies to the
                #     increment solve itself (each step's solution error is
                #     ~tol·||r0||, far below tol·||b|| with a warm start).
                #     Costs the extra iterations; buys per-step accuracy
                #     beyond the nominal tolerance.
                if tol_scope_rhs:
                    b_norm = jnp.linalg.norm(b_vec)
                    r0_norm = jnp.maximum(jnp.linalg.norm(r0),
                                          jnp.asarray(1e-300, b_vec.dtype))
                    tol_eff = gmres_tol * b_norm / r0_norm
                else:
                    tol_eff = gmres_tol
                res = gmres(matvec_fn, r0, tol=tol_eff,
                            restart=restart, precond=precond_fn,
                            compensated=True)
                x_total = s_prev + res.x
                new_blocks = fs.step_delta(blocks, res.x[:F])
            else:
                if x0 is not None:
                    # segmented solve: x0 is the current CYCLE BASE (the
                    # warm start for cycle 0; the last LS estimate after a
                    # host-driven cycle restart)
                    x_warm = x0
                elif warm_start:
                    # previous step's solution as the Krylov start: the
                    # implicit solve's unknowns (new fiber X/T, shell density,
                    # body densities/U) evolve by O(dt) between steps, so
                    # x0 = s_prev typically halves the iteration count; the
                    # converged answer is identical (same ||b-Ax||/||b|| exit)
                    x_warm = jnp.concatenate(
                        [fs.pack_solution(blocks)]
                        + ([shell_state.solution] if has_shell else [])
                        + ([jnp.zeros(b_vec.shape[0] - FS, b_vec.dtype)]
                           if has_bodies else []))
                else:
                    x_warm = None
                if segmented:
                    # Arnoldi CONTINUATION, not per-program restarts: each
                    # program extends one GMRES(restart) cycle by seg_iters
                    # basis vectors (gmres_segment docstring; restarted
                    # GMRES(8) stalled at 1.7e-2 on the 4M-DOF cold solve,
                    # chip log r5b/oocyte_1m_try10)
                    if x_warm is None:
                        x_warm = jnp.zeros_like(b_vec)
                    seg = gmres_segment(matvec_fn, b_vec, x_warm,
                                        gmres_carry, tol=gmres_tol,
                                        restart=restart,
                                        seg_iters=seg_iters,
                                        precond=precond_fn)
                    res = GmresResult(
                        x=seg.x, residual=seg.residual,
                        iterations=seg.iterations, converged=seg.converged)
                    gmres_carry_out = seg.carry
                else:
                    res = gmres(matvec_fn, b_vec, x_warm, tol=gmres_tol,
                                restart=restart, precond=precond_fn,
                                max_restarts=5)
                x_total = res.x
                new_blocks = fs.step(blocks, res.x[:F])

            if _debug_solve:
                # per-block FINAL residual split: a converged fiber block +
                # a plateaued shell/body block means the stall lives in that
                # block's preconditioner, not in the Krylov process
                r_final = b_vec - matvec_impl(x_total)
                dbg.update({
                    "r_final_norm": jnp.linalg.norm(r_final),
                    "r_final_fib": jnp.linalg.norm(r_final[:F]),
                    "r_final_rest": jnp.linalg.norm(r_final[F:]),
                })

            new_shell = (shell_state.replace(solution=x_total[F:FS])
                         if has_shell else shell_state)
            if has_bodies:
                new_bodies = bcont.step(body_states, x_total[FS:], dt)
                new_blocks = bcont.repin_fibers(new_blocks, new_bodies, max_sites)
            else:
                new_bodies = body_states
            err = fs.fiber_error(new_blocks, ops)
            # fiber↔periphery collision on the trial state, fused into the
            # step so rejection needs no second dispatch (one round trip per
            # step on tunneled backends); body collision pairs stay host-side
            collision = (collide_fn(new_blocks) if collide_fn is not None
                         else jnp.asarray(False))
            out = (new_blocks, new_shell, new_bodies, x_total, err, res.residual,
                   res.iterations, res.converged, ewald_dropped, collision,
                   new_plan_state, plan_rebuilds)
            if segmented:
                out = out + (gmres_carry_out,)
            return out + (dbg,) if _debug_solve else out

        # donate the Arnoldi carry: segments >=1 would otherwise hold BOTH
        # the input and output (m+1, n) Krylov bases live (~2x basis HBM;
        # the host never reuses a superseded carry)
        step_fn = (_sys_jit(step_fn, donate_argnames=("gmres_carry",))
                   if segmented else _sys_jit(step_fn))

        if plan_reuse:
            @_sys_jit
            def plan_init_fn(blocks, shell_state, body_states):
                """Initial Verlet-skin plan state for the CURRENT geometry
                (step_fn then refreshes/rebuilds it in-step via the
                displacement monitor)."""
                body_caches = (bcont.update_caches(body_states, eta)
                               if has_bodies else [])
                r_fib = fs.positions(blocks)
                r_parts = [r_fib]
                if has_shell:
                    r_parts.append(shell_state.nodes)
                if has_bodies:
                    r_parts.append(bcont.positions(body_caches))
                r_all = jnp.concatenate(r_parts, axis=0)
                r_fibbody = (jnp.concatenate(
                    [r_fib, r_all[r_all.shape[0] - Nb:]])
                    if has_bodies else r_fib)
                specs = _tier_specs(r_fib, r_all, r_fibbody)
                near = {k: ev.make_near_plan(src, trg, skin=plan_skin)
                        for k, ev, src, trg in specs}
                far = {k: (ev.make_far_plan(src, trg) if has_far_plans
                           else None)
                       for k, ev, src, trg in specs}
                return {"ref_near": r_all, "ref_far": r_all,
                        "near": near, "far": far}

            self._plan_init_fn = plan_init_fn
        else:
            self._plan_init_fn = None

        return step_fn

    def _build_collision_fn(self):
        """Fiber-vs-periphery collision at threshold 0 for timestep rejection
        (system.cpp:576-595, fiber_container_finite_difference.cpp:39-54)."""
        if self.shell is None:
            return None
        shape = self.shell.interaction_shape
        radius = self.shell.radius
        abc = self.shell.abc
        meridian = (jnp.asarray(self.shell.meridian, self.dtype)
                    if self.shell.meridian is not None else None)

        # plain jit: collide only ever runs NESTED inside step_fn, and JAX
        # rejects compiler_options on non-top-level jits (the 1M chip run
        # died on exactly this, chip_logs r4b/oocyte_1m)
        @jax.jit
        def collide(blocks):
            hits = []
            for b in blocks:
                skip_first = b.minus_clamped | (b.binding_body >= 0)

                def check_one(xf, skip):
                    pts = jnp.where(skip, xf.at[0].set(0.0)[0:1] * 0, xf[0:1])
                    body = xf[1:]
                    if shape == "sphere":
                        hit = shell_ops.sphere_collision(radius, body, 0.0)
                        hit_first = jnp.logical_and(
                            ~skip, shell_ops.sphere_collision(radius, xf[0:1], 0.0))
                    elif shape == "ellipsoid":
                        hit = shell_ops.ellipsoid_collision(abc, body, 0.0)
                        hit_first = jnp.logical_and(
                            ~skip, shell_ops.ellipsoid_collision(abc, xf[0:1], 0.0))
                    elif meridian is not None:
                        hit = shell_ops.revolution_collision(meridian, body, 0.0)
                        hit_first = jnp.logical_and(
                            ~skip,
                            shell_ops.revolution_collision(meridian, xf[0:1], 0.0))
                    else:
                        hit = jnp.asarray(False)
                        hit_first = jnp.asarray(False)
                    return jnp.logical_or(hit, hit_first)

                hits.append(jnp.any(jax.vmap(check_one)(b.x, skip_first)))
            return jnp.any(jnp.stack(hits)) if hits else jnp.asarray(False)

        return collide

    def _build_velocity_fn(self):
        """Velocity field at arbitrary targets from the current solution
        (System::velocity_at_targets, system.cpp:330-384)."""
        p = self.params
        eta = p.eta
        has_shell = self.shell is not None
        has_points = int(np.asarray(self.point_sources.position).shape[0]) > 0
        has_background = self.background.is_active
        ops = self.fibers.ops
        F = self.fiber_solution_size()
        shell_shape = self.shell.interaction_shape if has_shell else None
        shell_radius = self.shell.radius if has_shell else 0.0
        shell_abc = self.shell.abc if has_shell else (0.0, 0.0, 0.0)
        shell_meridian = (jnp.asarray(self.shell.meridian, self.dtype)
                          if has_shell and self.shell.meridian is not None
                          else None)
        fp_f0, fp_l0 = p.fp_f0, p.fp_l0
        interaction = p.periphery_interaction_flag and has_shell

        has_bodies = self.bodies.n_bodies > 0
        max_sites = self.bodies.max_sites()
        FS = F + self.shell_solution_size()
        ev_stk0, ev_str0 = select_evaluators(p.pair_evaluator)
        use_ewald = p.pair_evaluator == "ewald"
        if use_ewald:
            ew_stk, ew_str = self._ewald_objects()

        force_types = tuple(self.bodies.force_types())

        @_sys_jit
        def vel_fn(blocks, shell_state, body_states, point_sources, background,
                   sol, r_trg, time, ewald_state=None):
            from skellysim_tpu.fibers import fd_fiber as ff
            from skellysim_tpu.body import rigid

            if use_ewald:
                # same hybrid cost model as the step: r_trg.shape is static
                # at trace time, so small-pair-count analysis queries (a few
                # streamline seeds against a big system) go dense
                n_src_max = sum(b.n_fibers * b.n_nodes for b in blocks) \
                    + (shell_state.n_nodes if has_shell else 0)
                if (p.ewald_hybrid
                        and n_src_max * r_trg.shape[0] < 2e9):
                    ev_stk, ev_str = select_evaluators("pallas")
                else:
                    ev_stk = partial(ew_stk.apply_with, ewald_state)
                    ev_str = partial(ew_str.apply_with, ewald_state)
            else:
                ev_stk, ev_str = ev_stk0, ev_str0
            u = jnp.zeros_like(r_trg)
            fib_caches = []
            if blocks:
                f_parts = []
                for b, op, xb in zip(blocks, ops, fs.split_solution(blocks, sol[:F])):
                    c0, c1 = ff.sbt_constants(b, eta)
                    xs, xss, *_ = ff.derivatives(b, op)
                    fib_caches.append(xs)
                    Fop = ff.assemble_force_operator(b, op, xs, xss)
                    f = jnp.einsum("brc,bc->br", Fop, xb.reshape(b.n_fibers, -1))
                    f = f.reshape(b.n_fibers, 3, b.n_nodes).transpose(0, 2, 1)
                    # NOTE the motor force is deliberately NOT radiated here,
                    # matching the solve: the reference treats motor forcing
                    # as internal (its direct flow is never given to the
                    # shell RHS either — "explicitly handled elsewhere",
                    # system.cpp:424); adding it only in analysis would break
                    # wall no-slip consistency with the solved shell density
                    if interaction:
                        skip = b.minus_clamped | (b.binding_body >= 0)
                        if shell_shape == "sphere":
                            f = f + shell_ops.sphere_fiber_repulsion(
                                shell_radius, b.x, skip, fp_f0, fp_l0)
                        elif shell_shape == "ellipsoid":
                            f = f + shell_ops.ellipsoid_fiber_repulsion(
                                shell_abc, b.x, skip, fp_f0, fp_l0)
                        elif shell_meridian is not None:
                            f = f + shell_ops.revolution_fiber_repulsion(
                                shell_meridian, b.x, skip, fp_f0, fp_l0)
                    f_parts.append(f.reshape(-1, 3))
                f_nodes = jnp.concatenate(f_parts, axis=0)
                u = u + fs.flow(blocks, ops, r_trg, f_nodes, eta,
                                subtract_self=False, evaluator=ev_stk)
            if has_shell:
                u = u + shell_ops.flow(shell_state, r_trg, sol[F:FS], eta,
                                       evaluator=ev_str)
            if has_bodies:
                body_caches = [rigid.geometry_cache(s) for s in body_states]

                class _XsCache:  # adapter: link_conditions reads cache.xs only
                    def __init__(self, xs):
                        self.xs = xs

                x_fib_split = fs.split_solution(blocks, sol[:F])
                _, link_ft = bcont.link_conditions(
                    blocks, ops, [_XsCache(x) for x in fib_caches], x_fib_split,
                    sol[FS:], body_states, body_caches, max_sites)
                u = u + bcont.flow(body_states, body_caches, r_trg, sol[FS:],
                                   link_ft, eta, evaluator_stresslet=ev_str,
                                   evaluator_stokeslet=ev_stk)
                # override points inside rigid bodies with rigid-body motion
                # (system.cpp:362-381)
                for s, body_shape_meta in zip(body_states, body_shapes):
                    kind, radius, axes = body_shape_meta
                    dx = r_trg - s.position[None, :]
                    if kind == "ellipsoid":
                        ax = jnp.asarray(axes)
                        inside = jnp.sum((dx / ax) ** 2, axis=-1) < 1.0
                    else:
                        inside = jnp.sum(dx * dx, axis=-1) < radius * radius
                    rigid_u = s.velocity[None, :] + jnp.cross(
                        jnp.broadcast_to(s.angular_velocity, dx.shape), dx)
                    u = jnp.where(inside[:, None], rigid_u, u)
            if has_bodies:
                # external forces/torques reach the fluid as center
                # stokeslets/rotlets (same as the solve path; the reference
                # computes these in velocity_at_targets but never adds them)
                ext_ft = bcont.external_forces_torques(body_states, force_types,
                                                       time)
                centers = jnp.stack([s.position for s in body_states])
                from skellysim_tpu.kernels.reference import (rotlet_apply,
                                                             stokeslet_apply)

                u = u + stokeslet_apply(centers, ext_ft[:, :3], r_trg, eta)
                u = u + rotlet_apply(centers, ext_ft[:, 3:], r_trg, eta)
            if has_points:
                u = u + point_sources.flow(r_trg, eta, time)
            if has_background:
                u = u + background.flow(r_trg, eta)
            return u

        body_shapes = tuple((b.shape, b.radius, b.axes) for b in self.bodies.bodies)
        return vel_fn

    def velocity_at_targets(self, r_trg) -> np.ndarray:
        """(T, 3) velocity at targets from the current solution state."""
        shell_state = self.shell.state if self.shell else None
        extra = ((self._ewald_state,)
                 if self.params.pair_evaluator == "ewald" else ())
        u = self._velocity_fn(
            self.fibers.blocks, shell_state, self.bodies.states(),
            self.point_sources, self.background,
            jnp.asarray(self._curr_solution_dev, self.dtype),
            jnp.asarray(r_trg, self.dtype),
            jnp.asarray(self.time, self.dtype),
            *extra,
        )
        return np.asarray(u)

    # ---- dynamic instability (host-side stochastic events) ----
    def _plus_pinned_mask(self, block) -> np.ndarray:
        """Host-side replica of the step's plus-end binding criterion."""
        pb = self.params.periphery_binding
        if self.shell is None or not pb["active"]:
            return np.zeros(block.n_fibers, bool)
        x = np.asarray(block.x)
        end = x[:, -1, :]
        nrm = np.maximum(np.linalg.norm(end, axis=-1), 1e-300)
        angle = np.arccos(np.clip(end[:, 2] / nrm, -1, 1))
        thr = pb["threshold"]
        if self.shell.interaction_shape == "sphere":
            near = np.any(np.linalg.norm(x, axis=-1) >= self.shell.radius - thr, axis=1)
        elif self.shell.interaction_shape == "ellipsoid":
            near = np.asarray(jax.vmap(
                lambda xf: shell_ops.ellipsoid_collision(
                    self.shell.abc, xf, thr))(jnp.asarray(x)))
        elif self.shell.meridian is not None:
            gap, _ = shell_ops.revolution_wall_gap(
                jnp.asarray(self.shell.meridian), jnp.asarray(x))
            near = np.asarray(gap <= thr).any(axis=1)
        else:
            near = np.zeros(block.n_fibers, bool)
        return ((angle >= pb["polar_angle_start"]) & (angle <= pb["polar_angle_end"])
                & near)

    def dynamic_instability(self) -> bool:
        """Stochastic catastrophe/growth/nucleation (dynamic_instability.cpp:25-194).

        Host-side: per-fiber catastrophe draws deactivate slots; survivors
        grow by v_growth·dt; a Poisson number of new fibers nucleate at
        unoccupied body sites, pointing radially outward. Returns True when
        block capacity changed (the compiled step must be rebuilt).
        """
        di = self.params.dynamic_instability
        if not di or di.get("n_nodes", 0) == 0:
            return False
        dt = self.dt
        grew = False
        occupied = set()

        for bi, blk in enumerate(self.fibers.blocks):
            act = np.asarray(blk.active)
            if not act.any():
                continue
            binding_body = np.asarray(blk.binding_body)
            binding_site = np.asarray(blk.binding_site)
            length = np.array(np.asarray(blk.length))
            length_prev = np.array(np.asarray(blk.length_prev))
            v_growth = np.array(np.asarray(blk.v_growth))
            pinned = self._plus_pinned_mask(blk)
            rows = np.flatnonzero(act)
            vg = np.where(pinned[rows],
                          di["v_growth"] * di["v_grow_collision_scale"],
                          di["v_growth"])
            f_cat = np.where(pinned[rows],
                             di["f_catastrophe"]
                             * di["f_catastrophe_collision_scale"],
                             di["f_catastrophe"])
            # ONE batched draw for every active row: numpy's Generator
            # consumes the PCG64 stream identically to per-row scalar
            # uniform() calls in row order (test_dynamic_instability pins
            # this), so trajectories match the reference-style per-fiber
            # loop (dynamic_instability.cpp:25-80) without O(n_fibers)
            # interpreter round-trips per step
            u = self.rng.local.uniform(size=rows.size)
            died = u > np.exp(-dt * f_cat)
            surv = rows[~died]
            new_active = act.copy()
            new_active[rows[died]] = False
            length_prev[surv] = length[surv]
            length[surv] += dt * vg[~died]
            v_growth[surv] = vg[~died]
            bound = surv[binding_body[surv] >= 0]
            occupied.update(zip(binding_body[bound].tolist(),
                                binding_site[bound].tolist()))
            self.fibers.blocks[bi] = blk.replace(
                active=jnp.asarray(new_active),
                length=jnp.asarray(length), length_prev=jnp.asarray(length_prev),
                v_growth=jnp.asarray(v_growth))

        # nucleation at unoccupied sites
        all_sites = []
        for ib, body in enumerate(self.bodies.bodies):
            for isite in range(body.state.nucleation_sites_ref.shape[0]):
                all_sites.append((ib, isite))
        inactive_sites = [s for s in all_sites if s not in occupied]
        if inactive_sites:
            lam = dt * di["nucleation_rate"] * len(inactive_sites)
            # nucleation draws come from the SHARED stream: every process
            # sees the same events (the reference draws on rank 0 and
            # broadcasts, dynamic_instability.cpp:140-162)
            n_new = min(int(self.rng.shared.poisson(lam)), len(inactive_sites))
            for _ in range(n_new):
                pick = int(self.rng.shared.integers(0, len(inactive_sites)))
                ib, isite = inactive_sites.pop(pick)
                body = self.bodies.bodies[ib]
                from skellysim_tpu.body.rigid import place as body_place

                _, _, sites = body_place(body.state)
                origin = np.asarray(sites[isite])
                u = origin - np.asarray(body.state.position)
                u /= np.linalg.norm(u)
                n = int(di["n_nodes"])
                L0 = di["min_length"]
                s = np.linspace(0.0, L0, n)
                x = origin[None, :] + u[None, :] * s[:, None]
                bi, row, g = self.fibers.free_slot(n)
                grew = grew or g
                self.fibers.set_row(
                    bi, row,
                    x=jnp.asarray(x), x_lo=jnp.zeros_like(jnp.asarray(x)),
                    tension=jnp.zeros(n), tension_lo=jnp.zeros(n),
                    length=L0, length_prev=L0,
                    bending_rigidity=di["bending_rigidity"],
                    radius=di["radius"], force_scale=0.0, v_growth=0.0,
                    binding_body=ib, binding_site=isite,
                    minus_clamped=False, active=True,
                )
        return grew

    # ---- host control ----
    def _grow_ewald_caps(self):
        """Overflow recovery (same pattern as the dynamic-instability
        capacity growth). If the geometry ESCAPED the grid box, rebuild the
        evaluators on a fresh box sized to the current geometry (new grid +
        spectra); otherwise double the binning capacities and keep the
        grid."""
        stk, st = self._ewald_pair
        geom = [fs.positions(self.fibers.blocks)]
        if self.shell is not None:
            geom.append(self.shell.state.nodes)
        if self.bodies.n_bodies:
            caches = bcont.update_caches(self.bodies.states(),
                                         self.params.eta)
            geom.append(bcont.positions(caches))
        pts = np.concatenate([np.asarray(g).reshape(-1, 3) for g in geom
                              if np.size(g)], axis=0)
        escaped = bool(np.any(pts < stk.box_lo[None])
                       or np.any(pts > stk.box_hi[None]))
        if escaped:
            if self.params.ewald_box is not None:
                raise RuntimeError(
                    "geometry escaped the user-pinned params.ewald_box "
                    f"[{stk.box_lo}, {stk.box_hi}]; enlarge it or leave it "
                    "unset for automatic box sizing")
            logger.warning("geometry escaped the Ewald box %s..%s: "
                           "rebuilding evaluators on a fresh box",
                           np.round(stk.box_lo, 3), np.round(stk.box_hi, 3))
            self._ewald_pair = None
            stk_new, _ = self._ewald_objects()
            self._ewald_state = stk_new.spectra()
        else:
            for ev in (stk, st):
                ev.cap = 2 * ev.cap
                ev.cap_t = 2 * ev.cap_t
                ev.slab_cap = 2 * ev.slab_cap
                ev.pair_total = 2 * ev.pair_total
                # sharded far-field compact-select caps (mesh path)
                ev.far_select_mult = 2 * getattr(ev, "far_select_mult", 3)
            logger.warning("ewald capacity overflow: regrown to "
                           "pair_total=%d slab=%d and recompiling",
                           stk.pair_total, stk.slab_cap)
        self._plan_state = None   # capacities changed → plan shapes changed
        self._step_fn = self._build_step_fn()
        self._velocity_fn = self._build_velocity_fn()

    def _gmres_carry_sentinel(self):
        """Fresh j=-1 Arnoldi carry (gmres_segment initializes the cycle
        in-program; one executable serves every segment)."""
        m = self._seg_restart
        n = int(self.total_solution_size())
        dt = self.dtype
        return GmresCarry(
            V=jnp.zeros((m + 1, n), dt), H=jnp.zeros((m + 1, m), dt),
            cs=jnp.zeros(m, dt), sn=jnp.zeros(m, dt),
            g=jnp.zeros(m + 1, dt), j=jnp.asarray(-1, jnp.int32),
            res=jnp.asarray(jnp.inf, dt))

    def step(self):
        """One trial step at the current dt. Returns (fiber_error, converged)."""
        if self.dynamic_instability():
            logger.info("fiber capacity changed; recompiling step")
            if self.mesh is not None:
                self._reshard_fibers()
            self._plan_state = None   # fiber capacity → plan shapes changed
            self._step_fn = self._build_step_fn()
            self._collision_fn = self._build_collision_fn()
            self._velocity_fn = self._build_velocity_fn()
        t0 = _walltime.perf_counter()
        use_ewald = self.params.pair_evaluator == "ewald"
        for _attempt in range(6):
            shell_state = self.shell.state if self.shell else None
            extra = ()
            if use_ewald:
                if (self._plan_init_fn is not None
                        and self._plan_state is None):
                    # first step / after a capacity or geometry-topology
                    # change: seed the Verlet-skin plan carry
                    self._plan_state = self._plan_init_fn(
                        self.fibers.blocks, shell_state,
                        self.bodies.states())
                    self._plan_seeds += 1
                extra = (self._ewald_state, self._plan_state)
            segmented = getattr(self, "_segmented", False)
            if segmented:
                # seed segment 0 with the standard warm start (or zeros)
                x0_dev = (jnp.asarray(self.curr_solution, self.dtype)
                          if self.params.gmres_warm_start
                          else jnp.zeros(self.total_solution_size(),
                                         self.dtype))
                # j = -1 sentinel: the program initializes the cycle under
                # lax.cond, so EVERY segment runs the same executable (a
                # carry=None specialization would keep a second full-step
                # program resident; see gmres_segment)
                carry_dev = self._gmres_carry_sentinel()
            iters_h = 0
            cycle_base_iters = 0
            prev_resid = None
            stalled_segs = 0
            seg_m = getattr(self, "_seg_restart", 0)
            for _seg in range(256):
                kw = ({"x0": x0_dev, "gmres_carry": carry_dev}
                      if segmented else {})
                (blocks, new_shell, new_bodies, sol, err, resid, iters,
                 conv, dropped, collision, plan_state_new, rebuilds,
                 *rest) = self._step_fn(
                    self.fibers.blocks, shell_state, self.bodies.states(),
                    self.point_sources, self.background,
                    jnp.asarray(self.dt, self.dtype),
                    jnp.asarray(self.time, self.dtype),
                    *extra, **kw,
                )
                if segmented:
                    carry_dev, *dbg = rest
                else:
                    dbg = rest
                if dbg:
                    logger.info("debug-solve: %s",
                                {k: float(v) for k, v in
                                 jax.device_get(dbg[0]).items()})
                # one batched readback of every step scalar — per-scalar
                # pulls each pay a full round trip on tunneled backends
                (err, resid_h, seg_iters_h, conv_h, dropped_h, coll_h,
                 rebuilds_h) = jax.device_get(
                    (err, resid, iters, conv, dropped, collision, rebuilds))
                # `iters` counts inner iterations of the CURRENT cycle
                iters_h = cycle_base_iters + int(seg_iters_h)
                if not segmented or bool(conv_h) or int(dropped_h):
                    break
                # stall guard: the Arnoldi continuation's LS residual is
                # monotone within a cycle, so no-improvement segments mean
                # genuine stagnation (e.g. preconditioner breakdown), not
                # restart cycling — but allow one plateau segment before
                # giving up
                if prev_resid is not None and not resid_h < 0.99 * prev_resid:
                    stalled_segs += 1
                    if stalled_segs >= 2:
                        logger.warning(
                            "segmented gmres stalled at residual %.3e "
                            "after %d iterations", float(resid_h), iters_h)
                        break
                else:
                    stalled_segs = 0
                prev_resid = resid_h
                if int(seg_iters_h) >= seg_m:
                    # basis full: restart the cycle from the current LS
                    # estimate (plain restarted GMRES(m) semantics); the
                    # j=-1 flip re-triggers the in-program cycle init and
                    # reuses the carry buffers (stale V rows are masked)
                    cycle_base_iters = iters_h
                    x0_dev = sol
                    carry_dev = carry_dev._replace(
                        j=jnp.asarray(-1, jnp.int32))
            dump = os.environ.get("SKELLY_DUMP_SOLVE")
            if dump and segmented:
                # offline slow-mode analysis (the 31k-fiber crawl,
                # VALIDATION "1M conclusion"): the span of successive
                # segment solutions approximates the stagnating subspace a
                # deflation preconditioner must capture
                np.savez(dump, sol=np.asarray(sol),
                         cycle_base=np.asarray(x0_dev),
                         resid=float(resid_h), iters=int(iters_h))
                logger.info("solve state dumped to %s", dump)
            if not use_ewald or int(dropped_h) == 0:
                # keep the plan carry even for steps the caller later
                # REJECTS: plans were built/refreshed from PRE-step
                # positions, which a rejection restores, so they stay valid
                self._plan_state = plan_state_new
                if self._plan_init_fn is not None:
                    self._plan_rebuilds += int(rebuilds_h)
                    self._plan_steps += 1
                break
            # capacity overflow: the evaluation silently lost `dropped`
            # interactions — the result is WRONG, not merely inaccurate.
            # Regrow and redo the step from the unmodified pre-step state.
            self._grow_ewald_caps()
        else:
            raise RuntimeError("ewald capacity growth did not converge")
        err = float(err)
        self.fibers.blocks = blocks
        if self.shell is not None:
            self.shell.state = new_shell
        self.bodies.set_states(new_bodies)
        self.curr_solution = sol  # device array; host copy is lazy (property)
        self._last_fiber_collision = bool(coll_h)
        self._last_iters = int(iters_h)
        self._last_residual = float(resid_h)
        logger.info(
            "solver: iters %d, residual %.3e, converged %s, wall %.3fs",
            int(iters_h), float(resid_h), bool(conv_h),
            _walltime.perf_counter() - t0,
        )
        if self._plan_init_fn is not None and int(rebuilds_h):
            logger.info("ewald plans rebuilt (%d/%d steps so far)",
                        self._plan_rebuilds, self._plan_steps)
        return err, bool(conv_h)

    def _body_cloud(self, body) -> np.ndarray:
        """Lab-frame surface node positions of one body (host copy)."""
        from skellysim_tpu.body import rigid

        nodes, _, _ = rigid.place(body.state)
        return np.asarray(nodes)

    def _body_vs_periphery(self, body, thr: float) -> bool:
        """Body↔periphery collision, full shape matrix.

        The reference only implements sphere-in-sphere and warn-stubs the
        rest (body_spherical.cpp:283-331, periphery.cpp:94-320); here every
        pair is real: exact center-distance checks where the geometry allows,
        the body's surface node cloud through the periphery point-cloud
        check otherwise.
        """
        sh = self.shell
        if sh.shape == "sphere":
            if body.shape == "sphere":
                # exact (periphery.cpp:94-97)
                dist = float(np.linalg.norm(np.asarray(body.state.position)))
                return dist + body.radius > sh.radius - thr
            return bool(shell_ops.sphere_collision(
                sh.radius, jnp.asarray(self._body_cloud(body)), thr))
        if sh.shape == "ellipsoid":
            if body.shape == "sphere":
                # scaled-angle heuristic with the body radius folded into the
                # threshold (the reference's ellipsoid-periphery convention,
                # periphery.cpp:204-224, applied at the body center)
                return bool(shell_ops.ellipsoid_collision(
                    sh.abc, jnp.asarray(body.state.position)[None, :],
                    thr + body.radius))
            return bool(shell_ops.ellipsoid_collision(
                sh.abc, jnp.asarray(self._body_cloud(body)), thr))
        if sh.meridian is not None:
            mer = jnp.asarray(sh.meridian)
            if body.shape == "sphere":
                gap, _ = shell_ops.revolution_wall_gap(
                    mer, jnp.asarray(body.state.position)[None, :])
                return bool(gap[0] <= thr + body.radius)
            return bool(shell_ops.revolution_collision(
                mer, jnp.asarray(self._body_cloud(body)), thr))
        return False

    @staticmethod
    def _cloud_inside_body(cloud: np.ndarray, body, thr: float) -> bool:
        """Any point of ``cloud`` within ``thr`` of (or inside) ``body``."""
        from skellysim_tpu.utils.quaternion import quat_rotate

        c = np.asarray(body.state.position)
        d = cloud - c[None, :]
        if body.shape == "sphere":
            return bool((np.linalg.norm(d, axis=-1) < body.radius + thr).any())
        # rotate into the body frame and test the scaled implicit surface
        # (axis_length entries are semi-axes, reference precompute.py:198-213)
        q = jnp.asarray(body.state.orientation)
        qc = jnp.concatenate([q[:1], -q[1:]])     # conjugate: lab → body
        db = np.asarray(jax.vmap(lambda v: quat_rotate(qc, v))(jnp.asarray(d)))
        ax = np.asarray(body.axes) + thr
        return bool((np.sum((db / ax) ** 2, axis=-1) < 1.0).any())

    def _body_vs_body(self, b1, b2, thr: float) -> bool:
        """Body↔body collision (double dispatch, body_spherical.cpp:304-331;
        non-sphere pairs are warn-stubs there, real surface tests here)."""
        if b1.shape == "sphere" and b2.shape == "sphere":
            d = np.linalg.norm(np.asarray(b1.state.position)
                               - np.asarray(b2.state.position))
            return d < b1.radius + b2.radius + thr
        return (self._cloud_inside_body(self._body_cloud(b1), b2, thr)
                or self._cloud_inside_body(self._body_cloud(b2), b1, thr))

    def check_collision(self) -> bool:
        """Any collision: fibers↔periphery, bodies↔periphery, body↔body
        (system.cpp:576-595; threshold 0 as in the reference)."""
        if self._last_fiber_collision is not None:
            # fused into the last step's compiled computation (no extra
            # dispatch); invalidated whenever state changes outside step()
            if self._last_fiber_collision:
                return True
        elif (self._collision_fn is not None
                and bool(self._collision_fn(self.fibers.blocks))):
            return True
        bodies = self.bodies.bodies
        if self.shell is not None:
            for b in bodies:
                if self._body_vs_periphery(b, 0.0):
                    return True
        for i, b1 in enumerate(bodies):
            for b2 in bodies[i + 1:]:
                if self._body_vs_body(b1, b2, 0.0):
                    return True
        return False

    def run(self):
        """Adaptive-dt time loop with trajectory writes (system.cpp:516-571).

        Deliberate deviation from the reference: the reference updates
        properties.dt to the NEW step size before advancing time
        (system.cpp:554-560), so during dt growth its clock runs ahead of the
        physics by up to beta_up per step. Here time advances by the dt that
        actually produced the accepted state; dt_new only applies to the next
        step. The two agree whenever dt is at dt_max (all reference tests).
        Set ``params.compat_timestep_clock = true`` to reproduce the
        reference's accounting exactly (frame times then match its
        trajectories bit-for-bit during dt growth, at the cost of the clock
        running ahead of the physics).
        """
        p = self.params
        self._open_writer()
        self.write_config_snapshot("skelly_sim.initial_config")
        while self.time < p.t_final:
            backup = (self.fibers.blocks, self.shell.state if self.shell else None,
                      self.bodies.states())
            dt_used = self.dt
            fiber_error, converged = self.step()

            dt_new = self.dt
            accept = False
            if p.adaptive_timestep_flag:
                if converged and fiber_error <= p.fiber_error_tol:
                    accept = True
                    if fiber_error <= 0.9 * p.fiber_error_tol:
                        dt_new = min(p.dt_max, self.dt * p.beta_up)
                else:
                    dt_new = self.dt * p.beta_down
                    accept = False
                if converged and self.check_collision():
                    logger.info("collision detected; rejecting step")
                    dt_new = self.dt * 0.5
                    accept = False
                if dt_new < p.dt_min:
                    raise RuntimeError("Timestep smaller than dt_min")
                self.dt = dt_new
            if not p.adaptive_timestep_flag or accept:
                dt_clock = self.dt if p.compat_timestep_clock else dt_used
                self.time += dt_clock
                if int(self.time / p.dt_write) > int((self.time - dt_clock) / p.dt_write):
                    self.write_frame()
            else:
                self._last_fiber_collision = None  # trial state discarded
                self.fibers.blocks = backup[0]
                if self.shell is not None:
                    self.shell.state = backup[1]
                self.bodies.set_states(backup[2])
            logger.info("time %.6g, dt %.6g, fiber_error %.3e", self.time, dt_new, fiber_error)
        self.write_config_snapshot("skelly_sim.final_config")

    # ---- I/O ----
    def _open_writer(self, resume: bool = False):
        if jax.process_index() != 0:
            return   # rank-0 writes, like the reference's gathered output
        if self._writer is None and not self._listen:
            self._writer = tio.TrajectoryWriter(self._output_file, resume=resume)

    def _rng_state_strings(self) -> List[List[str]]:
        # per-rank pairs (io_maps.hpp:31-39); collective when multi-process
        return self.rng.dump_all()

    def _frame_dict(self) -> dict:
        # multi-process runs: gather the process-sharded fiber blocks to
        # every host first (collective — all processes build the frame,
        # only process 0 writes it; see write_frame)
        from skellysim_tpu.parallel import mesh as pmesh

        blocks_h = pmesh.host_global(self.fibers.blocks)
        fib_entries = []
        di_on = bool(self.params.dynamic_instability
                     and self.params.dynamic_instability.get("n_nodes", 0))
        rows = self.fibers.active_rows() if di_on else self.fibers.perm
        for bi, row in rows:
            b = blocks_h[bi]
            fib_entries.append(tio.pack_fiber(
                n_nodes=b.n_nodes,
                radius=float(b.radius[row]),
                length=float(b.length[row]),
                length_prev=float(b.length_prev[row]),
                bending_rigidity=float(b.bending_rigidity[row]),
                penalty_param=float(b.penalty_param[row]),
                force_scale=float(b.force_scale[row]),
                beta_tstep=float(b.beta_tstep[row]),
                binding_site=(int(b.binding_body[row]), int(b.binding_site[row])),
                # hi+lo in f64: emulated runs carry sub-f32 position/tension
                # bits the trajectory must not round away (lo ≡ 0 otherwise)
                tension=(np.asarray(b.tension[row], np.float64)
                         + np.asarray(b.tension_lo[row], np.float64)),
                x=(np.asarray(b.x[row], np.float64)
                   + np.asarray(b.x_lo[row], np.float64)),
                minus_clamped=bool(b.minus_clamped[row]),
            ))
        shell_solution = (np.asarray(self.shell.state.solution)
                          if self.shell else np.zeros(0))
        sph, ell = [], []
        for body in self.bodies.bodies:
            s = body.state
            if body.shape == "ellipsoid":
                ell.append(tio.pack_ellipsoidal_body(
                    np.asarray(body.axes), np.asarray(s.position),
                    np.asarray(s.orientation), np.asarray(s.solution)))
            else:
                sph.append(tio.pack_spherical_body(
                    body.radius, np.asarray(s.position),
                    np.asarray(s.orientation), np.asarray(s.solution)))
        return tio.pack_frame(
            time=self.time, dt=self.dt, rng_state=self._rng_state_strings(),
            fibers=fib_entries, spherical_bodies=sph, ellipsoidal_bodies=ell,
            shell_solution=shell_solution,
        )

    def write_frame(self):
        frame = self._frame_dict()   # collective (multi-process allgather)
        self._open_writer()
        if self._writer is not None:
            self._writer.write_frame(frame)

    def write_config_snapshot(self, path: str):
        frame = self._frame_dict()   # collective — before the rank gate
        if jax.process_index() != 0:
            return
        with open(path, "wb") as f:
            import msgpack

            f.write(msgpack.packb(frame))

    def load_frame_state(self, frame: dict) -> None:
        """Restore full system state from a decoded trajectory frame
        (trajectory_reader.cpp:126-251 semantics, single logical rank)."""
        self.time = frame["time"]
        self.dt = frame["dt"]
        self._last_fiber_collision = None  # state replaced outside step()
        fibers = frame["fibers"][1]
        if len(fibers) != self.fibers.n_fibers or any(
                self.fibers.blocks[bi].n_nodes != fib["n_nodes_"]
                for (bi, _), fib in zip(self.fibers.perm or [], fibers)):
            # fiber population changed (dynamic instability): rebuild ensemble
            tables = [{
                "x": np.asarray(f["x_"]).ravel().tolist(),
                "length": f["length_"],
                "bending_rigidity": f["bending_rigidity_"],
                "radius": f["radius_"],
                "force_scale": f["force_scale_"],
                "parent_body": f["binding_site_"][0],
                "parent_site": f["binding_site_"][1],
                "minus_clamped": f["minus_clamped_"],
            } for f in fibers]
            self.fibers = fs.FiberEnsemble.from_tables(tables, dtype=self.dtype)
            rebuilt = True
        else:
            rebuilt = False
        for i, fib in enumerate(fibers):
            bi, row = self.fibers.perm[i]
            b = self.fibers.blocks[bi]
            x64 = np.asarray(fib["x_"], np.float64)
            t64 = np.asarray(fib["tension_"], np.float64)
            np_dt = np.dtype(jnp.dtype(b.x.dtype).name)
            x_lo = (x64 - x64.astype(np_dt).astype(np.float64)
                    if self.emulated else np.zeros_like(x64))
            t_lo = (t64 - t64.astype(np_dt).astype(np.float64)
                    if self.emulated else np.zeros_like(t64))
            self.fibers.blocks[bi] = b.replace(
                x=b.x.at[row].set(jnp.asarray(x64, b.x.dtype)),
                x_lo=b.x_lo.at[row].set(jnp.asarray(x_lo, b.x.dtype)),
                tension=b.tension.at[row].set(jnp.asarray(t64, b.x.dtype)),
                tension_lo=b.tension_lo.at[row].set(jnp.asarray(t_lo, b.x.dtype)),
                length=b.length.at[row].set(fib["length_"]),
                length_prev=b.length_prev.at[row].set(fib["length_prev_"]),
            )
        shell_sol = frame.get("shell", {}).get("solution_vec_")
        if self.shell is not None and shell_sol is not None and len(shell_sol):
            self.shell.state = self.shell.state.replace(
                solution=jnp.asarray(shell_sol))
        body_groups = frame.get("bodies", [[], [], []])
        flat = list(body_groups[0]) + list(body_groups[2])
        for body, entry in zip(self.bodies.bodies, flat):
            q = np.asarray(entry["orientation_"])  # stored as w, x, y, z
            body.state = body.state.replace(
                position=jnp.asarray(entry["position_"]),
                orientation=jnp.asarray(q),
                solution=jnp.asarray(entry["solution_vec_"]),
            )
        try:
            self.rng.load(frame["rng_state"])
        except (KeyError, ValueError, IndexError, TypeError):
            logger.warning("could not restore RNG state; reseeding")
        if rebuilt and hasattr(self, "_step_fn"):
            self._plan_state = None
            self._step_fn = self._build_step_fn()
            self._collision_fn = self._build_collision_fn()
            self._velocity_fn = self._build_velocity_fn()
        # rebuild the solution vector from restored component solutions; the
        # fiber slots are [x; y; z; T] of the restored state itself
        # (trajectory_reader.cpp:238-246)
        sol = np.zeros(self.total_solution_size())
        off = 0
        for b in self.fibers.blocks:
            x = np.asarray(b.x)        # (B, n, 3)
            T = np.asarray(b.tension)  # (B, n)
            packed = np.concatenate([x.transpose(0, 2, 1),
                                     T[:, None, :]], axis=1)  # (B, 4, n)
            cnt = packed.size
            sol[off:off + cnt] = packed.reshape(-1)
            off += cnt
        F = self.fiber_solution_size()
        FS = F + self.shell_solution_size()
        if self.shell is not None:
            sol[F:FS] = np.asarray(self.shell.state.solution)
        off = FS
        for body in self.bodies.bodies:
            n = body.state.solution_size
            stored = np.asarray(body.state.solution)
            if stored.size == n:
                sol[off:off + n] = stored
            off += n
        self.curr_solution = sol

    def _resume_from(self, path: str):
        reader = tio.TrajectoryReader(path)
        self.load_frame_state(reader.load_frame(-1))
        self._open_writer(resume=True)


def run_from_config(config_path: str, resume: bool = False) -> System:
    from skellysim_tpu.io import tomlio

    config = tomlio.load(config_path)
    system = System(config, resume=resume)
    system.run()
    return system
