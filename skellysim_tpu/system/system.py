"""System orchestration: init from config, implicit solve, time loop, I/O.

TPU-native analogue of the reference's System namespace (src/core/system.cpp):
the per-timestep work — operator/cache assembly, RHS build, matrix-free GMRES
over the block solution vector [fibers | shell | bodies], state advance, and
the fiber error metric — is traced into one jitted function, so a timestep is
a single XLA computation. The host loop only does adaptive-dt control flow,
backup/restore (cheap pytree references), and trajectory writes
(system.cpp:516-571).
"""

from __future__ import annotations

import functools
import json
import logging
import time as _walltime
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from skellysim_tpu.io import trajectory as tio
from skellysim_tpu.solver import gmres
from skellysim_tpu.system import fiber_system as fs
from skellysim_tpu.system.sources import BackgroundFlow, PointSources

logger = logging.getLogger("skellysim_tpu")


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
        self.fiber_type = g("fiber_type", "None")
        self.dynamic_instability = table.get("dynamic_instability", None)
        self.periphery_binding = table.get("periphery_binding", None)
        fpi = table.get("fiber_periphery_interaction", {})
        self.fp_f0 = fpi.get("f_0", 20.0)
        self.fp_l0 = fpi.get("l_0", 0.05)


class System:
    """One simulation: state + the compiled step + trajectory stream."""

    def __init__(self, config: dict, output_file: str = "skelly_sim.out",
                 resume: bool = False, listen: bool = False):
        self.config = config
        self.params = Params(config.get("params", {}))
        self.time = 0.0
        self.dt = self.params.dt_initial

        self.fibers = fs.FiberEnsemble.from_tables(config.get("fibers", []))
        self.point_sources = PointSources.from_tables(config.get("point_sources", []))
        self.background = BackgroundFlow.from_table(config.get("background", {}))

        # periphery / bodies slots (wired in by subclasses of capability growth)
        self.shell = None
        self.bodies = None

        self.rng = np.random.default_rng(self.params.seed)

        self.curr_solution = np.zeros(self.total_solution_size())
        self._writer: Optional[tio.TrajectoryWriter] = None
        self._output_file = output_file
        self._listen = listen
        if resume:
            self._resume_from(output_file)

        self._step_fn = self._build_step_fn()

    # ---- sizes ----
    def total_solution_size(self) -> int:
        return self.fibers.solution_size

    # ---- compiled timestep ----
    def _build_step_fn(self):
        gmres_tol = self.params.gmres_tol
        restart = min(300, max(30, self.total_solution_size()))
        eta = self.params.eta
        delay = self.params.implicit_motor_activation_delay
        has_points = int(np.asarray(self.point_sources.position).shape[0]) > 0
        has_background = self.background.is_active
        ops = self.fibers.ops

        @jax.jit
        def step_fn(blocks, point_sources, background, dt, time):
            # --- boundary conditions per block ---
            bc_minus = [jnp.where(b.minus_clamped | (b.binding_body >= 0), 1, 0)
                        for b in blocks]
            bc_plus = [jnp.zeros(b.n_fibers, jnp.int32) for b in blocks]

            r_all = fs.positions(blocks)

            # --- external velocities/forces before the solve (prep_state) ---
            v_all = jnp.zeros_like(r_all)
            if has_points:
                v_all = v_all + point_sources.flow(r_all, eta, time)
            if has_background:
                v_all = v_all + background.flow(r_all, eta)

            motor_on = (time >= delay).astype(r_all.dtype)
            motor = [motor_on * m for m in fs.constant_motor_force(blocks, ops)]
            f_ext = [jnp.zeros_like(b.x) for b in blocks]  # periphery repulsion slot
            total_f = [m + fe for m, fe in zip(motor, f_ext)]

            v_split = fs.split_nodes(blocks, v_all)
            caches = fs.update_caches(
                blocks, ops, eta, dt, bc_minus, bc_plus,
                flows=v_split, f_externals=total_f,
                v_on_fibers=v_split, f_on_fibers=f_ext,
            )
            b_vec = fs.rhs(caches)

            # --- matrix-free operator (System::apply_matvec) ---
            def matvec_fn(x):
                fw = fs.apply_fiber_force(blocks, caches, x)
                v = fs.flow(blocks, ops, r_all, fw, eta, subtract_self=True)
                return fs.matvec(blocks, ops, caches, x, v)

            def precond_fn(x):
                return fs.precondition(blocks, caches, x)

            res = gmres(matvec_fn, b_vec, tol=gmres_tol, restart=restart,
                        precond=precond_fn)

            new_blocks = fs.step(blocks, res.x)
            err = fs.fiber_error(new_blocks, ops)
            return new_blocks, res.x, err, res.residual, res.iterations, res.converged

        return step_fn

    # ---- host control ----
    def step(self):
        """One trial step at the current dt. Returns (fiber_error, converged)."""
        t0 = _walltime.perf_counter()
        blocks, sol, err, resid, iters, conv = self._step_fn(
            self.fibers.blocks, self.point_sources, self.background,
            jnp.asarray(self.dt), jnp.asarray(self.time),
        )
        err = float(err)
        self.fibers.blocks = blocks
        self.curr_solution = np.asarray(sol)
        logger.info(
            "solver: iters %d, residual %.3e, converged %s, wall %.3fs",
            int(iters), float(resid), bool(conv), _walltime.perf_counter() - t0,
        )
        return err, bool(conv)

    def check_collision(self) -> bool:
        return False  # no periphery/bodies in the base configuration

    def run(self):
        """Adaptive-dt time loop with trajectory writes (system.cpp:516-571)."""
        p = self.params
        self._open_writer()
        self.write_config_snapshot("skelly_sim.initial_config")
        while self.time < p.t_final:
            backup = self.fibers.blocks  # immutable pytrees: reference == backup
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
                self.time += self.dt
                if int(self.time / p.dt_write) > int((self.time - self.dt) / p.dt_write):
                    self.write_frame()
            else:
                self.fibers.blocks = backup
            logger.info("time %.6g, dt %.6g, fiber_error %.3e", self.time, dt_new, fiber_error)
        self.write_config_snapshot("skelly_sim.final_config")

    # ---- I/O ----
    def _open_writer(self, resume: bool = False):
        if self._writer is None and not self._listen:
            self._writer = tio.TrajectoryWriter(self._output_file, resume=resume)

    def _rng_state_strings(self) -> List[List[str]]:
        state = json.dumps(self.rng.bit_generator.state)
        return [[state, state]]

    def _frame_dict(self) -> dict:
        fib_entries = []
        for bi, row in self.fibers.perm:
            b = self.fibers.blocks[bi]
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
                tension=np.asarray(b.tension[row]),
                x=np.asarray(b.x[row]),
                minus_clamped=bool(b.minus_clamped[row]),
            ))
        return tio.pack_frame(
            time=self.time, dt=self.dt, rng_state=self._rng_state_strings(),
            fibers=fib_entries, spherical_bodies=[], ellipsoidal_bodies=[],
            shell_solution=np.zeros(0),
        )

    def write_frame(self):
        self._open_writer()
        self._writer.write_frame(self._frame_dict())

    def write_config_snapshot(self, path: str):
        with open(path, "wb") as f:
            import msgpack

            f.write(msgpack.packb(self._frame_dict()))

    def _resume_from(self, path: str):
        reader = tio.TrajectoryReader(path)
        frame = reader.load_frame(-1)
        self.time = frame["time"]
        self.dt = frame["dt"]
        fibers = frame["fibers"][1]
        for i, fib in enumerate(fibers):
            bi, row = self.fibers.perm[i]
            b = self.fibers.blocks[bi]
            self.fibers.blocks[bi] = b.replace(
                x=b.x.at[row].set(jnp.asarray(fib["x_"])),
                tension=b.tension.at[row].set(jnp.asarray(fib["tension_"])),
                length=b.length.at[row].set(fib["length_"]),
                length_prev=b.length_prev.at[row].set(fib["length_prev_"]),
            )
        try:
            self.rng.bit_generator.state = json.loads(frame["rng_state"][0][0])
        except (KeyError, ValueError, IndexError):
            logger.warning("could not restore RNG state; reseeding")
        self._open_writer(resume=True)


def run_from_config(config_path: str, resume: bool = False) -> System:
    from skellysim_tpu.io import tomlio

    config = tomlio.load(config_path)
    system = System(config, resume=resume)
    system.run()
    return system
