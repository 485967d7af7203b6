"""Command-line entry point.

Mirrors the reference binary's interface (src/skelly_sim.cpp:26-30):

    python -m skellysim_tpu.cli --config-file=skelly_config.toml \
        [--resume] [--overwrite] [--listen]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def _n_devices_arg(value):
    """argparse type for --n-devices: 'auto' or a positive int."""
    if value == "auto":
        return value
    try:
        n = int(value)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"--n-devices must be 'auto' or an integer, got {value!r}")
    if n < 1:
        raise argparse.ArgumentTypeError(
            f"--n-devices must be >= 1, got {n}")
    return n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="skellysim_tpu")
    ap.add_argument("--config-file", default="skelly_config.toml")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the trajectory's last frame")
    ap.add_argument("--overwrite", action="store_true",
                    help="allow overwriting an existing trajectory")
    ap.add_argument("--listen", action="store_true",
                    help="serve analysis requests (streamlines/fields) over stdin/stdout")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu/tpu); default uses the session default")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host run: call jax.distributed.initialize() "
                         "and shard the system over every device "
                         "(coordinator/process env auto-detected on TPU pods; "
                         "the mpirun replacement — see scripts/skelly_sim_tpu_pod.sh)")
    ap.add_argument("--n-devices", default=None, type=_n_devices_arg,
                    help="shard the system over this many local devices "
                         "('auto' = all); implied by --distributed")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler trace of the run into this directory")
    args = ap.parse_args(argv)

    logging.basicConfig(level=os.environ.get("SKELLY_LOG", "INFO"),
                        format="[%(asctime)s] [%(levelname)s] %(message)s")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        import jax

        # one process per host; TPU pod env supplies coordinator address,
        # process count and index (jax.distributed docs). This replaces the
        # reference's MPI_Init_thread (src/skelly_sim.cpp:14). Outside a
        # recognized cluster (e.g. a hand-launched CPU/GPU fleet, or the CI
        # smoke test), SKELLY_COORDINATOR / SKELLY_NUM_PROCESSES /
        # SKELLY_PROCESS_ID supply the rendezvous explicitly — the
        # `mpirun -n N` analogue.
        coord = os.environ.get("SKELLY_COORDINATOR")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["SKELLY_NUM_PROCESSES"]),
                process_id=int(os.environ["SKELLY_PROCESS_ID"]))
        else:
            jax.distributed.initialize()

    traj = "skelly_sim.out"
    if not args.resume and not args.listen and os.path.exists(traj) and not args.overwrite:
        print(f"Trajectory file '{traj}' already exists. "
              "Use --overwrite to overwrite, or --resume to continue.", file=sys.stderr)
        return 1
    if args.resume and not os.path.exists(traj):
        print(f"--resume requested but '{traj}' does not exist", file=sys.stderr)
        return 1

    from skellysim_tpu.io import tomlio

    config = tomlio.load(args.config_file)
    if config.get("params", {}).get("fiber_type") == "SpectralPenalty":
        # spectral penalty fibers run through their own minimal driver
        # (uncoupled 2D elastica — the reference keeps this fiber offline;
        # see system/spectral_system.py)
        if args.resume or args.listen:
            print("fiber_type=SpectralPenalty supports plain runs only",
                  file=sys.stderr)
            return 1
        from skellysim_tpu.system.spectral_system import SpectralSystem

        SpectralSystem(config, output_file=traj).run()
        return 0

    from skellysim_tpu.system import System

    n_devices = args.n_devices
    if n_devices is None and args.distributed:
        n_devices = "auto"
    system = System(config, resume=args.resume, listen=args.listen,
                    n_devices=n_devices)
    if args.listen:
        from skellysim_tpu.analysis.listener import serve

        serve(system)
    elif args.profile_dir:
        import jax

        with jax.profiler.trace(args.profile_dir):
            system.run()
    else:
        system.run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
