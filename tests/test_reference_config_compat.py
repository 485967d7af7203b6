"""Config compatibility: reference-repo TOML fixtures load and build systems.

Uses the reference's own committed fixture TOMLs (tests/core/test_files) to
prove schema interchangeability — the count assertions mirror its
unit_test_fibercontainer_finite_difference."""

import os

import numpy as np
import pytest

from skellysim_tpu.io import tomlio
from skellysim_tpu.system import System

REF = "/root/reference/tests/core/test_files"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference fixtures unavailable")


def _load_without_periphery(path):
    cfg = tomlio.load(path)
    # the fixtures reference a precompute npz we don't have; drop the shell
    cfg.pop("periphery", None)
    return cfg


def test_reference_fixture_n1(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _load_without_periphery(os.path.join(REF, "fiber_container_fdf_n1.toml"))
    system = System(cfg)
    assert system.fibers.n_fibers == 1
    assert system.fibers.blocks[0].n_nodes == 32
    assert system.total_solution_size() == 4 * 32
    assert float(system.fibers.blocks[0].length[0]) == 20.0
    assert float(system.fibers.blocks[0].bending_rigidity[0]) == 20.0
    err, conv = system.step()
    assert conv and np.isfinite(err)


def test_reference_fixture_n10(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _load_without_periphery(os.path.join(REF, "fiber_container_fdf_n10.toml"))
    system = System(cfg)
    # mirror of the MPI count assertions (10 fibers, 32 nodes each)
    assert system.fibers.n_fibers == 10
    assert system.fibers.node_count == 320
    assert system.total_solution_size() == 4 * 320
