"""Precompute pipeline: surface meshes, quadrature, dense periphery operators.

TPU-native analogue of the reference's `skelly_precompute` console script
(src/skelly_sim/precompute.py): reads the config TOML, builds periphery/body
surfaces and quadrature, assembles the periphery's second-kind operator
(stresslet×normal − singularity subtraction − identity + complementary
null-space completion) and its dense inverse M⁻¹, and writes .npz files with
the same keys the reference uses (quadrature_weights,
stresslet_plus_complementary, M_inv, normals, nodes / node_weights,
node_normals_ref, node_positions_ref) so precompute data is interchangeable.

The O(N³) inversion runs once offline; the runtime only applies the dense
operators (periphery.cpp:21-47).

Run:  python -m skellysim_tpu.precompute [config.toml]
"""

from __future__ import annotations

import sys

import numpy as np

from skellysim_tpu.precompute import quadrature, shapes

# geometry conventions shared with the reference (precompute.py:27-36)
PERIPHERY_NODE_SCALE_FACTOR = 1.04
BODY_QUAD_RADIUS_OFFSET_LOW = 0.1
BODY_QUAD_RADIUS_OFFSET_HIGH = 0.2
BODY_QUAD_RADIUS_THRESHOLD = 2.0


def _stresslet_times_normal_np(r: np.ndarray, normals: np.ndarray,
                               chunk: int = 512) -> np.ndarray:
    """(3N, 3N) dense stresslet×normal operator, numpy f64 (host, offline).

    Assembled in target chunks to bound the (N, N, 3, 3) intermediates that
    otherwise dominate the precompute wall time at N ≳ 4000.
    """
    N = r.shape[0]
    out = np.empty((3 * N, 3 * N))
    for lo in range(0, N, chunk):
        hi = min(lo + chunk, N)
        d = r[lo:hi, None, :] - r[None, :, :]              # d_ij = r_i - r_j
        r2 = np.einsum("ijk,ijk->ij", d, d)
        diag = np.arange(lo, hi)
        r2[np.arange(hi - lo), diag] = 1.0
        rinv5 = r2 ** -2.5
        rinv5[np.arange(hi - lo), diag] = 0.0
        dn = np.einsum("ijk,jk->ij", d, normals)
        coeff = (-3.0 / (4.0 * np.pi)) * dn * rinv5
        blocks = coeff[:, :, None, None] * d[:, :, :, None] * d[:, :, None, :]
        out[3 * lo:3 * hi] = blocks.transpose(0, 2, 1, 3).reshape(3 * (hi - lo), 3 * N)
    return out


def _singularity_vectors(r: np.ndarray, normals: np.ndarray,
                         weights: np.ndarray, chunk: int = 512) -> np.ndarray:
    """e_k-direction singularity-subtraction vectors, stacked (3, N, 3).

    ek[k, i, :] = Σ_{j≠i} −3/(4π) (d·(w_j e_k))(d·n_j) d / r⁵
    (reference: periphery.py get_singularity_subtraction_vectors).
    """
    N = r.shape[0]
    out = np.zeros((3, N, 3))
    for lo in range(0, N, chunk):
        hi = min(lo + chunk, N)
        d = r[lo:hi, None, :] - r[None, :, :]
        r2 = np.einsum("ijk,ijk->ij", d, d)
        diag = np.arange(lo, hi)
        r2[np.arange(hi - lo), diag] = 1.0
        rinv5 = r2 ** -2.5
        rinv5[np.arange(hi - lo), diag] = 0.0
        dn = np.einsum("ijk,jk->ij", d, normals)
        for k in range(3):
            dq = d[:, :, k] * weights[None, :]
            coeff = (-3.0 / (4.0 * np.pi)) * dq * dn * rinv5
            out[k, lo:hi] = np.einsum("ij,ijk->ik", coeff, d)
    return out


def build_periphery_operator(nodes: np.ndarray, normals: np.ndarray,
                             weights: np.ndarray):
    """Second-kind operator and inverse for the confining shell.

    Follows the reference's construction (precompute.py:112-141): the unknown
    is the weight-premultiplied density σ_i = w_i q_i;
      A = T − E − diag(1/w) + n nᵀ
    with T the stresslet×normal matrix, E the per-node singularity columns
    e_k(i)/w_i, and n nᵀ the rank-completion over normals.
    """
    N = nodes.shape[0]
    A = _stresslet_times_normal_np(nodes, normals)
    ek = _singularity_vectors(nodes, normals, weights)
    for i in range(N):
        for k in range(3):
            A[3 * i:3 * i + 3, 3 * i + k] -= ek[k, i] / weights[i]
    A -= np.diag(np.repeat(1.0 / weights, 3))
    A += np.outer(normals.ravel(), normals.ravel())
    M_inv = np.linalg.inv(A)
    return A, M_inv


def precompute_periphery(config: dict) -> dict | None:
    if "periphery" not in config:
        return None
    peri = config["periphery"]
    shape = peri["shape"]
    sf = PERIPHERY_NODE_SCALE_FACTOR
    if shape == "sphere":
        surf = shapes.sphere(peri["n_nodes"], peri["radius"] * sf)
        weights = quadrature.sphere_weights(surf.nodes, peri["radius"] * sf)
    elif shape == "ellipsoid":
        a, b, c = peri["a"] * sf, peri["b"] * sf, peri["c"] * sf
        surf = shapes.ellipsoid(peri["n_nodes"], a, b, c)
        weights = quadrature.ellipsoid_weights(surf.nodes, a, b, c)
    elif shape == "surface_of_revolution":
        env = peri["envelope"]
        height = _envelope_height_fn(env)
        surf = shapes.surface_of_revolution(
            height, env["lower_bound"], env["upper_bound"],
            target_nodes=peri.get("n_nodes", env.get("n_nodes_target", 6000)),
            scale_factor=sf)
        # ring-product weights from the mesh structure (exact azimuthally)
        weights = surf.weights if surf.weights is not None else \
            quadrature.triangulated_weights(surf.nodes)
        peri["n_nodes"] = surf.nodes.shape[0]
    else:
        raise ValueError(f"unknown periphery shape {shape!r}")

    # the shell's outward normal points INTO the domain (reference flips sign,
    # precompute.py:81-82)
    normals = -surf.normals
    A, M_inv = build_periphery_operator(surf.nodes, normals, weights)
    out = {
        "quadrature_weights": weights,
        "stresslet_plus_complementary": A,
        "M_inv": M_inv,
        "normals": normals,
        "nodes": surf.nodes,
    }
    np.savez(peri["precompute_file"], **out)
    return out


def _envelope_height_fn(env: dict):
    import math

    namespace = {"np": np, "math": math}
    namespace.update({k: v for k, v in env.items() if isinstance(v, (int, float))})
    return eval("lambda x: " + env["height"], namespace)  # noqa: S307 (config-authored)


def _body_effective_radius(r: float) -> float:
    if r < BODY_QUAD_RADIUS_THRESHOLD:
        return r - BODY_QUAD_RADIUS_OFFSET_LOW
    return r - BODY_QUAD_RADIUS_OFFSET_HIGH


def precompute_body(body: dict) -> dict:
    shape = body["shape"]
    n = body["n_nodes"]
    if shape == "sphere":
        radius = _body_effective_radius(body["radius"])
        surf = shapes.sphere(n, radius)
        weights = quadrature.sphere_weights(surf.nodes, radius)
    elif shape == "ellipsoid":
        axes = [_body_effective_radius(r) for r in body["axis_length"]]
        surf = shapes.ellipsoid(n, *axes)
        weights = quadrature.ellipsoid_weights(surf.nodes, *axes)
    else:
        raise ValueError(f"body precompute not implemented for shape {shape!r}")
    out = {
        "node_weights": weights,
        "node_normals_ref": surf.normals,
        "node_positions_ref": surf.nodes,
    }
    np.savez(body["precompute_file"], **out)
    return out


def main(argv=None) -> int:
    from skellysim_tpu.io import tomlio

    argv = sys.argv[1:] if argv is None else argv
    config_file = argv[0] if argv else "skelly_config.toml"
    config = tomlio.load(config_file)
    n_nodes_before = config.get("periphery", {}).get("n_nodes")

    seen = set()
    for body in config.get("bodies", []):
        pf = body["precompute_file"]
        if pf not in seen:
            seen.add(pf)
            print(f"precomputing body -> {pf}")
            precompute_body(body)

    if "periphery" in config:
        print(f"precomputing periphery -> {config['periphery']['precompute_file']}")
        precompute_periphery(config)
        if config["periphery"].get("n_nodes") != n_nodes_before:
            import shutil

            shutil.copy(config_file, config_file + ".bak")
            tomlio.dump(config, config_file)
            print("periphery node count changed; config updated (backup written)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
