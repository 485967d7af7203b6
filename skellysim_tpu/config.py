"""Typed configuration API → TOML.

User-facing config generation mirroring the reference's Python dataclass API
(src/skelly_sim/skelly_config.py) so existing workflows translate directly:
build a :class:`Config`, call :meth:`Config.save`, run the simulation on the
resulting TOML. The TOML schema is field-compatible with the reference's
(params table, [[fibers]], [periphery], [[bodies]], [[point_sources]],
[background]) so configs are interchangeable between the two codebases.

Defaults follow the reference Python front end (skelly_config.py:373-432);
note the C++ side's slightly different fallback defaults (params.cpp:3-20)
also apply when fields are omitted from the TOML.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from skellysim_tpu.io import tomlio


@dataclass
class DynamicInstability:
    n_nodes: int = 0
    v_growth: float = 0.0
    f_catastrophe: float = 0.0
    v_grow_collision_scale: float = 0.5
    f_catastrophe_collision_scale: float = 2.0
    nucleation_rate: float = 0.0
    radius: float = 0.025
    min_length: float = 0.5
    bending_rigidity: float = 2.5e-3
    min_separation: float = 0.1


@dataclass
class PeripheryBinding:
    active: bool = False
    polar_angle_start: float = 0.0
    polar_angle_end: float = 2 * np.pi
    threshold: float = 0.75


@dataclass
class FiberPeripheryInteraction:
    f_0: float = 20.0
    l_0: float = 0.05


@dataclass
class Params:
    eta: float = 1.0
    dt_initial: float = 0.025
    dt_min: float = 1e-5
    dt_max: float = 0.025
    dt_write: float = 0.1
    t_final: float = 100.0
    gmres_tol: float = 1e-8
    gmres_restart: Optional[int] = None  # Krylov restart length (None -> Belos' 300 default)
    gmres_warm_start: bool = True    # start from the previous step's solution (Belos uses x0=0; same converged answer, fewer iterations)
    fiber_error_tol: float = 1e-1
    seed: int = 130319
    implicit_motor_activation_delay: float = 0.0
    dynamic_instability: DynamicInstability = field(default_factory=DynamicInstability)
    periphery_binding: PeripheryBinding = field(default_factory=PeripheryBinding)
    fiber_periphery_interaction: FiberPeripheryInteraction = field(
        default_factory=FiberPeripheryInteraction
    )
    periphery_interaction_flag: bool = False
    adaptive_timestep_flag: bool = True
    beta_up: float = 1.2             # dt growth factor (C++-side default, params.cpp:8)
    beta_down: float = 0.5           # dt shrink factor on rejection
    compat_timestep_clock: bool = False  # reproduce the reference's clock accounting (see System.run)
    pair_evaluator: str = "direct"   # "direct" (XLA), "pallas" (TPU tiled), "ewald" (spectral far field); "CPU"/"GPU"/"FMM" accepted as aliases
    precision: str = "double"        # "double" (tight tolerances) | "single" (TPU production)
    fiber_type: str = "FiniteDifference"
    # spectral-Ewald evaluator knobs (pair_evaluator = "ewald")
    ewald_a: Optional[float] = None              # splitting width (None → mean spacing)
    ewald_points_per_a: float = 3.0              # grid resolution (accuracy knob)
    ewald_box: Optional[list] = None             # [[lo3],[hi3]] fixed box (None → auto)
    ewald_cap: int = 192                         # near-field cell capacity
    ewald_hybrid: bool = True                    # route small-pair-count couplings to the dense kernels
    ewald_cut_in_a: Optional[float] = None       # near-field cutoff in units of a (None -> tol-aware 3.0/3.5)
    ewald_near_mxu: bool = False                 # near-field output contractions on the MXU (A/B knob)
    ewald_near_poly: bool = False                # FMA-only polynomial screened coefficients (A/B knob)
    ewald_plan_skin: float = 0.25                # Verlet plan-reuse skin as a fraction of r_cut (0 = rebuild plans every step)
    emulated_tol_scope: str = "rhs"              # emulated-precision tol scope: "rhs" (Belos parity) or "increment" (per-increment accuracy, more iterations)
    fiber_precond_bf16: bool = False             # bf16 fiber block-Jacobi inverse (precond-only HBM lever for the >=1e6-point regime)


@dataclass
class Fiber:
    n_nodes: int = 32
    parent_body: int = -1
    parent_site: int = -1
    force_scale: float = 0.0
    bending_rigidity: float = 2.5e-3
    radius: float = 0.0125
    length: float = 1.0
    minus_clamped: bool = False
    x: List[float] = field(default_factory=list)

    def fill_node_positions(self, x0: np.ndarray, normal: np.ndarray) -> None:
        """Place nodes uniformly on the segment x0 + s·normal, s ∈ [0, length]."""
        pos = np.asarray(x0) + self.length * np.linspace(0, np.asarray(normal), self.n_nodes)
        self.x = pos.ravel().tolist()


def _sample_sphere_directions(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _reject_min_separation(points_iter, n_wanted, ds_min, existing=()):
    """Greedy rejection sampling for a minimum pairwise separation.

    Uses a uniform-grid hash so each candidate only checks its 27 neighboring
    cells — O(1) per candidate, which matters at thousands of fibers.
    """
    cell = max(ds_min, 1e-12)
    grid: dict = {}
    ds2 = ds_min * ds_min

    def key(p):
        return tuple((p // cell).astype(np.int64))

    def ok(p):
        kx, ky, kz = key(p)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    for q in grid.get((kx + dx, ky + dy, kz + dz), ()):
                        d = p - q
                        if d @ d < ds2:
                            return False
        return True

    def insert(p):
        grid.setdefault(key(p), []).append(p)

    for q in existing:
        insert(np.asarray(q, float))
    out = []
    for p in points_iter:
        if len(out) >= n_wanted:
            break
        p = np.asarray(p, float)
        if ok(p):
            insert(p)
            out.append(p)
    if len(out) < n_wanted:
        raise RuntimeError(
            f"could only place {len(out)}/{n_wanted} points at separation {ds_min}")
    return np.asarray(out)


def perturbed_fiber_positions(amplitude: float, length: float, x0: np.ndarray,
                              normal: np.ndarray, n_nodes: int,
                              ortho: Optional[np.ndarray] = None,
                              rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Fiber nodes with a small cosine perturbation orthogonal to its axis,
    arclength-parametrized so the node spacing stays uniform (the config-side
    seed shape for buckling studies; skelly_config.py:130-171 analogue)."""
    rng = rng or np.random.default_rng()
    normal = np.asarray(normal, float)
    normal = normal / np.linalg.norm(normal)
    if ortho is None:
        ref = np.array([1.0, 0.0, 0.0]) if abs(normal[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
        b = np.cross(normal, ref)
        b /= np.linalg.norm(b)
        c = np.cross(normal, b)
        theta = 2 * np.pi * rng.uniform()
        ortho = b * np.cos(theta) + c * np.sin(theta)

    # find the axial extent x_max whose perturbed curve has arclength `length`
    def arclen(x_max):
        t = np.linspace(0, x_max, 2048)
        y = amplitude * (np.cos(2 * np.pi * t / x_max) - 1)
        return np.sum(np.hypot(np.diff(t), np.diff(y)))

    lo, hi = 0.25 * length, length
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if arclen(mid) < length:
            lo = mid
        else:
            hi = mid
    x_max = 0.5 * (lo + hi)

    t = np.linspace(0, x_max, 4096)
    y = amplitude * (np.cos(2 * np.pi * t / x_max) - 1)
    s = np.concatenate([[0], np.cumsum(np.hypot(np.diff(t), np.diff(y)))])
    s_nodes = np.linspace(0, s[-1], n_nodes)
    t_nodes = np.interp(s_nodes, s, t)
    y_nodes = amplitude * (np.cos(2 * np.pi * t_nodes / x_max) - 1)
    return np.asarray(x0) + np.outer(t_nodes, normal) + np.outer(y_nodes, ortho)


@dataclass
class Periphery:
    """Confining boundary. ``precompute_file`` is generated by the precompute
    pipeline (skellysim_tpu.precompute); n_nodes controls quadrature size."""

    n_nodes: int = 6000
    shape: str = "sphere"            # sphere | ellipsoid | surface_of_revolution
    radius: float = 6.0              # sphere
    a: float = 6.0                   # ellipsoid semi-axes
    b: float = 6.0
    c: float = 6.0
    envelope: Optional[dict] = None  # surface-of-revolution height function spec
    precompute_file: str = "periphery_precompute.npz"

    def _surface_samples(self, rng, n):
        """Uniform samples on the attachment surface, pointing-inward normals."""
        if self.shape == "sphere":
            u = _sample_sphere_directions(rng, n)
            return self.radius * u, -u
        if self.shape == "ellipsoid":
            # rejection sampling weighted by the ellipsoid area element
            pts, nrms = [], []
            while len(pts) < n:
                u = _sample_sphere_directions(rng, 4 * n)
                x = u * np.array([self.a, self.b, self.c])
                g = 2 * x / np.array([self.a, self.b, self.c]) ** 2
                w = np.linalg.norm(g * np.array([self.a, self.b, self.c]), axis=1)
                keep = rng.uniform(0, w.max(), len(w)) < w
                for xi, gi in zip(x[keep], g[keep]):
                    pts.append(xi)
                    nrms.append(-gi / np.linalg.norm(gi))
            return np.asarray(pts[:n]), np.asarray(nrms[:n])
        if self.shape == "surface_of_revolution":
            from skellysim_tpu.precompute.main import _envelope_height_fn

            env = self.envelope
            h = _envelope_height_fn(env)
            lo, hi = env["lower_bound"], env["upper_bound"]
            eps = (hi - lo) * 1e-6
            xs = np.linspace(lo + eps, hi - eps, 4001)
            r = h(xs)
            dr = np.gradient(r, xs)
            dens = r * np.sqrt(1 + dr * dr)  # area density per unit x
            cdf = np.cumsum(dens)
            cdf /= cdf[-1]
            xi = np.interp(rng.uniform(size=n), cdf, xs)
            ri = np.interp(xi, xs, r)
            dri = np.interp(xi, xs, dr)
            phi = 2 * np.pi * rng.uniform(size=n)
            pts = np.stack([xi, ri * np.cos(phi), ri * np.sin(phi)], axis=1)
            nrm = np.stack([-dri, np.cos(phi), np.sin(phi)], axis=1)
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
            return pts, -nrm
        raise ValueError(f"unsupported periphery shape {self.shape!r}")

    def move_fibers_to_surface(self, fibers: List["Fiber"], ds_min: float,
                               seed: int = 0) -> None:
        """Place fiber minus ends uniformly on the surface (min separation
        ds_min), pointing inward, clamped (skelly_config.py:529-607)."""
        rng = np.random.default_rng(seed)
        pts, nrms = self._surface_samples(rng, 20 * len(fibers) + 100)
        chosen = _reject_min_separation(iter(pts), len(fibers), ds_min)
        for fib, x0 in zip(fibers, chosen):
            idx = int(np.argmin(np.linalg.norm(pts - x0, axis=1)))
            fib.fill_node_positions(x0, nrms[idx])
            fib.minus_clamped = True


@dataclass
class Body:
    shape: str = "sphere"            # sphere | ellipsoid | deformable
    n_nodes: int = 600
    radius: float = 1.0              # sphere
    axis_length: List[float] = field(default_factory=lambda: [1.0, 1.0, 1.0])  # ellipsoid
    position: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    orientation: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0, 1.0])
    n_nucleation_sites: int = 0
    nucleation_sites: List[float] = field(default_factory=list)

    def generate_nucleation_sites(self, ds_min: float, seed: int = 0) -> None:
        """Uniform random fiber-binding sites on the sphere surface with a
        minimum separation (skelly_config.py:808-847)."""
        if self.shape != "sphere":
            raise ValueError("nucleation sites only generated for spheres")
        rng = np.random.default_rng(seed)
        com = np.asarray(self.position)

        def gen():
            while True:
                yield com + self.radius * _sample_sphere_directions(rng, 1)[0]

        sites = _reject_min_separation(gen(), self.n_nucleation_sites, ds_min)
        self.nucleation_sites = sites.ravel().tolist()
    external_force: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    external_torque: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    external_force_type: str = "Linear"   # Linear | Oscillatory
    external_oscillation_force_amplitude: float = 0.0
    external_oscillation_force_frequency: float = 0.0
    external_oscillation_force_phase: float = 0.0
    precompute_file: str = "body_precompute.npz"


@dataclass
class Point:
    position: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    force: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    torque: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    time_to_live: float = 0.0


@dataclass
class BackgroundSource:
    components: List[int] = field(default_factory=lambda: [0, 1, 2])
    scale_factor: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    uniform: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])


def _to_dict(obj):
    if dataclasses.is_dataclass(obj):
        return {k: _to_dict(v) for k, v in dataclasses.asdict(obj).items() if v is not None}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.ravel().tolist()
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    return obj


@dataclass
class Config:
    params: Params = field(default_factory=Params)
    fibers: List[Fiber] = field(default_factory=list)
    periphery: Optional[Periphery] = None
    bodies: List[Body] = field(default_factory=list)
    point_sources: List[Point] = field(default_factory=list)
    background: Optional[BackgroundSource] = None

    def to_dict(self) -> dict:
        d = {"params": _to_dict(self.params)}
        if self.fibers:
            d["fibers"] = [_to_dict(f) for f in self.fibers]
        if self.periphery is not None:
            d["periphery"] = _to_dict(self.periphery)
        if self.bodies:
            d["bodies"] = [_to_dict(b) for b in self.bodies]
        if self.point_sources:
            d["point_sources"] = [_to_dict(p) for p in self.point_sources]
        if self.background is not None:
            d["background"] = _to_dict(self.background)
        return d

    def save(self, path) -> None:
        tomlio.dump(self.to_dict(), path)

    @staticmethod
    def load(path) -> dict:
        """Load a config TOML into the raw dict the System consumes."""
        return tomlio.load(path)


# ---- reference-named aliases (skelly_config.py Config{Spherical,Ellipsoidal,
# Revolution} and the periphery subclasses) so existing scripts translate
# almost verbatim ----

def SphericalPeriphery(**kw) -> Periphery:
    kw.setdefault("shape", "sphere")
    return Periphery(**kw)


def EllipsoidalPeriphery(**kw) -> Periphery:
    kw.setdefault("shape", "ellipsoid")
    return Periphery(**kw)


def PeripheryRevolution(**kw) -> Periphery:
    kw.setdefault("shape", "surface_of_revolution")
    return Periphery(**kw)


def ConfigSpherical(**kw) -> Config:
    c = Config(**kw)
    if c.periphery is None:
        c.periphery = SphericalPeriphery()
    return c


def ConfigEllipsoidal(**kw) -> Config:
    c = Config(**kw)
    if c.periphery is None:
        c.periphery = EllipsoidalPeriphery()
    return c


def ConfigRevolution(**kw) -> Config:
    c = Config(**kw)
    if c.periphery is None:
        c.periphery = PeripheryRevolution(envelope={})
    return c
