"""Slab-decomposed multi-device spectral far field.

The round-4 sharded far field (`ewald.far_field_apply_sharded`) spreads
per-device point shards into FULL logical grids, psums them, and convolves
redundantly — every device holds the whole padded grid + spectra, so the
multi-chip regime inherits the single-chip grid-memory wall and the psum
moves O(grid) bytes per apply. This module is the genuinely distributed
replacement (the analogue of the reference's MPI-distributed FMM far field,
include/kernels.hpp:56-134, where the octree is partitioned across ranks):

  • the grid's x axis is slab-partitioned across the mesh: device d owns
    logical x-planes [d·Lloc, (d+1)·Lloc), Lloc = ceil(Gx/nd);
  • each device spreads ONLY the source points whose nearest x-plane falls
    in its range (points are replicated — they are O(N) ≪ O(grid) bytes —
    and each device compact-selects its own by a sort, static cap);
    window tails crossing slab boundaries are ppermute halo-exchanged
    (2 sends of W2 planes each — O(grid_yz) bytes, not O(grid));
  • the 3-D FFT runs as the classic slab decomposition: local staged
    z-rfft + y-fft on the x-shard, ONE all_to_all transpose to y-shards,
    local x-fft (the Hockney x zero-pad happens after the transpose, so
    every device does equal spread work and the transpose moves only
    logical-x rows);
  • the k-space multiply uses the y-SHARDED spectra slice — per-device
    spectra memory is O(spectra/nd), directly attacking the
    SKELLY_EWALD_SPECTRA_GB wall;
  • inverse transpose + local inverse FFTs + halo-read interp of the
    device's own targets; per-point velocities are routed back to the
    replicated layout with one O(N) psum.

Per-device memory: O(grid/nd + N); collectives per apply: one all_to_all
each way (O(grid/nd) per device), four W2-plane ppermutes, one O(N) psum.

Requires the padded y dimension P1 ≡ 0 (mod nd) — build the grid with
``y_multiple=nd`` (grid_shape_for/build_grid); `slab_grid_ok` checks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from skellysim_tpu.kernels.ewald import (
    EwaldGrid,
    _es_beta,
    _interp_slab,
    _slab_bins,
    _slab_cap,
    _slab_CP,
    _slab_entry_bound,
    _spread_slab,
)


def _nd(mesh):
    return int(np.prod(list(mesh.shape.values())))


def slab_grid_ok(grid: EwaldGrid, nd: int) -> bool:
    """True when this grid supports an nd-way slab decomposition: the
    padded y dim transposes evenly AND the per-device x slab is at least
    the window half-width (single-hop halos)."""
    if grid.shape[1] % nd:
        return False
    L0 = int(grid.logical[0])
    return -(-L0 // nd) >= int(grid.support) // 2 + 1


def _part(grid: EwaldGrid, nd: int):
    """(Lloc, W2) for the x-slab partition of the logical grid."""
    L0 = int(grid.logical[0])
    Lloc = -(-L0 // nd)
    W2 = int(grid.support) // 2
    # halo exchange moves W2 planes between NEIGHBOURS only; a slab
    # narrower than the window half-width would need multi-hop halos
    if Lloc < W2 + 1:
        raise ValueError(
            f"x slab {Lloc} planes < window half-width {W2 + 1}; "
            f"grid too small for {nd}-way slab decomposition")
    return Lloc, W2


def _select_local(r, v, lo, h, L0, Lloc, cap, axis):
    """Compact-select the calling device's points by x-slab ownership.

    Sort-based (no cumsum — the prefix-scan lowering blows the TPU
    compiler's scoped-vmem budget at 1e6 points): keys order local points
    first (by slab — a free pre-sort for the downstream binning), the
    first ``cap`` survive. Returns (r_sel, v_sel, idx, n_dropped) where
    idx[j] = global point index or N for empty slots and dropped counts
    points beyond the cap on THIS device."""
    N = r.shape[0]
    d = jax.lax.axis_index(axis)
    x0 = d * Lloc
    sx = jnp.clip(jnp.floor((r[:, 0] - lo[0]) / h + 0.5).astype(jnp.int32),
                  0, L0 - 1)
    mine = (sx >= x0) & (sx < x0 + Lloc)
    key = jnp.where(mine, sx, jnp.int32(2 ** 30))
    order = jnp.argsort(key)[:cap]
    valid = mine[order]
    idx = jnp.where(valid, order, N)
    # harmless stand-in position for empty slots: the slab-range centre
    # (bins cleanly, zero payload contributes nothing)
    safe = lo + jnp.stack([(x0 + Lloc // 2).astype(r.dtype) * h,
                           jnp.zeros((), r.dtype), jnp.zeros((), r.dtype)])
    r_sel = jnp.where(valid[:, None], r[jnp.clip(order, 0, N - 1)], safe)
    v_sel = (None if v is None else
             jnp.where(valid[:, None], v[jnp.clip(order, 0, N - 1)], 0.0))
    n_dropped = jnp.maximum(jnp.sum(mine.astype(jnp.int32)) - cap, 0)
    return r_sel, v_sel, idx, n_dropped


def _local_bins(r_sel, lo, h, Lloc, axis, slab_cap, support):
    """Slab bins of the local selection, in LOCAL slab coordinates."""
    d = jax.lax.axis_index(axis)
    lo_local = lo + jnp.stack([(d * Lloc).astype(r_sel.dtype) * h,
                               jnp.zeros((), r_sel.dtype),
                               jnp.zeros((), r_sel.dtype)])
    cap_pts = r_sel.shape[0]
    scap = slab_cap or _slab_cap(cap_pts, Lloc)
    CP = _slab_CP(scap)
    E = _slab_entry_bound(cap_pts, Lloc, CP)
    return _slab_bins(r_sel, h, lo_local, Lloc, scap, CP, E, r_sel.dtype,
                      support), lo_local, scap


def _halo_add(buf, Lloc, W2, axis):
    """Fold the spread buffer's halo rows into the owning neighbours.

    buf: (C, W2 + Lloc + W2 + 1, Gy, Gz) from _spread_slab(padded_out).
    Returns the owned interior (C, Lloc, Gy, Gz)."""
    nd = jax.lax.axis_size(axis)
    interior = buf[:, W2: W2 + Lloc]
    if nd == 1 or W2 == 0:
        return interior
    bottom = buf[:, :W2]                      # prev device's tail rows
    top = buf[:, W2 + Lloc: W2 + Lloc + W2]   # next device's head rows
    recv_tail = jax.lax.ppermute(bottom, axis,
                                 [(i, i - 1) for i in range(1, nd)])
    recv_head = jax.lax.ppermute(top, axis,
                                 [(i, i + 1) for i in range(nd - 1)])
    interior = interior.at[:, Lloc - W2:].add(recv_tail)
    interior = interior.at[:, :W2].add(recv_head)
    return interior


def _halo_read(u_loc, Lloc, W2, axis):
    """Assemble the interp input buffer with neighbour halo rows.

    u_loc: (C, Lloc, Gy, Gz) owned planes. Returns
    (C, W2 + Lloc + W2 + 1, Gy, Gz) — the gpad layout _interp_slab expects
    with halo_in=True (the +1 row is the zero dummy absorber)."""
    nd = jax.lax.axis_size(axis)
    C, _, Gy, Gz = u_loc.shape
    if W2 == 0:
        return jnp.pad(u_loc, ((0, 0), (0, 1), (0, 0), (0, 0)))
    if nd == 1:
        return jnp.pad(u_loc, ((0, 0), (W2, W2 + 1), (0, 0), (0, 0)))
    tail = u_loc[:, Lloc - W2:]
    head = u_loc[:, :W2]
    from_prev = jax.lax.ppermute(tail, axis,
                                 [(i, i + 1) for i in range(nd - 1)])
    from_next = jax.lax.ppermute(head, axis,
                                 [(i, i - 1) for i in range(1, nd)])
    return jnp.concatenate([from_prev, u_loc, from_next,
                            jnp.zeros((C, 1, Gy, Gz), u_loc.dtype)], axis=1)


def _fft_fwd_local(g_loc, grid: EwaldGrid, Lx, axis):
    """Staged forward FFT of the x-sharded density block.

    g_loc: (C, Lloc, L1, L2) real → (C, P0, P1/nd, P2h) complex
    (y-sharded, x-full) via local z-rfft + y-fft, one all_to_all
    transpose, local x zero-pad + fft."""
    L0, L1, L2 = (int(v) for v in grid.logical)
    P0, P1, P2 = grid.shape
    nd = jax.lax.axis_size(axis)
    zh = jnp.fft.rfft(jnp.pad(g_loc, ((0, 0), (0, 0), (0, 0),
                                      (0, P2 - L2))), axis=3)
    yh = jnp.fft.fft(jnp.pad(zh, ((0, 0), (0, 0), (0, P1 - L1),
                                  (0, 0))), axis=2)
    if nd > 1:
        yh = jax.lax.all_to_all(yh, axis, split_axis=2, concat_axis=1,
                                tiled=True)      # (C, Lx, P1/nd, P2h)
    return jnp.fft.fft(jnp.pad(yh, ((0, 0), (0, P0 - Lx), (0, 0),
                                    (0, 0))), axis=1)


def _fft_inv_local(uh, grid: EwaldGrid, Lx, Lloc, axis):
    """Inverse of ``_fft_fwd_local``: (3, P0, P1/nd, P2h) → (3, Lloc, L1, L2)."""
    L0, L1, L2 = (int(v) for v in grid.logical)
    P2 = grid.shape[2]
    nd = jax.lax.axis_size(axis)
    u = jnp.fft.ifft(uh, axis=1)[:, :Lx]
    if nd > 1:
        u = jax.lax.all_to_all(u, axis, split_axis=1, concat_axis=2,
                               tiled=True)       # (3, Lloc, P1, P2h)
    u = jnp.fft.ifft(u, axis=2)[:, :, :L1]
    return jnp.fft.irfft(u, n=P2, axis=3)[:, :, :, :L2]


def _kmul_stokeslet(fh, kh_loc):
    """u_i = Σ_j Ŝ_ij f̂_j with the 6 symmetric real spectra (y-slice)."""
    ux = kh_loc[0] * fh[0] + kh_loc[1] * fh[1] + kh_loc[2] * fh[2]
    uy = kh_loc[1] * fh[0] + kh_loc[3] * fh[1] + kh_loc[4] * fh[2]
    uz = kh_loc[2] * fh[0] + kh_loc[4] * fh[1] + kh_loc[5] * fh[2]
    return jnp.stack([ux, uy, uz])


def _kmul_stresslet(Dh, kh_loc, phihat_loc, grid: EwaldGrid, axis):
    """Far stresslet k-space identity on the y-sharded layout (math per
    ewald._far_stresslet_convolve)."""
    P0, P1, P2 = grid.shape
    h = grid.h
    nd = jax.lax.axis_size(axis)
    d = jax.lax.axis_index(axis)
    rdt = kh_loc.dtype
    kx = jnp.asarray(2 * np.pi * np.fft.fftfreq(P0, d=h), rdt)[:, None, None]
    ky_full = jnp.asarray(2 * np.pi * np.fft.fftfreq(P1, d=h), rdt)
    P1nd = P1 // nd
    ky = jax.lax.dynamic_slice(ky_full, (d * P1nd,), (P1nd,))[None, :, None]
    kz = jnp.asarray(2 * np.pi * np.fft.rfftfreq(P2, d=h), rdt)[None, None, :]
    Dxx, Dxy, Dxz, Dyy, Dyz, Dzz = Dh
    Mx = kx * Dxx + ky * Dxy + kz * Dxz
    My = kx * Dxy + ky * Dyy + kz * Dyz
    Mz = kx * Dxz + ky * Dyz + kz * Dzz
    trD = Dxx + Dyy + Dzz
    ux = 2.0 * (kh_loc[0] * Mx + kh_loc[1] * My + kh_loc[2] * Mz) \
        + kx * phihat_loc * trD
    uy = 2.0 * (kh_loc[1] * Mx + kh_loc[3] * My + kh_loc[4] * Mz) \
        + ky * phihat_loc * trD
    uz = 2.0 * (kh_loc[2] * Mx + kh_loc[4] * My + kh_loc[5] * Mz) \
        + kz * phihat_loc * trD
    return 1j * jnp.stack([ux, uy, uz])


def _caps(N, Nt, nd, src_cap, trg_cap, select_mult: int = 3):
    """Static compact-select caps: ``select_mult``x the uniform share +
    margin absorbs clustering; overflow is counted (far plan ``dropped`` /
    far_slab_dropped to size) and the System doubles the evaluator's
    far_select_mult on overflow. The SAME formula must be used by plan
    build and apply."""
    if src_cap is None:
        src_cap = min(N, -(-select_mult * N // nd // 128) * 128 + 128)
    if trg_cap is None:
        trg_cap = min(Nt, -(-select_mult * Nt // nd // 128) * 128 + 128)
    return src_cap, trg_cap


def make_far_plan_sharded(grid: EwaldGrid, mesh, r_src, r_trg,
                          slab_cap=None, src_cap: int = None,
                          trg_cap: int = None, select_mult: int = 3):
    """Positions-only per-device far plan (selection indices + slab bins),
    built ONCE per step and reused across every GMRES apply — the mesh
    analogue of ``EwaldStokeslet.make_far_plan`` (the argsorts cost tens of
    ms at 1e5 points per apply). Every leaf carries a leading length-1
    local axis so the plan stacks/splits cleanly across the mesh
    (out/in_specs P(axis)); ``dropped`` counts select-cap overflow."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    nd = _nd(mesh)
    Lloc, W2 = _part(grid, nd)
    L0 = int(grid.logical[0])
    N, Nt = r_src.shape[0], r_trg.shape[0]
    src_cap, trg_cap = _caps(N, Nt, nd, src_cap, trg_cap, select_mult)

    def body(r_s, r_t, lo):
        rs_l, _, idx_s, drop_s = _select_local(r_s, None, lo, grid.h, L0,
                                               Lloc, src_cap, axis)
        bins_s, lo_s, _ = _local_bins(rs_l, lo, grid.h, Lloc, axis,
                                      slab_cap, grid.support)
        rt_l, _, idx_t, drop_t = _select_local(r_t, None, lo, grid.h, L0,
                                               Lloc, trg_cap, axis)
        bins_t, lo_t, _ = _local_bins(rt_l, lo, grid.h, Lloc, axis,
                                      slab_cap, grid.support)
        plan = {"idx_s": idx_s, "bins_s": bins_s, "lo_s": lo_s,
                "idx_t": idx_t, "bins_t": bins_t, "lo_t": lo_t,
                "dropped": (drop_s + drop_t).astype(jnp.int32)}
        return jax.tree.map(lambda a: a[None], plan)

    return shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                     out_specs=P(axis), check_vma=False)(
        r_src, r_trg, grid.lo)


def far_field_apply_slabbed(grid: EwaldGrid, r_src, f_src, r_trg, mesh,
                            slab_cap=None, src_cap: int = None,
                            trg_cap: int = None,
                            convolve: str = "stokeslet", plan=None,
                            select_mult: int = 3):
    """Distributed far field with x-slab grid + y-slab spectra partition.

    f_src: (N, 3) stokeslet strengths, or (N, 6) symmetric dipole channels
    (xx, xy, xz, yy, yz, zz) with convolve="stresslet". Returns (Nt, 3)
    replicated. See module docstring for the decomposition; parity vs the
    single-device slab path is exact up to FFT reassociation (~1e-6 f32).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    nd = _nd(mesh)
    if not slab_grid_ok(grid, nd):
        raise ValueError(
            f"padded y dim {grid.shape[1]} not divisible by {nd} devices; "
            "build the grid with y_multiple=n_devices")
    Lloc, W2 = _part(grid, nd)
    Lx = Lloc * nd
    L0 = int(grid.logical[0])
    N, Nt = r_src.shape[0], r_trg.shape[0]
    C = f_src.shape[1]
    src_cap, trg_cap = _caps(N, Nt, nd, src_cap, trg_cap, select_mult)
    scap = slab_cap or _slab_cap(src_cap, Lloc)
    tcap = slab_cap or _slab_cap(trg_cap, Lloc)
    # shard_spectra pre-stacks (and y-shards) the tuple; stacking a sharded
    # tuple here would re-layout, so accept both forms
    kh = (grid.khat if isinstance(grid.khat, jax.Array)
          else jnp.stack(grid.khat))           # (6, P0, P1, P2h)
    ph = grid.phihat

    def body(r_s, f_s, r_t, kh_loc, ph_loc, lo, plan_l):
        if plan_l is None:
            rs_l, fs_l, _, _ = _select_local(r_s, f_s, lo, grid.h, L0, Lloc,
                                             src_cap, axis)
            bins_s, lo_s, _ = _local_bins(rs_l, lo, grid.h, Lloc, axis,
                                          slab_cap, grid.support)
        else:
            pl = jax.tree.map(lambda a: a[0], plan_l)
            idx_s = pl["idx_s"]
            fs_l = jnp.where((idx_s < N)[:, None],
                             f_s[jnp.clip(idx_s, 0, N - 1)], 0.0)
            bins_s, lo_s = pl["bins_s"], pl["lo_s"]
        buf = _spread_slab(fs_l, fs_l, lo_s, grid.h,
                           (Lloc, int(grid.logical[1]), int(grid.logical[2])),
                           grid.support, cap=scap, bins=bins_s,
                           padded_out=True)
        g_loc = _halo_add(buf, Lloc, W2, axis)
        fh = _fft_fwd_local(g_loc, grid, Lx, axis)
        if convolve == "stokeslet":
            uh = _kmul_stokeslet(fh, kh_loc)
        else:
            uh = _kmul_stresslet(fh, kh_loc, ph_loc, grid, axis)
        u_loc = _fft_inv_local(uh, grid, Lx, Lloc, axis)
        if plan_l is None:
            rt_l, _, idx_t, _ = _select_local(r_t, None, lo, grid.h, L0,
                                              Lloc, trg_cap, axis)
            bins_t, lo_t, _ = _local_bins(rt_l, lo, grid.h, Lloc, axis,
                                          slab_cap, grid.support)
        else:
            idx_t, bins_t, lo_t = pl["idx_t"], pl["bins_t"], pl["lo_t"]
            rt_l = jnp.zeros((trg_cap, 3), r_t.dtype)   # bins carry geometry
        gpad = _halo_read(u_loc, Lloc, W2, axis)
        u_pts = _interp_slab(gpad, rt_l, lo_t, grid.h, grid.support,
                             cap=tcap, bins=bins_t, halo_in=True)
        out = jnp.zeros((Nt, 3), u_pts.dtype)
        out = out.at[jnp.minimum(idx_t, Nt)].add(
            jnp.where((idx_t < Nt)[:, None], u_pts, 0.0), mode="drop")
        return jax.lax.psum(out, axis)

    plan_spec = (None if plan is None
                 else jax.tree.map(lambda _: P(axis), plan))
    u = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, None, axis, None),
                  P(None, axis, None), P(), plan_spec),
        out_specs=P(), check_vma=False)(
        r_src, f_src, r_trg, kh, ph, grid.lo, plan)
    return u


def far_slab_dropped(grid: EwaldGrid, mesh, r, cap: int):
    """Points the per-device compact-select would drop at capacity ``cap``
    (max over devices) — the sizing diagnostic for src_cap/trg_cap."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    nd = _nd(mesh)
    Lloc, _ = _part(grid, nd)
    L0 = int(grid.logical[0])

    def body(r_, lo):
        d = jax.lax.axis_index(axis)
        x0 = d * Lloc
        sx = jnp.clip(jnp.floor((r_[:, 0] - lo[0]) / grid.h + 0.5)
                      .astype(jnp.int32), 0, L0 - 1)
        mine = (sx >= x0) & (sx < x0 + Lloc)
        n_over = jnp.maximum(jnp.sum(mine.astype(jnp.int32)) - cap, 0)
        return jax.lax.pmax(n_over, axis)

    return shard_map(body, mesh=mesh, in_specs=(P(), P()),
                     out_specs=P(), check_vma=False)(r, grid.lo)


def shard_spectra(grid: EwaldGrid, mesh) -> EwaldGrid:
    """Re-place the tabulated spectra with a y-sharded layout so each device
    PHYSICALLY holds only its 1/nd slice (the spectra are the dominant
    device buffers at ≥1e6-point scale — 2.75 GB in the r4b run). The
    returned grid is a drop-in for far_field_apply_slabbed, whose in_specs
    match this placement (no resharding at dispatch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    kh = (grid.khat if isinstance(grid.khat, jax.Array)
          else jnp.stack(grid.khat))
    khat = jax.device_put(kh, NamedSharding(mesh, P(None, None, axis, None)))
    phihat = jax.device_put(grid.phihat,
                            NamedSharding(mesh, P(None, axis, None)))
    return grid._replace(khat=khat, phihat=phihat)
