"""Free-surface (MAC) validation: flag classification, exact surface-cell
continuity, the Dirichlet-anchored pressure solve, hydrostatic equilibrium,
free-fall kinematics, and dam-break physics (ops/surface.py +
models/freesurface.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from navierstokes_parallel_tpu import particles as P
from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.grid import allocate_state
from navierstokes_parallel_tpu.models import freesurface as FS
from navierstokes_parallel_tpu.ops import surface as surf


def _params(n=16, **kw):
    base = dict(problem=1, i_max=n, j_max=n, a=1.0, b=1.0, T=0.05,
                Re=100.0, tau=0.4, omega=1.7, epsilon=1e-6, max_it=2000,
                dtype="float64")
    base.update(kw)
    return Params(**base)


def _flags_from_mask(fluid_interior: np.ndarray) -> surf.Flags:
    nx, ny = fluid_interior.shape[0] + 2, fluid_interior.shape[1] + 2
    fl = np.zeros((nx, ny), bool)
    fl[1:-1, 1:-1] = fluid_interior
    return surf.classify(jnp.asarray(fl))


def test_cell_flags_from_particles():
    params = _params(n=8)
    # One particle in cell (2, 3): x in ((2-1)dx, 2dx), y likewise.
    pset = P.init_particles([[1.6 / 8, 2.4 / 8], [0.5, 0.99]],
                            dtype=jnp.float64)
    flags = surf.cell_flags(pset.x, pset.y, pset.active, params)
    fl = np.asarray(flags.fluid)
    assert fl[2, 3] and fl[5, 8]
    assert fl.sum() == 2
    # Inactive particles do not count.
    pset2 = P.ParticleSet(pset.x, pset.y, jnp.asarray([False, True]))
    flags2 = surf.cell_flags(pset2.x, pset2.y, pset2.active, params)
    assert np.asarray(flags2.fluid).sum() == 1


def test_classify_surface_and_bulk():
    # 6x6 interior, fluid in rows j=1..3 (a liquid layer).
    fl = np.zeros((6, 6), bool)
    fl[:, 0:3] = True
    flags = _flags_from_mask(fl)
    s = np.asarray(flags.surface)[1:-1, 1:-1]
    b = np.asarray(flags.bulk)[1:-1, 1:-1]
    # Top fluid row (j index 2) touches empty above -> surface.
    assert s[:, 2].all() and not s[:, 0:2].any()
    assert b[:, 0:2].all() and not b[:, 2].any()
    # Walls never make surface: bottom row is bulk despite ghost below.
    assert b[0, 0] and b[5, 0]


def test_surface_bcs_zero_divergence_exactly():
    """After apply_surface_bcs every surface cell has machine-zero discrete
    divergence, for an adversarial random field and a geometry with 1-, 2-,
    and 3-empty-neighbor surface cells."""
    params = _params(n=10)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=params.shape))
    v = jnp.asarray(rng.normal(size=params.shape))
    fl = np.zeros((10, 10), bool)
    fl[:, 0:4] = True          # layer
    fl[4, 4] = True            # bump (3 empty neighbors)
    fl[7:9, 4:7] = True        # tower (corners have 2 empty neighbors)
    flags = _flags_from_mask(fl)
    u2, v2 = surf.apply_surface_bcs(u, v, flags, params)
    div = np.asarray(surf._interior_divergence(u2, v2, params))
    s = np.asarray(flags.surface)[1:-1, 1:-1]
    assert s.sum() >= 12
    assert np.max(np.abs(div[s])) < 1e-12
    # Fluid-fluid faces are untouched: a bulk cell whose neighbors are all
    # bulk keeps its divergence bit-for-bit.
    div0 = np.asarray(surf._interior_divergence(u, v, params))
    b = np.asarray(flags.bulk)[1:-1, 1:-1]
    deep = b.copy()
    deep[1:, :] &= b[:-1, :]
    deep[:-1, :] &= b[1:, :]
    deep[:, 1:] &= b[:, :-1]
    deep[:, :-1] &= b[:, 1:]
    assert deep.any()
    np.testing.assert_array_equal(div[deep], div0[deep])


def test_surface_bcs_zero_divergence_single_free_face_matches_book():
    """One empty neighbor (east): the correction must reproduce the
    discrete-continuity rule u_e = u_w - dx*(v_n - v_s)/dy (Griebel eq.
    8.10)."""
    params = _params(n=6)
    rng = np.random.default_rng(5)
    u = rng.normal(size=params.shape)
    v = rng.normal(size=params.shape)
    fl = np.ones((6, 6), bool)
    fl[3, 2] = False   # empty cell east of fluid cell (3, 3) in padded idx
    flags = _flags_from_mask(fl)
    # Fluid cell (padded) (3, 3): east empty -> u[3, 3] set by continuity.
    u2, v2 = surf.apply_surface_bcs(jnp.asarray(u), jnp.asarray(v),
                                    flags, params)
    i, j = 3, 3
    expect = u[i - 1, j] - params.dx / params.dy * (v[i, j] - v[i, j - 1])
    assert abs(float(u2[i, j]) - expect) < 1e-12


def test_pressure_solve_contract_and_dirichlet():
    params = _params(n=16, epsilon=1e-8)
    fl = np.zeros((16, 16), bool)
    fl[:, 0:8] = True
    flags = _flags_from_mask(fl)
    rng = np.random.default_rng(7)
    rhs = jnp.zeros(params.shape).at[1:-1, 1:-1].set(
        rng.normal(size=(16, 16)))
    p0 = jnp.zeros(params.shape)
    res = surf.solve_pressure_free(p0, rhs, flags, params)
    assert bool(res.converged)
    p = np.asarray(res.p)
    bulk = np.asarray(flags.bulk)
    assert np.all(p[~bulk] == 0.0)          # Dirichlet + masking
    # Residual on bulk cells really is below the contract threshold.
    w = surf._traced_weights(flags, params)
    from navierstokes_parallel_tpu.ops import masked
    r = np.asarray(masked.masked_residual(jnp.asarray(p),
                                          rhs[1:-1, 1:-1], w))
    l2 = np.sqrt((r ** 2).sum() / float(w.n_fluid))
    assert l2 <= params.epsilon * 1.5 + 1e-12


def test_hydrostatic_equilibrium():
    """Liquid at rest under gravity: velocities stay at rounding level and
    the pressure relaxes to the exact discrete hydrostatic profile of the
    TRUE surface position p(y_j) = g * (y_surface - y_j): the default
    SUMMAC interpolated condition (ops/surface.py::interp_coeffs) puts
    the full surface cell's p at p_below/3 = g*dy/2, so the profile
    references the top face — exact for any sub-cell surface height,
    where the plain-MAC p=0 carries an O(dy/2) offset."""
    params, fs = FS.filled_box(n=24, T=0.1)
    fs2, stats = FS.solve_free(params, fs)
    assert int(stats.sor_failures) == 0
    # Bound at the pressure-solve tolerance scale: the interpolated
    # surface refresh runs once per refinement outer, so the converged
    # field carries O(eps) rather than pure-rounding velocities.
    assert float(jnp.max(jnp.abs(fs2.state.u))) < 1e-9
    assert float(jnp.max(jnp.abs(fs2.state.v))) < 1e-9
    p = np.asarray(fs2.state.p)
    # depth 0.5 at n=24 -> fluid cells j=1..12 (all FULL: fill=1), surface
    # row j=12, true surface at its top face.
    j_surf = 12
    for j in range(1, j_surf + 1):
        expect = (j_surf - j + 0.5) * params.dy
        np.testing.assert_allclose(p[1:-1, j], expect, atol=1e-9)
    # Plain-MAC variant still available and exact w.r.t. the CELL CENTER.
    fs3, _ = FS.solve_free(params, fs, p_surface="atmospheric")
    p3 = np.asarray(fs3.state.p)
    np.testing.assert_allclose(p3[1:-1, 1], (j_surf - 1) * params.dy,
                               atol=1e-9)
    assert float(jnp.max(jnp.abs(fs3.state.v))) < 1e-10


def test_drop_free_fall_com():
    """Airborne blob: COM follows y0 - g t^2/2 up to the O(dt) splitting
    bias of advecting with the end-of-step field (err ~ -g*t*dt/2), and
    the bias halves with dt.  x-COM must not drift."""
    params, fs = FS.drop(n=32, T=0.3)
    cx0, cy0 = FS.center_of_mass(fs)
    fs2, _ = FS.solve_free(params, fs)
    t = float(fs2.state.t)
    cx, cy = FS.center_of_mass(fs2)
    assert abs(cx - cx0) < 1e-10
    err = cy - (cy0 - 0.5 * t * t)
    dt = t / 3  # three equal gravity-capped steps
    assert abs(err + 0.5 * t * dt) < 0.2 * abs(0.5 * t * dt)
    # Halve dt via tau: bias halves (first-order in dt, as analyzed).
    params2, fsb = FS.drop(n=32, T=0.3, tau=0.2)
    fs3, _ = FS.solve_free(params2, fsb)
    t3 = float(fs3.state.t)
    _, cy3 = FS.center_of_mass(fs3)
    err3 = cy3 - (cy0 - 0.5 * t3 * t3)
    assert abs(err3) < 0.65 * abs(err)


def test_dam_break_physics():
    """Column collapse (free-slip container, the classic setting): the
    front accelerates out but never beats the shallow-water (Ritter)
    bound 2*sqrt(g h); the residual column height decreases; fluid volume
    is conserved to a few percent of the flag-field quantization; no
    pressure solve fails."""
    params, fs = FS.dam_break(n=16, T=1.0, width=1.0, height=2.0,
                              a=4.0, b=3.0)
    v0 = FS.fluid_volume(fs, params)
    h0 = FS.column_height(fs)
    f0 = FS.front_position(fs)
    fs2, stats = FS.solve_free(params, fs, wall="freeslip")
    assert int(stats.sor_failures) == 0
    t = float(fs2.state.t)
    front = FS.front_position(fs2)
    # Moving out, below the inviscid bound x0 + 2 sqrt(gh) t.
    g, h = 1.0, 2.0
    assert f0 + 0.25 * np.sqrt(g * h) * t < front < f0 + 2.0 * np.sqrt(
        g * h) * t
    # Free-slip walls drain the column (no pinned wall film).
    assert FS.column_height(fs2) < h0 - 0.1
    assert abs(FS.fluid_volume(fs2, params) - v0) / v0 < 0.08
    # All particles stay in the box (none deactivated).
    assert bool(jnp.all(fs2.pset.active))


def test_freeslip_wall_semantics():
    """set_freeslip: zero normal edge velocity, tangential ghost COPIES
    the interior node (zero normal gradient) — vs set_noslip's negation."""
    from navierstokes_parallel_tpu.ops import boundary
    params = _params(n=8)
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.normal(size=params.shape))
    v = jnp.asarray(rng.normal(size=params.shape))
    u2, v2 = boundary.set_freeslip(u, v, boundary.Side.LEFT)
    assert np.all(np.asarray(u2)[0, 1:-1] == 0.0)
    np.testing.assert_array_equal(np.asarray(v2)[0, 1:-1],
                                  np.asarray(v)[1, 1:-1])
    u3, v3 = boundary.set_freeslip(u, v, boundary.Side.TOP)
    assert np.all(np.asarray(v3)[1:-1, -2] == 0.0)
    np.testing.assert_array_equal(np.asarray(u3)[1:-1, -1],
                                  np.asarray(u)[1:-1, -2])
    # A wall-parallel uniform stream is a fixed point of free-slip BCs
    # (it would be destroyed by no-slip).
    us = jnp.ones(params.shape)
    vs = jnp.zeros(params.shape)
    uf, vf = FS._box_bcs(us, vs, "freeslip")
    np.testing.assert_array_equal(np.asarray(uf)[1:-2, :],
                                  np.asarray(us)[1:-2, :])
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vs))
    with pytest.raises(ValueError, match="wall"):
        FS._box_bcs(us, vs, "slippery")


def test_free_step_jits_once_across_geometry():
    """The flag field is traced: stepping two DIFFERENT geometries through
    the same params hits one compiled program (the whole point of the
    vectorized surface treatment)."""
    params = _params(n=12, T=0.01)
    fs_a = FS.FreeSurfaceState(allocate_state(params),
                               FS.fill_region(params, 0, 1, 0, 0.4))
    fs_b = FS.FreeSurfaceState(allocate_state(params),
                               FS.fill_region(params, 0, 0.4, 0, 1))
    step = FS.make_free_step_fn(params)
    step(fs_a)  # compile
    n0 = step._cache_size()
    step(fs_b)
    assert step._cache_size() == n0 == 1


def test_trace_free_matches_device_loop():
    params, fs = FS.dam_break(n=8, T=0.3, width=1.0, height=1.5,
                              a=2.0, b=2.0)
    fs_d, stats_d = FS.solve_free(params, fs)
    fs_h, stats_h, frames = FS.trace_free(params, fs)
    assert int(stats_d.steps) == int(stats_h.steps)
    np.testing.assert_array_equal(np.asarray(fs_d.pset.x),
                                  np.asarray(fs_h.pset.x))
    np.testing.assert_array_equal(np.asarray(fs_d.state.u),
                                  np.asarray(fs_h.state.u))
    assert frames.shape[0] == int(stats_h.steps) + 1


def test_obstacle_domain_equivalence():
    """Exact composition check: a dam break in a 5 x 3 box whose right
    fifth is blocked by an obstacle strip must evolve IDENTICALLY to the
    same dam break in a 4 x 3 box — the obstacle faces carry the same
    no-slip semantics as the domain wall, the traced pressure weights
    drop the obstacle neighbors exactly as the ghost ring is dropped,
    and the common fluid cells see the same equations, sweeps, and
    thresholds.  Matches the masked-solver equivalence methodology
    (tests/test_obstacles.py)."""
    n = 8
    pw, fw = FS.dam_break(n=n, a=5.0, b=3.0)      # wide + obstacle
    pw = dataclasses.replace(
        pw, obstacles=((4 * n + 1, 5 * n, 1, 3 * n),))
    fw = FS.FreeSurfaceState(
        state=allocate_state(pw),
        pset=FS.fill_region(pw, 0.0, 1.0, 0.0, 2.0))
    pn, fn = FS.dam_break(n=n, a=4.0, b=3.0)      # narrow, no obstacle
    step_w = FS.make_free_step_fn(pw, "noslip")
    step_n = FS.make_free_step_fn(pn, "noslip")
    for _ in range(12):
        fw, dw = step_w(fw)
        fn, dn = step_n(fn)
    np.testing.assert_allclose(float(fw.state.t), float(fn.state.t),
                               rtol=1e-12)
    # Common region: u edges 0..4n (the narrow wall edge IS the wide
    # obstacle face, both 0), interior cells 1..4n for v and p.
    ue = 4 * n + 1
    np.testing.assert_allclose(np.asarray(fw.state.u)[:ue, :],
                               np.asarray(fn.state.u)[:ue, :], atol=1e-11)
    np.testing.assert_allclose(np.asarray(fw.state.v)[1:ue, :],
                               np.asarray(fn.state.v)[1:ue, :], atol=1e-11)
    np.testing.assert_allclose(np.asarray(fw.state.p)[1:ue, :],
                               np.asarray(fn.state.p)[1:ue, :], atol=1e-9)
    # Same particles, same trajectories.
    assert int(jnp.sum(fw.pset.active)) == int(jnp.sum(fn.pset.active))
    np.testing.assert_allclose(np.asarray(fw.pset.x), np.asarray(fn.pset.x),
                               atol=1e-11)


def test_obstacle_submerged_block_hydrostatic():
    """Liquid at rest over a fully submerged block: the no-slip obstacle
    faces and the dropped pressure weights must preserve the exact
    discrete hydrostatic equilibrium (velocities at solver-tolerance
    level, pressure profile of the true surface position in every fluid
    column, including above the block)."""
    n = 24
    params, fs = FS.filled_box(n=n, T=0.1)
    params = dataclasses.replace(params, obstacles=((8, 13, 3, 6),))
    fs = FS.FreeSurfaceState(
        state=allocate_state(params),
        pset=FS.fill_region(params, 0.0, 1.0, 0.0, 0.5))
    fs2, stats = FS.solve_free(params, fs)
    assert int(stats.sor_failures) == 0
    assert float(jnp.max(jnp.abs(fs2.state.u))) < 1e-9
    assert float(jnp.max(jnp.abs(fs2.state.v))) < 1e-9
    p = np.asarray(fs2.state.p)
    from navierstokes_parallel_tpu.ops.obstacles import fluid_mask
    fl = fluid_mask(params)
    j_surf = 12
    for j in range(1, j_surf + 1):
        expect = (j_surf - j + 0.5) * params.dy
        col = fl[1:-1, j]
        np.testing.assert_allclose(p[1:-1, j][col], expect, atol=1e-9)


def test_obstacle_no_particle_leakage():
    """Dam break surging over a bottom block: active particles never end
    up inside obstacle cells, and fluid volume is conserved up to the
    deactivated markers."""
    n = 8
    params, _ = FS.dam_break(n=n, a=5.0, b=3.0, T=1.5)
    params = dataclasses.replace(
        params, obstacles=((2 * n + 1, 3 * n, 1, n // 2),))
    fs = FS.FreeSurfaceState(
        state=allocate_state(params),
        pset=FS.fill_region(params, 0.0, 1.0, 0.0, 2.0))
    n0 = int(jnp.sum(fs.pset.active))
    fs2, stats = FS.solve_free(params, fs, wall="freeslip")
    from navierstokes_parallel_tpu.ops.obstacles import fluid_mask
    fl = fluid_mask(params)
    ci = np.clip(np.floor(np.asarray(fs2.pset.x) / params.dx).astype(int)
                 + 1, 1, params.i_max)
    cj = np.clip(np.floor(np.asarray(fs2.pset.y) / params.dy).astype(int)
                 + 1, 1, params.j_max)
    act = np.asarray(fs2.pset.active)
    assert fl[ci, cj][act].all(), "active particle inside an obstacle"
    n1 = int(act.sum())
    assert n1 >= 0.97 * n0, (n0, n1)


def test_rejects_x32():
    """The refined free-surface solve needs the f64 master (like every
    refined solve); without x64 it must refuse loudly, not drift."""
    params = _params(n=8)
    flags = _flags_from_mask(np.ones((8, 8), bool))
    with jax.enable_x64(False):
        with pytest.raises(ValueError, match="x64"):
            surf.solve_pressure_free(
                jnp.zeros(params.shape, jnp.float32),
                jnp.zeros(params.shape, jnp.float32), flags, params)


def test_sloshing_dispersion():
    """Standing gravity wave (mode 1, depth 0.5): measured period within
    5% of the finite-depth dispersion relation omega^2 = g k tanh(k h),
    amplitude sustained (not staircase-locked), volume conserved.  The
    sharp quantitative free-surface validation — requires the implicit
    SUMMAC interpolated surface condition; the amplitude here is ~2 cells
    (sub-flag-field), where plain MAC's p=0 locks and dies."""
    n, depth, amp, g, ppc = 48, 0.5, 0.04, 1.0, 6
    params, fs = FS.sloshing(n=n, depth=depth, amp=amp, g=g, T=5.6,
                             ppc=ppc)
    step = FS.make_free_step_fn(params, "freeslip", ppc, "interpolated")
    ts, es = [], []
    while float(fs.state.t) < params.T:
        fs, diag = step(fs)
        el = FS.surface_elevation(fs, params, ppc=ppc)
        ts.append(float(fs.state.t))
        es.append(el[0] - el[-1])   # antinode difference: 2x amplitude
    ts, es = np.array(ts), np.array(es)
    idx = np.where(np.diff(np.sign(es)) != 0)[0]
    cross = np.array([ts[i] - es[i] * (ts[i + 1] - ts[i])
                      / (es[i + 1] - es[i]) for i in idx])
    assert len(cross) >= 3, f"wave locked: only {len(cross)} crossings"
    period = cross[2] - cross[0]
    k = np.pi / params.a
    expected = 2 * np.pi / np.sqrt(g * k * np.tanh(k * depth))
    assert abs(period - expected) / expected < 0.05, (period, expected)
    # Amplitude sustained through the measured cycle (initial signal
    # 2*amp = 0.08; a dead/staircase-locked wave decays well below half).
    second_peak = np.max(np.abs(es[idx[1]:idx[2] + 1]))
    assert second_peak > 0.5 * 2 * amp
    # Volume conserved (flag-field quantization level).
    v_end = FS.fluid_volume(fs, params)
    assert abs(v_end - depth * params.a) / (depth * params.a) < 0.05
