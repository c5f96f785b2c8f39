"""Cut-cell (aperture) pressure operator — the second-order Neumann
closure at immersed boundaries (ops/obstacles.py::apertures +
ops/masked.py weight scaling + the aperture-weighted RHS divergence).

The reference has no obstacle support at all; these tests validate the
beyond-reference closure three ways:

  1. REDUCTION: an axis-aligned box level set lying exactly on the
     rasterized faces produces binary face fractions and a solve that is
     bit-identical to the staircase path (the same invariant
     test_ib.py asserts for the velocity BCs).
  2. ACCURACY: a manufactured Neumann Poisson problem on a domain with an
     off-grid plane wall — the aperture solve's L2 error must be several
     times below the staircase solve's (which cannot converge past the
     O(1)-per-dx wall-placement error) and must keep shrinking with
     resolution.
  3. CONSISTENCY: the full time step with apertures conserves the fluid
     fluxes (the projected velocity field satisfies the aperture-weighted
     discrete continuity it was projected against), and rb_sor/mg masked
     solvers agree on the same cut-cell operator.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.ops import masked
from navierstokes_parallel_tpu.ops import obstacles as obs


def _plane_params(n, mode, y_w, **kw):
    dy = 1.0 / n
    yj = (np.arange(1, n + 1) - 0.5) * dy
    j1 = int(np.where(yj < y_w)[0][-1]) + 1  # 1-based inclusive solid rows
    defaults = dict(problem=1, i_max=n, j_max=n,
                    obstacles=((1, n, 1, j1),),
                    obstacle_surfaces=(("plane", 0.0, 1.0, y_w),),
                    obstacle_pressure=mode, dtype="float64",
                    epsilon=1e-10, max_it=200000, omega=1.8)
    defaults.update(kw)
    return Params(**defaults)


def test_aligned_box_reduces_to_staircase():
    """Box level set on the rasterized faces: binary fractions, identical
    weights, and a bit-identical masked mg solve."""
    n = 16
    rect = (5, 8, 6, 10)
    box = ("box", 4 / 16, 8 / 16, 5 / 16, 10 / 16)
    p_plain = Params(problem=1, i_max=n, j_max=n, obstacles=(rect,),
                     dtype="float64", epsilon=1e-8, max_it=50000)
    p_sharp = p_plain.replace(obstacle_surfaces=(box,))
    assert obs.aperture_active(p_sharp)
    assert not obs.aperture_active(p_plain)

    ap = obs.apertures(p_sharp)
    assert set(np.unique(ap.au)) <= {0.0, 1.0}
    assert set(np.unique(ap.av)) <= {0.0, 1.0}
    assert set(np.unique(ap.theta)) <= {0.0, 1.0}
    w1, w2 = masked._weights(p_plain), masked._weights(p_sharp)
    for f in ("w_e", "w_w", "w_n", "w_s", "diag"):
        np.testing.assert_array_equal(getattr(w1, f), getattr(w2, f))

    rng = np.random.default_rng(3)
    rhs = np.zeros((n + 2, n + 2))
    fluid = w1.fluid
    r = rng.standard_normal((n, n)) * fluid
    r -= fluid * r.sum() / w1.n_fluid          # compatible RHS
    rhs[1:-1, 1:-1] = r
    for method in ("rb_sor", "mg"):
        r1 = masked.solve_pressure_masked(
            jnp.zeros((n + 2, n + 2)), jnp.asarray(rhs), p_plain,
            method=method)
        r2 = masked.solve_pressure_masked(
            jnp.zeros((n + 2, n + 2)), jnp.asarray(rhs), p_sharp,
            method=method)
        if method == "rb_sor":
            # The fine-level operator is the whole rb_sor iteration:
            # binary fractions make the two paths bit-identical.
            np.testing.assert_array_equal(np.asarray(r1.p),
                                          np.asarray(r2.p))
            assert int(r1.iterations) == int(r2.iterations)
        else:
            # mg COARSENS the apertures geometrically (children averaged),
            # while the staircase path rebuilds binary weights from the
            # any-child-fluid coarse mask — for a box not aligned to the
            # coarse grid the V-cycles legitimately differ, so the two
            # converged answers agree only to the stopping tolerance.
            np.testing.assert_allclose(np.asarray(r1.p), np.asarray(r2.p),
                                       atol=1e-4, rtol=0)


def test_aperture_rhs_reduces_to_masked_divergence_on_aligned_box():
    n = 12
    rect = (4, 6, 5, 8)
    box = ("box", 3 / 12, 6 / 12, 4 / 12, 8 / 12)
    p_sharp = Params(problem=1, i_max=n, j_max=n, obstacles=(rect,),
                     obstacle_surfaces=(box,), dtype="float64")
    p_plain = p_sharp.replace(obstacle_pressure="staircase")
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.standard_normal(p_sharp.shape))
    G = jnp.asarray(rng.standard_normal(p_sharp.shape))
    r_ap = obs.poisson_rhs(F, G, 0.01, p_sharp)
    r_st = obs.poisson_rhs(F, G, 0.01, p_plain)
    # Binary apertures leave fluid-interior face fluxes untouched; the
    # only differences sit on fluid cells ADJACENT to the box, whose
    # staircase divergence reads the pinned obstacle-face F/G that the
    # closed aperture drops.  On fluid cells with no solid neighbor the
    # two must agree exactly.
    m = obs.masks(p_sharp)
    fl = m.fluid
    away = (fl[1:-1, 1:-1] & fl[2:, 1:-1] & fl[:-2, 1:-1]
            & fl[1:-1, 2:] & fl[1:-1, :-2])
    d = np.asarray(r_ap - r_st)[1:-1, 1:-1]
    np.testing.assert_array_equal(d * away, np.zeros_like(d))


def test_manufactured_neumann_plane_wall_accuracy():
    """Manufactured solution p = cos(pi x) cos(k pi (y - y_w)) with
    dp/dn = 0 on every wall of the plane-truncated cavity: the aperture
    operator must beat the staircase operator by >= 4x at both
    resolutions and keep improving with n (the staircase stalls on its
    O(1)-in-dx wall-placement error)."""
    y_w = 0.283749
    k = 1.0 / (1.0 - y_w)

    def p_exact(x, y):
        return np.cos(np.pi * x) * np.cos(k * np.pi * (y - y_w))

    def lap(x, y):
        return -(np.pi ** 2) * (1 + k * k) * p_exact(x, y)

    def solve(n, mode):
        params = _plane_params(n, mode, y_w)
        w = masked._weights(params)
        dx = dy = 1.0 / n
        xi = (np.arange(1, n + 1) - 0.5) * dx
        yj = (np.arange(1, n + 1) - 0.5) * dy
        X, Y = np.meshgrid(xi, yj, indexing="ij")
        # Finite-volume RHS: cell integral of lap / cell area = theta *
        # lap(fluid centroid).  Exact for the plane wall; the staircase
        # run takes the plain cell-center values (its operator has no
        # notion of cut cells).
        if mode == "aperture":
            ytop = np.arange(1, n + 1) * dy
            th = np.clip((ytop - y_w) / dy, 0.0, 1.0)[None, :]
            ylo = np.arange(n) * dy
            ycf = np.where((ylo[None, :] < y_w) & (ylo[None, :] + dy > y_w),
                           0.5 * (y_w + ylo[None, :] + dy), Y)
            rhs_int = lap(X, ycf) * th
        else:
            rhs_int = lap(X, Y)
        rhs_int = np.where(w.fluid, rhs_int, 0.0)
        rhs_int -= np.where(w.fluid, rhs_int.sum() / w.n_fluid, 0.0)
        rhs = np.zeros((n + 2, n + 2))
        rhs[1:-1, 1:-1] = rhs_int
        res = masked.solve_pressure_masked(
            jnp.zeros((n + 2, n + 2)), jnp.asarray(rhs), params,
            method="mg")
        assert bool(res.converged)
        p = np.asarray(res.p)[1:-1, 1:-1]
        d = np.where(w.fluid, p - p_exact(X, Y), 0.0)
        d -= w.fluid * d.sum() / w.n_fluid     # Neumann: mod constants
        return float(np.sqrt((d * d).sum() / w.n_fluid))

    for n in (32, 64):
        e_st = solve(n, "staircase")
        e_ap = solve(n, "aperture")
        assert e_ap * 4.0 < e_st, (n, e_ap, e_st)
    assert solve(64, "aperture") < 0.75 * solve(32, "aperture")


def test_rb_sor_and_mg_agree_on_cut_operator():
    n = 24
    params = _plane_params(n, "aperture", 0.3331)
    w = masked._weights(params)
    rng = np.random.default_rng(1)
    r = rng.standard_normal((n, n)) * w.fluid
    r -= w.fluid * r.sum() / w.n_fluid
    rhs = np.zeros((n + 2, n + 2))
    rhs[1:-1, 1:-1] = r
    sols = {}
    for method in ("rb_sor", "mg"):
        res = masked.solve_pressure_masked(
            jnp.zeros((n + 2, n + 2)), jnp.asarray(rhs), params,
            method=method)
        assert bool(res.converged)
        p = np.asarray(res.p)[1:-1, 1:-1] * w.fluid
        p -= w.fluid * p.sum() / w.n_fluid
        sols[method] = p
    np.testing.assert_allclose(sols["rb_sor"], sols["mg"],
                               atol=2e-7, rtol=0)


def test_full_step_aperture_projection_is_divergence_free():
    """After one solver.step on a circle-obstacle domain the projected
    velocity must satisfy the SAME aperture-weighted continuity the
    pressure was solved against (fluid cells, excluding solid-adjacent
    cells whose BC faces carry no DOF correction by construction)."""
    from navierstokes_parallel_tpu import solver
    from navierstokes_parallel_tpu.grid import allocate_state
    from navierstokes_parallel_tpu.models import karman

    n = 32
    dx = dy = 1.0 / n
    cx = cy = 0.5
    d = 0.35
    rects = karman.circle_rects(cx, cy, d, dx, dy, n, n)
    params = Params(problem=1, i_max=n, j_max=n, obstacles=rects,
                    obstacle_surfaces=(("circle", cx, cy, 0.5 * d),),
                    dtype="float64", epsilon=1e-9, max_it=100000,
                    Re=100.0, T=1.0)
    assert obs.aperture_active(params)
    state = allocate_state(params)
    out, diag = jax.jit(
        lambda s: solver.step(s, params, pressure_method="mg"))(state)
    assert bool(diag.sor_converged)
    ap = obs.apertures(params)
    u, v = np.asarray(out.u), np.asarray(out.v)
    div = ((u * ap.au)[1:-1, 1:-1] - (u * ap.au)[:-2, 1:-1]) / params.dx \
        + ((v * ap.av)[1:-1, 1:-1] - (v * ap.av)[1:-1, :-2]) / params.dy
    w = masked._weights(params)
    scale = max(np.abs(u).max(), np.abs(v).max()) / params.dx
    assert np.abs(div * w.fluid).max() < 1e-6 * scale


def test_aperture_validation_and_gating():
    with pytest.raises(ValueError, match="obstacle_pressure"):
        Params(i_max=8, j_max=8, obstacle_pressure="cutcell")
    with pytest.raises(ValueError, match="aperture.*needs obstacle_surf"):
        Params(i_max=8, j_max=8, obstacles=((3, 4, 3, 4),),
               obstacle_pressure="aperture")
    # free surfaces refuse the static cut-cell closure
    from navierstokes_parallel_tpu.models import freesurface as fsm
    from navierstokes_parallel_tpu.grid import allocate_state
    params = Params(problem=1, i_max=16, j_max=16,
                    obstacles=((6, 8, 6, 8),),
                    obstacle_surfaces=(("box", 5 / 16, 8 / 16,
                                        5 / 16, 8 / 16),),
                    dtype="float64", T=0.01)
    pset = fsm.fill_region(params, 0.0, 0.3, 0.0, 0.5)
    fs = fsm.FreeSurfaceState(state=allocate_state(params), pset=pset)
    with pytest.raises(ValueError, match="staircase"):
        fsm.solve_free(params, fs)


def test_circle_apertures_match_analytic_chords():
    """Face fractions on a rasterized disk equal the analytic chord
    fractions of each face segment (bisection is exact for the monotone
    crossing)."""
    n = 40
    dx = dy = 1.0 / n
    cx, cy, r = 0.5, 0.5, 0.21
    from navierstokes_parallel_tpu.models import karman

    rects = karman.circle_rects(cx, cy, 2 * r, dx, dy, n, n)
    params = Params(problem=1, i_max=n, j_max=n, obstacles=rects,
                    obstacle_surfaces=(("circle", cx, cy, r),))
    ap = obs.apertures(params)
    fl = obs.masks(params).fluid

    def phi(x, y):
        return np.hypot(x - cx, y - cy) - r

    rng = np.random.default_rng(2)
    checked = 0
    for i in range(1, n):
        for j in range(1, n + 1):
            if not (fl[i, j] and fl[i + 1, j]):
                continue
            y0, y1 = (j - 1) * dy, j * dy
            f0, f1 = phi(i * dx, y0), phi(i * dx, y1)
            if (f0 < 0) == (f1 < 0):
                expected = 1.0 if f0 >= 0 else 0.0
            else:
                # exact crossing on the vertical segment
                yw = cy + np.sqrt(r * r - (i * dx - cx) ** 2) * \
                    (1 if f1 >= 0 else -1)
                frac = (y1 - yw) / dy if f1 >= 0 else (yw - y0) / dy
                expected = max(frac, obs.APERTURE_FLOOR)
                checked += 1
            np.testing.assert_allclose(ap.au[i, j], expected, atol=1e-9)
    assert checked >= 4   # the disk must actually cut some fluid faces
