"""Second-order ghost-fluid obstacle boundaries (ops/obstacles.py::
ib_weights / Params.obstacle_surfaces).

Validation strategy, no fitted constants:

* A box level set aligned exactly with the rasterized rectangle must
  reduce every weight to the mirror/zero constants — and the BC
  application to the bit-identical staircase path.
* A PLANE level set is linear along every grid line, so the ghost-fluid
  interpolation must reproduce u = phi (a linear profile vanishing on
  the true wall) EXACTLY at every BC-controlled edge whose geometry is
  clean — the defining property of a second-order boundary, which the
  mirror BC only has when the wall happens to bisect the segment.
* The Schäfer-Turek circle weights stay bounded and the coarse shedding
  run stays stable and converged.
"""

import numpy as np
import pytest

from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.ops import obstacles as obs


def _rects_from_mask(solid: np.ndarray):
    """Row-run rectangles (1-based inclusive) from an interior bool mask."""
    rects = []
    ni, nj = solid.shape
    for j in range(nj):
        i = 0
        while i < ni:
            if not solid[i, j]:
                i += 1
                continue
            k = i
            while k < ni and solid[k, j]:
                k += 1
            rects.append((i + 1, k, j + 1, j + 1))
            i = k
    return tuple(rects)


def test_box_surface_reduces_to_mirror():
    """Axis-aligned box level set exactly on the rasterized faces: every
    tangential weight is -1, every normal weight 0, and the BC pass is
    bit-identical to the staircase path.  Grid chosen so all face
    positions are exact binary fractions."""
    import jax.numpy as jnp

    n = 16  # dx = dy = 1/16
    rect = (5, 8, 6, 10)
    box = ("box", 4 / 16, 8 / 16, 5 / 16, 10 / 16)
    p_plain = Params(problem=1, i_max=n, j_max=n, obstacles=(rect,),
                     dtype="float64")
    p_sharp = p_plain.replace(obstacle_surfaces=(box,))

    w = obs.ib_weights(p_sharp)
    m = obs.masks(p_sharp)
    assert np.all(w.u_wn[m.u_refl_n] == -1.0)
    assert np.all(w.u_ws[m.u_refl_s] == -1.0)
    assert np.all(w.v_we[m.v_refl_e] == -1.0)
    assert np.all(w.v_ww[m.v_refl_w] == -1.0)
    assert np.all(w.u_we == 0.0) and np.all(w.u_ww == 0.0)
    assert np.all(w.v_wn == 0.0) and np.all(w.v_ws == 0.0)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(p_plain.shape))
    v = jnp.asarray(rng.standard_normal(p_plain.shape))
    u1, v1 = obs.apply_obstacle_bcs(u, v, p_plain)
    u2, v2 = obs.apply_obstacle_bcs(u, v, p_sharp)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_plane_linear_profile_exact():
    """u = phi (signed distance to a tilted plane wall) is linear along
    every grid line and vanishes on the wall, so the ghost-fluid BC must
    reproduce it exactly on every cleanly-interpolated edge — second-order
    consistency, checked to machine precision with NO fitted constants.
    The mirror BC fails this everywhere the wall doesn't bisect the
    segment (asserted too)."""
    import jax.numpy as jnp

    n = 24
    dx = dy = 1.0 / n
    # Tilted wall: solid below the line 0.31 x + y = 0.37 (irrational-ish
    # slope so no crossing lands exactly halfway).
    nx_, ny_, c = 0.31, 1.0, 0.37
    plane = ("plane", nx_, ny_, c)
    nrm = np.hypot(nx_, ny_)

    def phi(x, y):
        return (nx_ * x + ny_ * y - c) / nrm

    xi = (np.arange(1, n + 1) - 0.5) * dx
    yj = (np.arange(1, n + 1) - 0.5) * dy
    solid = phi(xi[:, None], yj[None, :]) < 0.0
    params = Params(problem=1, i_max=n, j_max=n,
                    obstacles=_rects_from_mask(solid),
                    obstacle_surfaces=(plane,), dtype="float64")

    iu, ju = np.meshgrid(np.arange(n + 2), np.arange(n + 2), indexing="ij")
    u_field = phi(iu * dx, (ju - 0.5) * dy)
    v_field = phi((iu - 0.5) * dx, ju * dy)

    u_out, v_out = obs.apply_obstacle_bcs(jnp.asarray(u_field),
                                          jnp.asarray(v_field), params)
    u_out, v_out = np.asarray(u_out), np.asarray(v_out)

    w = obs.ib_weights(params)
    m = obs.masks(params)
    checked = 0
    for mask, warr, out, ref, fallback in (
            (m.u_refl_n, w.u_wn, u_out, u_field, -1.0),
            (m.u_refl_s, w.u_ws, u_out, u_field, -1.0),
            (m.v_refl_e, w.v_we, v_out, v_field, -1.0),
            (m.v_refl_w, w.v_ww, v_out, v_field, -1.0),
            (np.abs(w.u_we) > 0, w.u_we, u_out, u_field, 0.0),
            (np.abs(w.u_ww) > 0, w.u_ww, u_out, u_field, 0.0),
            (np.abs(w.v_wn) > 0, w.v_wn, v_out, v_field, 0.0),
            (np.abs(w.v_ws) > 0, w.v_ws, v_out, v_field, 0.0),
    ):
        # Clean edges: interpolated (weight moved off the fallback) and
        # uncapped.  On a plane through a thick solid that is nearly all
        # of them.
        clean = mask & (np.abs(warr) < 3.0) & (warr != fallback)
        if not clean.any():
            continue
        np.testing.assert_allclose(out[clean], ref[clean], atol=1e-12)
        checked += int(clean.sum())
    assert checked > 20, f"only {checked} edges exercised the interpolation"

    # The mirror BC gets the same edges WRONG (first order): compare on
    # the tangential ghosts.
    p_mirror = params.replace(obstacle_surfaces=())
    u_mir, _ = obs.apply_obstacle_bcs(jnp.asarray(u_field),
                                      jnp.asarray(v_field), p_mirror)
    clean = m.u_refl_n & (np.abs(w.u_wn) < 3.0) & (w.u_wn != -1.0)
    err_mirror = np.abs(np.asarray(u_mir)[clean] - u_field[clean]).max()
    assert err_mirror > 1e-3, "mirror BC unexpectedly exact — test is vacuous"


def test_circle_weights_bounded_and_effective():
    """Schäfer-Turek circle at 10 cells/D: every weight capped to
    [-3, 3], tangential ghosts stay non-positive where interpolated from
    inside the solid, and the sharp BC field genuinely differs from the
    staircase one."""
    import jax.numpy as jnp

    from navierstokes_parallel_tpu.models import karman as K

    params = K.schafer_turek(n_per_d=10, T=1.0)
    assert params.obstacle_surfaces == (("circle", 2.0, 2.0, 0.5),)
    w = obs.ib_weights(params)
    for arr in w:
        assert np.all(np.abs(arr) <= 3.0)
    m = obs.masks(params)
    # Interpolated tangential weights on a convex solid: the wall lies
    # between ghost and fluid node or just outside the ghost — weight in
    # (-3, 1).
    assert np.all(w.u_wn[m.u_refl_n] < 1.0)

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(params.shape))
    v = jnp.asarray(rng.standard_normal(params.shape))
    u_sharp, v_sharp = obs.apply_obstacle_bcs(u, v, params)
    u_stair, v_stair = obs.apply_obstacle_bcs(
        u, v, params.replace(obstacle_surfaces=()))
    assert np.abs(np.asarray(u_sharp) - np.asarray(u_stair)).max() > 0.01
    assert np.abs(np.asarray(v_sharp) - np.asarray(v_stair)).max() > 0.01


def test_sharp_cylinder_steps_stable():
    """12 time steps of the sharp-boundary Schäfer-Turek cylinder at
    10 cells/D: finite fields, converged pressure solves (the
    interpolated normal-velocity BC puts a small constant mode in the
    Poisson RHS — the problem-3 mean deflation must absorb it; the
    impulsive start makes the constant mode largest on the FIRST steps,
    so a short run exercises the worst case)."""
    from navierstokes_parallel_tpu import solver
    from navierstokes_parallel_tpu.models import karman as K

    params = K.schafer_turek(n_per_d=10, T=1.0)
    state = K.initial_state(params)
    for _ in range(12):
        state, diag = solver.step(state, params, pressure_method="mg")
        assert bool(diag.sor_converged)
    assert np.isfinite(np.asarray(state.u)).all()
    assert np.isfinite(np.asarray(state.p)).all()


def test_surface_validation():
    with pytest.raises(ValueError, match="requires obstacles"):
        Params(i_max=8, j_max=8, obstacle_surfaces=(("circle", 1, 1, 0.2),))
    with pytest.raises(ValueError, match="unknown obstacle surface"):
        Params(i_max=8, j_max=8, obstacles=((3, 4, 3, 4),),
               obstacle_surfaces=(("blob", 1.0),))
    with pytest.raises(ValueError, match="radius"):
        Params(i_max=8, j_max=8, obstacles=((3, 4, 3, 4),),
               obstacle_surfaces=(("circle", 1, 1, -0.2),))
    with pytest.raises(ValueError, match="arity"):
        Params(i_max=8, j_max=8, obstacles=((3, 4, 3, 4),),
               obstacle_surfaces=(("box", 1, 2, 3),))
