"""Marker-particle tracing tests (particles.py).

The capability restores the serial lineage's sect.-3.4 particle tracing
(pathlines/streaklines) that the reference repo dropped; these tests pin
the staggered interpolation math, the integrator orders, the
deactivation/injection bookkeeping, and the on-device/host-loop parity.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from navierstokes_parallel_tpu import particles as P
from navierstokes_parallel_tpu.config import Params
from navierstokes_parallel_tpu.grid import allocate_state


def _params(**kw):
    base = dict(problem=1, i_max=16, j_max=16, a=1.0, b=1.0, T=0.05,
                Re=100.0, tau=0.5, omega=1.7, epsilon=1e-4, max_it=500,
                dtype="float64")
    base.update(kw)
    return Params(**base)


def _staggered_linear_fields(params, au=(0.3, -0.7, 0.11), av=(0.9, 0.4, -0.2)):
    """u/v arrays whose node values are a linear function of the node's
    PHYSICAL staggered position — bilinear interpolation must reproduce the
    linear function exactly, so any staggering-offset bug shows up as a
    systematic half-cell error."""
    dx, dy = params.dx, params.dy
    sh = (params.i_max + 2, params.j_max + 2)
    ii, jj = np.meshgrid(np.arange(sh[0]), np.arange(sh[1]), indexing="ij")
    ux = ii * dx          # u node x = i*dx
    uy = (jj - 0.5) * dy  # u node y = (j-1/2)*dy
    vx = (ii - 0.5) * dx
    vy = jj * dy
    u = au[0] * ux + au[1] * uy + au[2]
    v = av[0] * vx + av[1] * vy + av[2]
    return jnp.asarray(u), jnp.asarray(v), (au, av)


def test_interp_exact_on_linear_field():
    params = _params()
    u, v, (au, av) = _staggered_linear_fields(params)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.05, 0.95, 64)
    y = rng.uniform(0.05, 0.95, 64)
    up, vp = P.interp_uv(jnp.asarray(x), jnp.asarray(y), u, v, params)
    np.testing.assert_allclose(np.asarray(up),
                               au[0] * x + au[1] * y + au[2],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vp),
                               av[0] * x + av[1] * y + av[2],
                               rtol=0, atol=1e-12)


def test_interp_wall_uses_ghost_reflection():
    """Within half a cell of a no-slip wall, interpolation must see the
    WALL velocity (zero), because the ghost layer holds the reflection —
    pin it with a field that is +1 in the interior and -1 in the ghosts
    (the reflection of a unit tangential slip): at the wall itself the
    interpolated tangential velocity is 0."""
    params = _params()
    sh = (params.i_max + 2, params.j_max + 2)
    u = np.ones(sh)
    u[:, 0] = -1.0          # ghost below y=0 (reflection across bottom wall)
    u[:, params.j_max + 1] = -1.0
    v = np.zeros(sh)
    x = jnp.asarray([0.5])
    up_wall, _ = P.interp_uv(x, jnp.asarray([0.0]), jnp.asarray(u),
                             jnp.asarray(v), params)
    up_mid, _ = P.interp_uv(x, jnp.asarray([0.5]), jnp.asarray(u),
                            jnp.asarray(v), params)
    assert abs(float(up_wall[0])) < 1e-12
    assert abs(float(up_mid[0]) - 1.0) < 1e-12


def test_advect_uniform_flow_exact():
    params = _params()
    sh = (params.i_max + 2, params.j_max + 2)
    u = jnp.full(sh, 0.25)
    v = jnp.full(sh, -0.125)
    pset = P.init_particles([[0.3, 0.6], [0.5, 0.5]], dtype=jnp.float64)
    for method in ("euler", "heun"):
        out = P.advect(pset, u, v, 0.1, params, method=method)
        np.testing.assert_allclose(np.asarray(out.x),
                                   np.asarray(pset.x) + 0.025, atol=1e-14)
        np.testing.assert_allclose(np.asarray(out.y),
                                   np.asarray(pset.y) - 0.0125, atol=1e-14)
        assert np.all(np.asarray(out.active))


def test_heun_second_order_on_rotation():
    """Solid-body rotation about the domain center is linear in position, so
    staggered sampling + bilinear interpolation are EXACT and the measured
    radius drift is pure time-integration error: Euler is O(dt) globally,
    Heun O(dt^2).  Check both the Euler/Heun gap and Heun's convergence
    order between two step sizes."""
    params = _params(i_max=32, j_max=32)
    dx, dy = params.dx, params.dy
    sh = (params.i_max + 2, params.j_max + 2)
    ii, jj = np.meshgrid(np.arange(sh[0]), np.arange(sh[1]), indexing="ij")
    c = 0.5
    u = -(((jj - 0.5) * dy) - c)   # u = -(y - c)
    v = ((ii - 0.5) * dx) - c      # v = +(x - c)
    u, v = jnp.asarray(u), jnp.asarray(v)
    r0 = 0.25

    def drift(method, dt, steps):
        pset = P.init_particles([[c + r0, c]], dtype=jnp.float64)
        for _ in range(steps):
            pset = P.advect(pset, u, v, dt, params, method=method)
        r = np.hypot(float(pset.x[0]) - c, float(pset.y[0]) - c)
        return abs(r - r0)

    d_euler = drift("euler", 0.02, 100)
    d_heun = drift("heun", 0.02, 100)
    assert d_heun < d_euler / 50
    # Radius is special for RK2 on rotation: the per-step amplification is
    # |1 + i*dt + (i*dt)^2/2| = sqrt(1 + dt^4/4), so the drift per step is
    # O(dt^4) and the total (N ~ 1/dt) scales as dt^3 — halving dt cuts the
    # radius drift 8x (the generic O(dt^2) global error lives in the phase).
    d_heun2 = drift("heun", 0.01, 200)
    assert 6.0 < d_heun / d_heun2 < 10.0


def test_out_of_domain_deactivates_and_freezes():
    params = _params()
    sh = (params.i_max + 2, params.j_max + 2)
    u = jnp.full(sh, 1.0)   # pushes everything right
    v = jnp.zeros(sh)
    pset = P.init_particles([[0.98, 0.5], [0.2, 0.5]], dtype=jnp.float64)
    out = P.advect(pset, u, v, 0.1, params, method="euler")
    assert not bool(out.active[0])          # stepped past x = 1
    assert bool(out.active[1])
    assert float(out.x[0]) == 0.98          # frozen at pre-step position
    assert abs(float(out.x[1]) - 0.3) < 1e-14
    # Frozen particles stay frozen under further advection.
    out2 = P.advect(out, u, v, 0.1, params, method="euler")
    assert float(out2.x[0]) == 0.98 and not bool(out2.active[0])


def test_obstacle_cell_deactivates():
    params = _params(obstacles=((8, 10, 1, 16),))  # wall-mounted block
    sh = (params.i_max + 2, params.j_max + 2)
    u = jnp.full(sh, 1.0)
    v = jnp.zeros(sh)
    # Just left of the block (cells i=8..10 span x in [(8-1)dx, 10dx]).
    x0 = (8 - 1) * params.dx - 0.01
    pset = P.init_particles([[x0, 0.5]], dtype=jnp.float64)
    out = P.advect(pset, u, v, 0.05, params, method="euler")
    assert not bool(out.active[0])
    assert float(out.x[0]) == pytest.approx(x0)


def test_inject_ring_buffer_wraps():
    pset = P.init_particles(np.zeros((0, 2)), capacity=4, dtype=jnp.float64)
    pts = np.array([[0.1, 0.2], [0.3, 0.4]])
    cur = jnp.zeros((), jnp.int32)
    for k in range(3):   # 6 injections into capacity 4 -> wraps
        pset, cur = P.inject(pset, pts + 0.1 * k, cur)
    assert int(cur) == 6
    # Slots 0,1 hold the THIRD batch (wrapped), slots 2,3 the second.
    np.testing.assert_allclose(np.asarray(pset.x), [0.3, 0.5, 0.2, 0.4],
                               atol=1e-12)
    assert np.all(np.asarray(pset.active))


def test_device_and_host_loops_agree_exactly():
    params = _params(T=0.04, i_max=12, j_max=12)
    seeds = P.grid_of_particles(params, 3, 3, capacity=12)
    st_d, stats_d, out_d = P.solve_with_particles(
        params, seeds, inject_points=[[0.5, 0.9]], inject_every=2)
    st_h, stats_h, out_h, hist = P.trace_particles(
        params, seeds, inject_points=[[0.5, 0.9]], inject_every=2)
    assert int(stats_d.steps) == int(stats_h.steps)
    np.testing.assert_array_equal(np.asarray(out_d.x), np.asarray(out_h.x))
    np.testing.assert_array_equal(np.asarray(out_d.y), np.asarray(out_h.y))
    np.testing.assert_array_equal(np.asarray(out_d.active),
                                  np.asarray(out_h.active))
    assert hist.shape == (int(stats_h.steps) + 1, 12, 3)
    # Flow state itself matches the plain solver's trajectory bit-for-bit.
    from navierstokes_parallel_tpu import solver
    st_ref, _ = solver.solve(params)
    np.testing.assert_array_equal(np.asarray(st_d.u), np.asarray(st_ref.u))


def test_cavity_particles_circulate_and_stay_inside():
    params = _params(T=0.3, i_max=24, j_max=24, epsilon=1e-3)
    # Seed lattice plus one tracer just under the lid (inside the viscous
    # layer, depth ~ sqrt(T/Re) ~ 0.05 at this T).
    lattice = P.grid_of_particles(params, 4, 4)
    pts = np.concatenate([np.stack([np.asarray(lattice.x),
                                    np.asarray(lattice.y)], -1),
                          [[0.5, 0.97]]])
    seeds = P.init_particles(pts, dtype=jnp.float64)
    _, _, out = P.solve_with_particles(params, seeds)
    x, y = np.asarray(out.x), np.asarray(out.y)
    assert np.all(np.asarray(out.active))   # lid-driven cavity: none escape
    assert np.all((x > 0) & (x < 1) & (y > 0) & (y < 1))
    # The lid drags the near-lid tracer in +x by a finite distance.
    assert x[-1] > 0.55


def test_plot_particle_paths(tmp_path):
    pytest.importorskip("matplotlib")
    from navierstokes_parallel_tpu.utils import plotting
    params = _params(T=0.03, i_max=12, j_max=12)
    seeds = P.grid_of_particles(params, 2, 2)
    *_, hist = P.trace_particles(params, seeds)
    p1 = plotting.plot_particle_paths(hist, params,
                                      str(tmp_path / "paths.png"))
    p2 = plotting.plot_particle_paths(hist, params,
                                      str(tmp_path / "pts.png"),
                                      mode="points")
    import os
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


def test_validation_errors():
    pset = P.init_particles([[0.5, 0.5]])
    params = _params()
    u = jnp.zeros(params.shape)
    with pytest.raises(ValueError, match="integrator"):
        P.advect(pset, u, u, 0.1, params, method="rk9")
    with pytest.raises(ValueError, match="capacity"):
        P.init_particles([[0.1, 0.1], [0.2, 0.2]], capacity=1)
    with pytest.raises(ValueError, match="inject_every"):
        P.solve_with_particles(params, pset, inject_points=[[0.5, 0.5]],
                               inject_every=0)
