"""Stencil unit tests.

Two mechanisms, following the reference's test strategy (SURVEY.md §4):
1. Pointwise referee: each vectorized stencil must equal a direct scalar
   evaluation of the same formula at every interior point (exact).
2. Analytic fields: on u = sin(x), v = cos(y) (the fields of reference
   tests/stencils.c:11-76) the stencils must converge to the closed-form
   derivatives (tests/derivatives.py:27-30) at the expected order.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from navierstokes_parallel_tpu.ops import stencils as st


def _rand_fields(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n + 2, n + 2))
    v = rng.standard_normal((n + 2, n + 2))
    return u, v


def _pointwise_du2_dx(u, v, i, j, dx, gamma):
    s1 = 0.5 * (u[i, j] + u[i + 1, j])
    s2 = 0.5 * (u[i - 1, j] + u[i, j])
    s3 = abs(s1) * 0.5 * (u[i, j] - u[i + 1, j])
    s4 = abs(s2) * 0.5 * (u[i - 1, j] - u[i, j])
    return (s1 * s1 - s2 * s2) / dx + gamma / dx * (s3 - s4)


def _pointwise_duv_dy(u, v, i, j, dy, gamma):
    s1 = 0.5 * (v[i, j] + v[i + 1, j])
    s2 = 0.5 * (v[i, j - 1] + v[i + 1, j - 1])
    s3 = s1 * 0.5 * (u[i, j] + u[i, j + 1])
    s4 = s2 * 0.5 * (u[i, j - 1] + u[i, j])
    s5 = abs(s1) * 0.5 * (u[i, j] - u[i, j + 1])
    s6 = abs(s2) * 0.5 * (u[i, j - 1] - u[i, j])
    return (s3 - s4) / dy + gamma / dy * (s5 - s6)


def _pointwise_dv2_dy(u, v, i, j, dy, gamma):
    s1 = 0.5 * (v[i, j] + v[i, j + 1])
    s2 = 0.5 * (v[i, j - 1] + v[i, j])
    s3 = abs(s1) * 0.5 * (v[i, j] - v[i, j + 1])
    s4 = abs(s2) * 0.5 * (v[i, j - 1] - v[i, j])
    return (s1 * s1 - s2 * s2) / dy + gamma / dy * (s3 - s4)


def _pointwise_duv_dx(u, v, i, j, dx, gamma):
    s1 = 0.5 * (u[i, j] + u[i, j + 1])
    s2 = 0.5 * (u[i - 1, j] + u[i - 1, j + 1])
    s3 = s1 * 0.5 * (v[i, j] + v[i + 1, j])
    s4 = s2 * 0.5 * (v[i - 1, j] + v[i, j])
    s5 = abs(s1) * 0.5 * (v[i, j] - v[i + 1, j])
    s6 = abs(s2) * 0.5 * (v[i - 1, j] - v[i, j])
    return (s3 - s4) / dx + gamma / dx * (s5 - s6)


@pytest.mark.parametrize(
    "vec_fn,point_fn,uses_dy",
    [
        (st.du2_dx, _pointwise_du2_dx, False),
        (st.duv_dy, _pointwise_duv_dy, True),
        (st.dv2_dy, _pointwise_dv2_dy, True),
        (st.duv_dx, _pointwise_duv_dx, False),
    ],
)
def test_convective_stencils_pointwise(vec_fn, point_fn, uses_dy):
    n = 12
    dx, gamma = 0.1, 0.7
    u, v = _rand_fields(n)
    got = np.asarray(vec_fn(jnp.asarray(u), jnp.asarray(v), dx, gamma))
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            want = point_fn(u, v, i, j, dx, gamma)
            np.testing.assert_allclose(got[i - 1, j - 1], want, rtol=1e-12)


def test_second_derivatives_pointwise():
    n = 12
    dx = 0.07
    u, _ = _rand_fields(n)
    got = np.asarray(st.d2_dx2(jnp.asarray(u), dx))
    want = (u[2:, 1:-1] - 2 * u[1:-1, 1:-1] + u[:-2, 1:-1]) / dx**2
    np.testing.assert_allclose(got, want, rtol=1e-12)
    got = np.asarray(st.d2_dy2(jnp.asarray(u), dx))
    want = (u[1:-1, 2:] - 2 * u[1:-1, 1:-1] + u[1:-1, :-2]) / dx**2
    np.testing.assert_allclose(got, want, rtol=1e-12)


def _analytic_grid(n):
    """u = sin(x), v = cos(y) sampled at u/v staggered node positions on
    [0,1]^2 with i_max=j_max=n (the reference's test fields)."""
    dx = dy = 1.0 / n
    i = np.arange(n + 2)[:, None]
    j = np.arange(n + 2)[None, :]
    # u[i,j] lives at (x_i, y_j - dy/2) = (i*dx, (j-0.5)*dy)
    xu, yu = i * dx, (j - 0.5) * dy
    # v[i,j] lives at ((i-0.5)*dx, j*dy)
    xv, yv = (i - 0.5) * dx, j * dy
    u = np.sin(xu) + 0.0 * yu
    v = np.cos(yv) + 0.0 * xv
    xu = np.broadcast_to(xu, u.shape)
    yu = np.broadcast_to(yu, u.shape)
    xv = np.broadcast_to(xv, v.shape)
    yv = np.broadcast_to(yv, v.shape)
    return u, v, dx, dy, xu, yu, xv, yv


@pytest.mark.parametrize("n", [64, 128])
def test_analytic_convergence(n):
    """du^2/dx = 2 sin(x) cos(x) for u=sin(x) (tests/derivatives.py:27-30);
    truncation error must be O(dx^2) for the central part (gamma=0)."""
    u, v, dx, dy, xu, yu, _, _ = _analytic_grid(n)
    got = np.asarray(st.du2_dx(jnp.asarray(u), jnp.asarray(v), dx, 0.0))
    x_int = xu[1:-1, 1:-1]
    want = 2.0 * np.sin(x_int) * np.cos(x_int)
    err = np.max(np.abs(got - want))
    assert err < 5.0 / n**2, f"error {err} too large for n={n}"

    # d2u/dx2 of sin(x) = -sin(x)
    got2 = np.asarray(st.d2_dx2(jnp.asarray(u), dx))
    want2 = -np.sin(x_int)
    err2 = np.max(np.abs(got2 - want2))
    assert err2 < 5.0 / n**2


def test_pressure_gradients():
    n = 10
    dx = 0.1
    rng = np.random.default_rng(1)
    p = rng.standard_normal((n + 2, n + 2))
    got = np.asarray(st.dp_dx(jnp.asarray(p), dx))
    np.testing.assert_allclose(got, (p[2:, 1:-1] - p[1:-1, 1:-1]) / dx, rtol=1e-12)
    got = np.asarray(st.dp_dy(jnp.asarray(p), dx))
    np.testing.assert_allclose(got, (p[1:-1, 2:] - p[1:-1, 1:-1]) / dx, rtol=1e-12)


def test_l2_and_max():
    rng = np.random.default_rng(2)
    m = rng.standard_normal((10, 12))
    got = float(st.l2_norm(jnp.asarray(m), 10, 12))
    np.testing.assert_allclose(got, np.sqrt(np.sum(m**2) / 120), rtol=1e-12)

    x = rng.standard_normal((12, 14))
    got = float(st.max_interior(jnp.asarray(x)))
    want = max(x[0, 0], x[1:-1, 1:-1].max())
    assert got == pytest.approx(want)
