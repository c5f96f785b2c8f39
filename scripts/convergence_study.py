"""Grid-convergence study: observed order of accuracy, self-anchored.

Solves the steady lid-driven cavity at a ladder of resolutions and
measures the centerline-profile error of each level against the FINEST
level (Richardson-style self-convergence — no external table is involved,
so the measured order is free of the transcription/roundoff questions a
Ghia comparison carries; the Ghia agreement itself is validated separately
by scripts/validate_ghia.py).

The donor-cell convective scheme (integration.c:7-71 upwinding with the
gamma blend, main.c:91-92) is formally between first and second order;
the study pins the OBSERVED order p = log2(err(h)/err(h/2)) per level and
asserts it stays in a sane band — a silent discretization regression
(wrong stencil weight, flipped upwind bias) shows up here as p collapsing
toward 0 even when single-step oracle tests still pass.

Writes artifacts/convergence_re<Re>.csv:  n, err_u, err_v, order_u, order_v.

Usage: python scripts/convergence_study.py [--re 100] [--sizes 32,64,128]
       [--ref-size 256] [--T 20] [--method mg] [--out artifacts/...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from _platform import apply_platform_override

apply_platform_override()
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def centerline_errors(state_a, params_a, state_b, params_b, n_samples=101):
    """Max |difference| of the two solutions' centerline profiles, sampled
    at common interior points (linear interpolation onto each profile)."""
    from navierstokes_parallel_tpu.models.cavity import centerline_profiles

    ya, ua, xa, va = centerline_profiles(state_a.u, state_a.v, params_a)
    yb, ub, xb, vb = centerline_profiles(state_b.u, state_b.v, params_b)
    ys = np.linspace(0.05, 0.95, n_samples)
    xs = np.linspace(0.05, 0.95, n_samples)
    err_u = np.max(np.abs(np.interp(ys, ya, ua) - np.interp(ys, yb, ub)))
    err_v = np.max(np.abs(np.interp(xs, xa, va) - np.interp(xs, xb, vb)))
    return float(err_u), float(err_v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", type=float, default=100.0)
    ap.add_argument("--sizes", default="32,64,128")
    ap.add_argument("--ref-size", type=int, default=256)
    ap.add_argument("--T", type=float, default=20.0,
                    help="integration horizon (steady state for the Re)")
    ap.add_argument("--method", default="mg")
    ap.add_argument("--out", default=None)
    ap.add_argument("--assert-order", type=float, nargs=2,
                    default=(0.7, 2.5), metavar=("LO", "HI"),
                    help="acceptance band for the observed order between "
                         "the two finest ladder levels")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu; consumed before "
                         "jax initializes)")
    args = ap.parse_args()

    from navierstokes_parallel_tpu.models.cavity import lid_driven_cavity
    from navierstokes_parallel_tpu.solver import solve

    sizes = [int(s) for s in args.sizes.split(",")]
    for a, b in zip(sizes, sizes[1:]):
        if b != 2 * a:
            raise SystemExit(f"sizes must double: {sizes}")
    if args.ref_size < 2 * sizes[-1]:
        raise SystemExit("--ref-size must be at least twice the finest size")

    def run(n):
        p = lid_driven_cavity(Re=args.re, n=n, T=args.T, dtype="float32")
        t0 = time.time()
        st, ss = solve(p, pressure_method=args.method)
        print(f"n={n}: {int(ss.steps)} steps, "
              f"{int(ss.sor_failures)} failures, {time.time() - t0:.1f}s",
              file=sys.stderr)
        if int(ss.sor_failures):
            raise SystemExit(f"pressure solver failed to converge at {n}^2")
        return st, p

    ref_state, ref_params = run(args.ref_size)
    rows = []
    for n in sizes:
        st, p = run(n)
        err_u, err_v = centerline_errors(st, p, ref_state, ref_params)
        rows.append([n, err_u, err_v])
    for i in range(1, len(rows)):
        rows[i].append(np.log2(rows[i - 1][1] / rows[i][1]))  # order_u
        rows[i].append(np.log2(rows[i - 1][2] / rows[i][2]))  # order_v
    rows[0] += [float("nan"), float("nan")]

    out = args.out or f"artifacts/convergence_re{int(args.re)}.csv"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write("n,err_u,err_v,order_u,order_v\n")
        for n, eu, ev, ou, ov in rows:
            fh.write(f"{n},{eu:.6e},{ev:.6e},{ou:.3f},{ov:.3f}\n")
            print(f"n={n:5d}  err_u={eu:.3e}  err_v={ev:.3e}  "
                  f"order_u={ou:.2f}  order_v={ov:.2f}")
    print(f"wrote {out}")

    lo, hi = args.assert_order
    ou, ov = rows[-1][3], rows[-1][4]
    assert lo <= ou <= hi and lo <= ov <= hi, (
        f"observed order ({ou:.2f}, {ov:.2f}) outside [{lo}, {hi}] — "
        "discretization regression?"
    )
    print(f"observed order at the finest pair: u {ou:.2f}, v {ov:.2f} "
          f"(asserted in [{lo}, {hi}])")


if __name__ == "__main__":
    main()
