"""Taylor-Green vortex artifact: space-time convergence against the
exact Navier-Stokes solution (models/taylorgreen.py, problem 4).

Runs the free-slip-box Taylor-Green decay over a grid ladder and writes:

  artifacts/taylorgreen_convergence.csv   n, steps, u/v/p max-abs error
                                          vs exact, KE rel. error, wall s
  artifacts/taylorgreen_convergence.png   log-log error vs n with the
                                          2nd-order slope line + the
                                          KE(t) decay vs exp(-4k^2 t/Re)

Usage: python scripts/taylorgreen_artifact.py [--grids 16,32,64,128,256]
       [--Re 50] [--T 0.3] [--method auto] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", default="16,32,64,128,256")
    ap.add_argument("--Re", type=float, default=50.0)
    ap.add_argument("--T", type=float, default=0.3)
    ap.add_argument("--method", default="mg")
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from navierstokes_parallel_tpu import solver
    from navierstokes_parallel_tpu.models import taylorgreen as TG

    ns = [int(s) for s in args.grids.split(",")]
    os.makedirs(args.out, exist_ok=True)
    rows = []
    for n in ns:
        params, state = TG.taylor_green(n=n, Re=args.Re, T=args.T)
        t0 = time.perf_counter()
        final, stats = solver.solve(params, state,
                                    pressure_method=args.method)
        wall = time.perf_counter() - t0
        err = TG.errors(final, params)
        ke = TG.kinetic_energy(final, params)
        ke_ex = TG.exact_energy(params, float(final.t))
        rows.append((n, int(stats.steps), err["u"], err["v"], err["p"],
                     abs(ke - ke_ex) / ke_ex, wall))
        print(f"n={n}: steps={int(stats.steps)} "
              f"fails={int(stats.sor_failures)} u_err={err['u']:.3e} "
              f"p_err={err['p']:.3e} ke_rel={rows[-1][5]:.2e} "
              f"wall={wall:.1f}s", flush=True)

    csv = os.path.join(args.out, "taylorgreen_convergence.csv")
    with open(csv, "w") as f:
        f.write("n,steps,u_err,v_err,p_err,ke_rel_err,wall_seconds\n")
        for r in rows:
            f.write(f"{r[0]},{r[1]},{r[2]:.4e},{r[3]:.4e},{r[4]:.4e},"
                    f"{r[5]:.4e},{r[6]:.1f}\n")
    print(f"wrote {csv}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    nv = np.array([r[0] for r in rows], float)
    ue = np.array([r[2] for r in rows])
    pe = np.array([r[4] for r in rows])
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.8))
    ax1.loglog(nv, ue, "o-", label="max |u - exact|")
    ax1.loglog(nv, pe, "s-", label="max |p - exact|")
    ax1.loglog(nv, ue[0] * (nv[0] / nv) ** 2, "k--", lw=1,
               label="2nd order")
    ax1.set_xlabel("n (cells per side)")
    ax1.set_ylabel("error at t = %.2f" % args.T)
    ax1.set_title(f"Taylor-Green convergence (Re={args.Re:g})")
    ax1.legend()
    # KE decay trace on the finest grid.
    params, state = TG.taylor_green(n=ns[-1], Re=args.Re, T=args.T)
    fn = solver.make_step_fn(params, args.method)
    ts, kes = [0.0], [TG.kinetic_energy(state, params)]
    while float(state.t) < params.T:
        state, _ = fn(state)
        ts.append(float(state.t))
        kes.append(TG.kinetic_energy(state, params))
    tt = np.linspace(0, ts[-1], 200)
    ax2.plot(ts, kes, ".", ms=3, label=f"solver ({ns[-1]}²)")
    ax2.plot(tt, [TG.exact_energy(params, t) for t in tt], "k-",
             lw=1, label="exact exp(-4k²t/Re)")
    ax2.set_xlabel("t")
    ax2.set_ylabel("kinetic energy")
    ax2.set_title("energy decay")
    ax2.legend()
    fig.tight_layout()
    png = os.path.join(args.out, "taylorgreen_convergence.png")
    fig.savefig(png, dpi=150)
    print(f"wrote {png}")


if __name__ == "__main__":
    main()
