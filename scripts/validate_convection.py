"""de Vahl Davis natural-convection benchmark validation.

Runs the differentially heated cavity (models/convection.py) to steady
state at the requested Rayleigh numbers and compares the mean hot-wall
Nusselt number against de Vahl Davis (1983): 1.118 / 2.243 / 4.519 /
8.800 for Ra = 1e3..1e6.  Also reports the hot/cold wall balance (exact
at steady state — an internal energy-conservation check) and writes
artifacts/convection_nusselt.csv.

Usage:
  python scripts/validate_convection.py --ra 1e3 1e4 --n 64 [--platform cpu]
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ra", nargs="+", type=float, default=[1e3, 1e4])
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--method", default="fft",
                    choices=["fft", "mg", "rb_sor", "cg"])
    ap.add_argument("--steady-tol", type=float, default=1e-6)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--tol", type=float, default=0.05,
                    help="asserted relative Nu tolerance")
    ap.add_argument("--out", default="artifacts/convection_nusselt.csv")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    from navierstokes_parallel_tpu.models import convection as cv

    rows = []
    ok = True
    for ra in args.ra:
        t0 = time.time()
        params, cfg = cv.convection_setup(ra, n=args.n)
        state, info = cv.solve_convection(params, cfg,
                                          pressure_method=args.method,
                                          steady_tol=args.steady_tol)
        nu_h = cv.nusselt_hot_wall(state.T, params)
        nu_c = cv.nusselt_cold_wall(state.T, params)
        ref = cv.DE_VAHL_DAVIS_NU.get(ra)
        rel = abs(nu_h - ref) / ref if ref else float("nan")
        wall = time.time() - t0
        print(f"Ra={ra:g} n={args.n}: Nu_hot={nu_h:.4f} Nu_cold={nu_c:.4f} "
              f"ref={ref} rel_err={rel:.4f} steps={info['steps']} "
              f"sor_failures={info['sor_failures']} "
              f"steady={info['steady']} [{wall:.0f}s]")
        rows.append([ra, args.n, args.method, nu_h, nu_c, ref, rel,
                     info["steps"], wall])
        if ref and rel > args.tol:
            print(f"  FAIL: rel err {rel:.4f} > tol {args.tol}",
                  file=sys.stderr)
            ok = False
        if abs(nu_h - nu_c) > 0.02 * max(abs(nu_h), 1.0):
            print(f"  FAIL: wall imbalance {nu_h:.4f} vs {nu_c:.4f}",
                  file=sys.stderr)
            ok = False

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["Ra", "n", "method", "nu_hot", "nu_cold",
                    "nu_devahl_davis", "rel_err", "steps", "wall_s"])
        w.writerows(rows)
    print(f"wrote {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
