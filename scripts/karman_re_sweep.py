"""Strouhal-vs-Reynolds curve for the confined square cylinder.

Sweeps Re_D for the Breuer-geometry square cylinder (models/karman.py,
blockage 1/8, parabolic inflow), measuring the saturated-cycle Strouhal
number and oscillation amplitude at each Re, and writes:

  artifacts/karman_st_re.csv    Re_D, St, amplitude, steps, wall seconds
  artifacts/karman_st_re.png    St(Re) and amplitude(Re)

Physics checks the curve encodes (Breuer et al. 2000, fig. 8 shape):
no shedding below the onset (Re ~ 50: St = 0, amplitude ~ 0), then St
rises steeply, peaks around Re ~ 150-200, and declines toward Re = 300 —
the non-monotonicity is the qualitative benchmark feature (exact values
depend on blockage, inflow normalization, and resolution; see
models/karman.py for the quantitatively-pinned circular-cylinder case).

Usage: python scripts/karman_re_sweep.py [--re 30,60,100,150,200,250,300]
       [--n 16] [--T 120] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", default="30,60,100,150,200,250,300")
    ap.add_argument("--n", type=int, default=16, help="cells per diameter")
    ap.add_argument("--T", type=float, default=120.0)
    ap.add_argument("--method", default="mg", choices=["mg", "rb_sor"])
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from navierstokes_parallel_tpu.models import karman as K

    res = [float(s) for s in args.re.split(",")]
    os.makedirs(args.out, exist_ok=True)
    rows = []
    for Re_D in res:
        params = K.square_cylinder(n_per_d=args.n, Re_D=Re_D, T=args.T)
        t0 = time.perf_counter()
        trace = K.shedding_signal(params, method=args.method,
                                  chunk=args.chunk)
        wall = time.perf_counter() - t0
        st, amp = K.strouhal(trace.t, trace.v, skip_frac=0.6)
        rows.append((Re_D, st, amp, trace.stats.steps, wall))
        print(f"Re_D={Re_D:g}: St={st:.4f} amp={amp:.4f} "
              f"steps={trace.stats.steps} fails={trace.stats.sor_failures} "
              f"wall={wall:.0f}s", flush=True)

    csv = os.path.join(args.out, "karman_st_re.csv")
    with open(csv, "w") as f:
        f.write("re_d,strouhal,amplitude,steps,wall_seconds\n")
        for r in rows:
            f.write(f"{r[0]:g},{r[1]:.4f},{r[2]:.4f},{r[3]},{r[4]:.1f}\n")
    print(f"wrote {csv}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    re_v = np.array([r[0] for r in rows])
    st_v = np.array([r[1] for r in rows])
    amp_v = np.array([r[2] for r in rows])
    # Below onset the "frequency" is the decaying ring-down of the
    # initial kick, not shedding — keep it out of the St panel (the
    # amplitude panel shows the dead wake).
    shedding = amp_v >= 0.01
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.6))
    ax1.plot(re_v[shedding], st_v[shedding], "o-")
    ax1.set_xlabel("Re_D")
    ax1.set_ylabel("St = f D / u_mean")
    ax1.set_title(f"Square cylinder (B=1/8), {args.n} cells/D")
    ax2.plot(re_v, amp_v, "s-")
    ax2.set_xlabel("Re_D")
    ax2.set_ylabel("wake v amplitude")
    ax2.set_title("shedding onset / saturation")
    fig.tight_layout()
    png = os.path.join(args.out, "karman_st_re.png")
    fig.savefig(png, dpi=150)
    print(f"wrote {png}")


if __name__ == "__main__":
    main()
