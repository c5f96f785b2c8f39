"""Dam-break artifact: collapse sequence + surge-front history.

Runs the free-surface dam break (models/freesurface.py: liquid column
width 1, height 2 in a 5 x 3 box, g = 1), records particle frames, and
writes:

  artifacts/dam_break_front.csv   t, T* = t*sqrt(2g/w), front Z = x/w,
                                  height H = y/h, volume ratio
  artifacts/dam_break.png         6-panel collapse sequence + the front /
                                  residual-height histories (the curves
                                  Martin & Moyce 1952 photographed)

Usage: python scripts/dam_break_artifact.py [--n 32] [--T 2.5] [--out artifacts]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32, help="cells per unit length")
    ap.add_argument("--T", type=float, default=2.5)
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--wall", default="freeslip",
                    choices=["freeslip", "noslip"],
                    help="container wall BC (freeslip is the classic "
                         "dam-break setting; noslip pins a wall film)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from navierstokes_parallel_tpu.models import freesurface as FS

    width, height, g = 1.0, 2.0, 1.0
    params, fs = FS.dam_break(n=args.n, T=args.T, width=width, height=height)
    v0 = FS.fluid_volume(fs, params)
    print(f"grid {params.i_max}x{params.j_max}, "
          f"{int(np.sum(np.asarray(fs.pset.active)))} particles",
          file=sys.stderr)

    t0 = time.time()
    step_fn = FS.make_free_step_fn(params, args.wall)
    rows = [(0.0, 0.0, FS.front_position(fs) / width,
             FS.column_height(fs) / height, 1.0)]
    frames = [(0.0, np.asarray(fs.pset.x), np.asarray(fs.pset.y))]
    snap_at = np.linspace(0.0, args.T, 6)[1:]
    next_snap = 0
    while float(fs.state.t) < args.T:
        fs, diag = step_fn(fs)
        t = float(fs.state.t)
        rows.append((t, t * np.sqrt(2 * g / width),
                     FS.front_position(fs) / width,
                     FS.column_height(fs) / height,
                     FS.fluid_volume(fs, params) / v0))
        if not bool(diag.sor_converged):
            print(f"warning: pressure solve hit max_it at t={t:.3f}",
                  file=sys.stderr)
        if next_snap < len(snap_at) and t >= snap_at[next_snap]:
            frames.append((t, np.asarray(fs.pset.x), np.asarray(fs.pset.y)))
            next_snap += 1
    wall = time.time() - t0
    print(f"{len(rows) - 1} steps in {wall:.1f}s "
          f"({wall / (len(rows) - 1) * 1e3:.0f} ms/step)", file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    csv_path = os.path.join(args.out, "dam_break_front.csv")
    with open(csv_path, "w") as f:
        f.write("t,T_star,front_Z,height_H,volume_ratio\n")
        for r in rows:
            f.write(",".join(f"{x:.6f}" for x in r) + "\n")
    print(f"wrote {csv_path}", file=sys.stderr)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(11, 6.5))
    gs = fig.add_gridspec(3, 3, height_ratios=[1, 1, 1.15], hspace=0.35)
    for k, (t, x, y) in enumerate(frames):
        ax = fig.add_subplot(gs[k // 3, k % 3])
        ax.plot(x, y, ".", ms=0.8, color="#1f5fa8", rasterized=True)
        ax.set_xlim(0, params.a)
        ax.set_ylim(0, params.b)
        ax.set_aspect("equal")
        ax.set_title(f"$t={t:.2f}$", fontsize=9)
        ax.tick_params(labelsize=7)
    rows_a = np.asarray(rows)
    ax = fig.add_subplot(gs[2, :2])
    ax.plot(rows_a[:, 1], rows_a[:, 2], "-", color="#1f5fa8",
            label="front $Z=x/w$")
    ax.plot(rows_a[:, 1] * np.sqrt(0.5 * height / width), rows_a[:, 3],
            "-", color="#b0413e", label="column height $H=y/h$")
    ax.set_xlabel(r"$T^*=t\sqrt{2g/w}$ (height curve: $t\sqrt{2g/h}$)")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    ax2 = fig.add_subplot(gs[2, 2])
    ax2.plot(rows_a[:, 0], rows_a[:, 4], color="#555555")
    ax2.set_xlabel("$t$")
    ax2.set_title("volume ratio", fontsize=9)
    ax2.set_ylim(0.9, 1.1)
    ax2.grid(alpha=0.3)
    fig.suptitle(f"Dam break (free surface, MAC): {params.i_max}x"
                 f"{params.j_max}, Re={params.Re:g}, {args.wall} walls",
                 fontsize=11)
    png_path = os.path.join(args.out, "dam_break.png")
    fig.savefig(png_path, dpi=150, bbox_inches="tight")
    print(f"wrote {png_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
