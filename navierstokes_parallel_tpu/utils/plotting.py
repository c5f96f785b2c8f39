"""Post-processing / validation plots — ports of the reference's L6 tooling
(src/plot_ghia.py, src/plot_field.py, src/plot_pressure.py), reading either
live State arrays or the text-format output frames.

matplotlib is imported lazily so the solver has no plotting dependency.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional

import numpy as np

from ..config import Params
from ..models import cavity
from . import io as nsio


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_ghia(u, v, params: Params, Re: int, out_prefix: str = "ghia"):
    """Centerline u/v profiles vs the Ghia et al. 1982 tables
    (reference plot_ghia.py:48-66).  Writes <out_prefix>_{u,v}.png."""
    plt = _mpl()
    y, u_prof, x, v_prof = cavity.centerline_profiles(u, v, params)

    plt.figure(figsize=(5, 4))
    plt.grid(linestyle="dashed", color="gray")
    plt.plot(y, u_prof, color="red", label="Solution")
    plt.plot(cavity.GHIA_Y, cavity.GHIA_U[Re], "x", color="black",
             label="Ghia et al.")
    plt.xlim(0.0, 1.0)
    plt.xlabel("$y$")
    plt.ylabel("$u$")
    plt.legend()
    plt.tight_layout()
    plt.savefig(f"{out_prefix}_u.png", dpi=150)
    plt.close()

    plt.figure(figsize=(5, 4))
    plt.grid(linestyle="dashed", color="gray")
    plt.plot(x, v_prof, color="red", label="Solution")
    plt.plot(cavity.GHIA_X, cavity.GHIA_V[Re], "x", color="black",
             label="Ghia et al.")
    plt.xlim(0.0, 1.0)
    plt.xlabel("$x$")
    plt.ylabel("$v$")
    plt.legend()
    plt.tight_layout()
    plt.savefig(f"{out_prefix}_v.png", dpi=150)
    plt.close()
    return f"{out_prefix}_u.png", f"{out_prefix}_v.png"


def plot_channel(u, params: Params, out_path: str = "channel_profile.png",
                 stations=(0.25, 0.5, 0.9)):
    """u(y) at several x-stations vs the exact Poiseuille parabola
    (problem 3, models/channel.py).  Writes one overlay figure."""
    from ..models import channel

    plt = _mpl()
    u = np.asarray(u)
    y = (np.arange(1, params.j_max + 1) - 0.5) * params.dy
    exact = channel.analytic_u(params)

    plt.figure(figsize=(5, 4))
    plt.grid(linestyle="dashed", color="gray")
    for frac in stations:
        i = max(1, min(params.i_max - 1, int(round(frac * params.i_max))))
        plt.plot(y, u[i, 1:-1], label=f"$x = {i * params.dx:.2f}$")
    plt.plot(y, exact, "x", color="black", label="Poiseuille (exact)")
    plt.xlim(0.0, params.b)
    plt.xlabel("$y$")
    plt.ylabel("$u$")
    plt.legend()
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close()
    return out_path


def plot_obstacle_flow(u, v, params: Params,
                       out_path: str = "obstacle_flow.png"):
    """Streamline plot for flag-field domains (models/step.py): velocities
    at cell centers, solid cells shaded, streamlines masked to fluid."""
    from ..ops import obstacles as obs

    plt = _mpl()
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    fl = obs.fluid_mask(params)[1:-1, 1:-1]
    # edge -> cell-center averages on the interior
    uc = 0.5 * (u[1:-1, 1:-1] + u[0:-2, 1:-1])
    vc = 0.5 * (v[1:-1, 1:-1] + v[1:-1, 0:-2])
    uc = np.where(fl, uc, np.nan)   # streamplot skips NaN cells
    vc = np.where(fl, vc, np.nan)
    x = (np.arange(params.i_max) + 0.5) * params.dx
    y = (np.arange(params.j_max) + 0.5) * params.dy

    plt.figure(figsize=(7, 7 * params.b / params.a))
    plt.pcolormesh(x, y, np.where(fl, 0.0, 1.0).T, cmap="Greys",
                   vmin=0.0, vmax=1.4, shading="nearest")
    speed = np.sqrt(np.nan_to_num(uc) ** 2 + np.nan_to_num(vc) ** 2)
    plt.streamplot(x, y, uc.T, vc.T, density=1.4, linewidth=0.7,
                   color=speed.T, cmap="viridis")
    plt.xlim(0, params.a)
    plt.ylim(0, params.b)
    plt.gca().set_aspect("equal")
    plt.xlabel("$x$")
    plt.ylabel("$y$")
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close()
    return out_path


def plot_streamlines(u, params: Params, out_path: str = "streamlines.png",
                     Re: Optional[int] = None):
    """Stream-function contour plot (the standard cavity figure: primary
    vortex + corner eddies).  Marks the computed primary-vortex center and,
    when Ghia Table III carries this Re, the published center.  The
    reference has no derived-field plot at all (plot_field.py draws speed
    + quiver)."""
    from . import diagnostics

    plt = _mpl()
    psi = np.asarray(diagnostics.stream_function(u, params))
    xc = np.arange(params.i_max + 1) * params.dx
    yc = np.arange(params.j_max + 1) * params.dy

    # Ghia-style levels: dense around the primary vortex, logarithmic for
    # the weak counter-rotating corner eddies.
    lo = psi.min()
    neg = np.linspace(lo, lo * 0.05, 10)
    pos = [1e-8, 1e-7, 1e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3, 2.5e-3]
    levels = np.unique(np.concatenate([neg, [0.0], pos]))

    plt.figure(figsize=(5, 5))
    cs = plt.contour(xc, yc, psi.T, levels=levels, linewidths=0.7,
                     colors="black")
    plt.clabel(cs, levels[:: max(1, len(levels) // 6)], fontsize=6,
               fmt="%.3g")
    vort = diagnostics.primary_vortex(psi, params)
    plt.plot([vort.x], [vort.y], "r+", markersize=10,
             label=f"computed $\\psi_{{min}}$={vort.psi:.4f}")
    if Re is not None and Re in diagnostics.GHIA_VORTEX_CENTER:
        gx, gy = diagnostics.GHIA_VORTEX_CENTER[Re]
        plt.plot([gx], [gy], "bx", markersize=8,
                 label=f"Ghia $\\psi$={diagnostics.GHIA_PSI_MIN[Re]:.4f}")
    plt.legend(fontsize=7)
    plt.xlim(0, params.a)
    plt.ylim(0, params.b)
    plt.gca().set_aspect("equal")
    plt.xlabel("$x$")
    plt.ylabel("$y$")
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close()
    return out_path


def plot_ghia_from_files(prefix: str, Re: int, out_prefix: str = "ghia"):
    """Ghia plot from `<prefix>_{u,v}.txt` output files (the reference's
    file-based flow, plot_ghia.py:21-22)."""
    _, a, b, u = nsio.read_field(prefix + "_u.txt")
    _, _, _, v = nsio.read_field(prefix + "_v.txt")
    i_max = v.shape[0] - 2
    j_max = u.shape[1] - 2
    params = Params(i_max=i_max, j_max=j_max, a=a, b=b)
    # pad u back to uniform shape for centerline_profiles
    u_full = np.zeros((i_max + 2, j_max + 2))
    u_full[: u.shape[0], :] = u
    v_full = np.zeros((i_max + 2, j_max + 2))
    v_full[:, : v.shape[1]] = v
    return plot_ghia(u_full, v_full, params, Re, out_prefix)


def _frames(out_dir: str):
    """Numbered frame prefixes `<out_dir>/<n>` sorted by n."""
    ns = []
    for path in glob.glob(os.path.join(out_dir, "*_p.txt")):
        m = re.match(r"(\d+)_p\.txt$", os.path.basename(path))
        if m:
            ns.append(int(m.group(1)))
    return [os.path.join(out_dir, str(n)) for n in sorted(ns)]


def animate_flow(out_dir: str, gif_path: str = "flow.gif", fps: int = 30,
                 max_frames: Optional[int] = None):
    """Speed-magnitude imshow + quiver animation over the numbered output
    frames (reference plot_field.py), written as a looping GIF."""
    plt = _mpl()
    from matplotlib import animation

    prefixes = _frames(out_dir)
    if max_frames:
        prefixes = prefixes[:max_frames]
    if not prefixes:
        raise FileNotFoundError(f"no numbered frames in {out_dir}")

    def load(prefix):
        _, _, _, u = nsio.read_field(prefix + "_u.txt")
        _, _, _, v = nsio.read_field(prefix + "_v.txt")
        n = min(u.shape[0], v.shape[0]) - 1
        m = min(u.shape[1], v.shape[1]) - 1
        uu, vv = u[1:n, 1:m], v[1:n, 1:m]
        return uu, vv, np.sqrt(uu**2 + vv**2)

    u0, v0, s0 = load(prefixes[0])
    fig, ax = plt.subplots(figsize=(5, 5))
    im = ax.imshow(s0.T, origin="lower", extent=(0, 1, 0, 1), cmap="viridis")
    fig.colorbar(im, ax=ax, shrink=0.8)
    step = max(1, s0.shape[0] // 12)
    X, Y = np.meshgrid(
        np.linspace(0, 1, u0[::step, ::step].shape[0]),
        np.linspace(0, 1, u0[::step, ::step].shape[1]), indexing="ij",
    )
    qv = ax.quiver(X, Y, u0[::step, ::step], v0[::step, ::step],
                   color="white", scale=2.0)

    def update(k):
        u, v, s = load(prefixes[k])
        im.set_data(s.T)
        qv.set_UVC(u[::step, ::step], v[::step, ::step])
        return im, qv

    anim = animation.FuncAnimation(fig, update, frames=len(prefixes))
    anim.save(gif_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return gif_path


def animate_pressure(out_dir: str, gif_path: str = "pressure.gif",
                     fps: int = 30, max_frames: Optional[int] = None):
    """Pressure-field animation (reference plot_pressure.py)."""
    plt = _mpl()
    from matplotlib import animation

    prefixes = _frames(out_dir)
    if max_frames:
        prefixes = prefixes[:max_frames]
    if not prefixes:
        raise FileNotFoundError(f"no numbered frames in {out_dir}")

    def load(prefix):
        _, _, _, p = nsio.read_field(prefix + "_p.txt")
        return p[1:-1, 1:-1]

    p0 = load(prefixes[0])
    fig, ax = plt.subplots(figsize=(5, 5))
    im = ax.imshow(p0.T, origin="lower", extent=(0, 1, 0, 1), cmap="coolwarm")
    fig.colorbar(im, ax=ax, shrink=0.8)

    def update(k):
        p = load(prefixes[k])
        im.set_data(p.T)
        im.autoscale()
        return (im,)

    anim = animation.FuncAnimation(fig, update, frames=len(prefixes))
    anim.save(gif_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return gif_path


def plot_history(csv_path: str, out_path: str = "history.png"):
    """Small-multiples time-series figure from a `--history-file` CSV
    (one panel per column, one series per panel — solver scalars always,
    the `--history-physics` monitor columns when present).  The reference
    has no run-monitoring output at all (its residual print is commented
    out, src/serial/integration.c:162)."""
    plt = _mpl()
    with open(csv_path) as fh:
        header = fh.readline().strip().split(",")
        data = np.array([ln.strip().split(",") for ln in fh if ln.strip()],
                        dtype=np.float64)
    if data.size == 0:
        raise ValueError(f"history file {csv_path!r} has no data rows")
    cols = dict(zip(header, data.T))
    t = cols.get("t")

    # (column, panel title, log-scale) — order is the reading order.
    panels = [(k, title, log) for k, title, log in [
        ("res_norm", "pressure residual L2", True),
        ("sor_iterations", "SOR iterations / step", False),
        ("dt", "adaptive dt", False),
        ("kinetic_energy", "kinetic energy", False),
        ("enstrophy", "enstrophy", False),
        ("max_divergence", "max cell divergence", True),
        ("psi_min", "primary-vortex psi_min", False),
    ] if k in cols]

    ncols = 2
    nrows = (len(panels) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(8, 2.1 * nrows),
                             sharex=True, squeeze=False)
    ink = "#30577B"  # one series per panel; the panel title names it
    for ax, (key, title, log) in zip(axes.flat, panels):
        y = cols[key]
        ax.plot(t, y, color=ink, linewidth=1.4)
        if log and np.all(y > 0):
            ax.set_yscale("log")
        ax.set_title(title, fontsize=9)
        ax.grid(True, alpha=0.25, linewidth=0.5)
        ax.tick_params(labelsize=7)
    for ax in axes.flat[len(panels):]:
        ax.set_visible(False)
    # sharex hides tick labels everywhere but the last row; when the last
    # row has an empty slot, restore them on each column's lowest visible
    # panel so every column keeps a time axis.
    for c in range(ncols):
        col_axes = [axes[r][c] for r in range(nrows) if axes[r][c].get_visible()]
        if col_axes:
            col_axes[-1].tick_params(labelbottom=True)
            col_axes[-1].set_xlabel("$t$", fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def plot_convection(state, params: Params, nu_hot: float, Ra: float,
                    out_path: str = "convection.png"):
    """Temperature field + velocity streamlines of a steady natural-
    convection solution (models/convection.py) — the standard de Vahl
    Davis figure (isotherms bending from conduction-vertical to
    convection-horizontal as Ra grows)."""
    from . import diagnostics

    plt = _mpl()
    T = np.asarray(state.T)[1:-1, 1:-1]
    psi = np.asarray(diagnostics.stream_function(state.u, params))
    x = (np.arange(params.i_max) + 0.5) * params.dx
    y = (np.arange(params.j_max) + 0.5) * params.dy
    xc = np.arange(params.i_max + 1) * params.dx
    yc = np.arange(params.j_max + 1) * params.dy

    plt.figure(figsize=(5.4, 5))
    im = plt.pcolormesh(x, y, T.T, cmap="coolwarm", shading="auto",
                        vmin=-0.5, vmax=0.5)
    plt.colorbar(im, label="$T$", shrink=0.85)
    plt.contour(x, y, T.T, levels=np.linspace(-0.45, 0.45, 10),
                colors="black", linewidths=0.5)
    span = max(abs(psi.min()), abs(psi.max()), 1e-12)
    plt.contour(xc, yc, psi.T, levels=np.linspace(-span, span, 13),
                colors="white", linewidths=0.8, linestyles="solid")
    plt.title(f"Ra={Ra:g}: $\\overline{{Nu}}$={nu_hot:.3f} "
              f"(de Vahl Davis: "
              f"{_DVD_NU.get(Ra, float('nan')):.3f})", fontsize=10)
    plt.gca().set_aspect("equal")
    plt.xlabel("$x$ (hot wall left)")
    plt.ylabel("$y$")
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close()
    return out_path


_DVD_NU = {1e3: 1.118, 1e4: 2.243, 1e5: 4.519, 1e6: 8.800}


def plot_particle_paths(history, params: Params,
                        out_path: str = "particles.png",
                        mode: str = "paths"):
    """Render a particle trajectory history (particles.trace_particles) —
    the visualization stage the serial lineage's sect. 3.4 particle tracing
    feeds (the reference repo has no particle post-processing at all).

    `history` is (frames, capacity, 3) of (x, y, active).  mode="paths"
    draws one polyline per particle over the frames where it was active
    (pathlines); mode="points" scatters only the FINAL frame's active
    particles (the streakline picture — with injection, the live set IS the
    streak)."""
    plt = _mpl()
    hist = np.asarray(history, np.float64)
    if hist.ndim != 3 or hist.shape[-1] != 3:
        raise ValueError(f"history must be (frames, capacity, 3), "
                         f"got {hist.shape}")
    plt.figure(figsize=(5.2, 5.2 * params.b / params.a))
    if mode == "paths":
        for k in range(hist.shape[1]):
            act = hist[:, k, 2] > 0.5
            if not act.any():
                continue
            # Active prefix plus the seed frame before it (frozen after).
            xs, ys = hist[act, k, 0], hist[act, k, 1]
            plt.plot(xs, ys, lw=0.7, alpha=0.8)
            plt.plot(xs[-1:], ys[-1:], "k.", ms=2.5)
    elif mode == "points":
        act = hist[-1, :, 2] > 0.5
        plt.plot(hist[-1, act, 0], hist[-1, act, 1], "k.", ms=3)
    else:
        raise ValueError(f"unknown particle plot mode {mode!r}")
    plt.xlim(0, params.a)
    plt.ylim(0, params.b)
    plt.gca().set_aspect("equal")
    plt.xlabel("$x$")
    plt.ylabel("$y$")
    plt.title(f"{'pathlines' if mode == 'paths' else 'particles'} "
              f"({hist.shape[0]} frames)", fontsize=10)
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    plt.close()
    return out_path
