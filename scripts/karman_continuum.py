"""Reconcile the Euler and AB2 Kármán space-time limits into ONE
continuum number per force coefficient (round-4 verdict item 1).

Two independent time integrators (explicit Euler and variable-step AB2,
solver.py) were each run through the full 3x3 space-time refinement
ladder (scripts/karman_dt_study.py -> artifacts/karman_dt_study{,_ab2}
.csv).  In the continuum limit they MUST agree — the h->0, tau->0 value
is a property of the PDE + geometry, not of the integrator.  This script

  1. loads both ladders' joint limits and their GCI error bars
     (Fs=1.25 fitted / 3.0 nominal-order, see karman_dt_study.h_limit);
  2. ASSERTS cross-integrator agreement with the standard consistency
     test for two independent estimates carrying (non-statistical,
     GCI-style) uncertainty bars: the intervals must overlap,
     |lim_E - lim_A| <= err_E + err_A (a failure means at least one
     extrapolation is unconverged — the round-4 state before the AB2
     ladder's 40/0.125 rung landed);
  3. emits artifacts/karman_continuum.csv — the single citable table:
     value = mean of the two limits, err = max(half-disagreement,
     smaller GCI bar), plus the Schäfer-Turek 2D-2 band verdict.

Validation ethic: /root/reference/src/plot_ghia.py:41-45 asserts its
Ghia comparisons against hard tolerances; this applies the same rule to
the force-coefficient claims README.md makes.

Usage: python scripts/karman_continuum.py [--dir artifacts]
"""

import argparse
import os
import sys

QUANTS = ("st", "cd_max", "cl_max", "dp_mean", "cd_s_max", "cl_s_max")
BANDS = {"st": (0.2950, 0.3050), "cd_max": (3.22, 3.24),
         "cl_max": (0.99, 1.01), "dp_mean": (2.46, 2.50),
         "cd_s_max": (3.22, 3.24), "cl_s_max": (0.99, 1.01)}


def load_limits(path):
    """(limits, errs, orders) from a karman_dt_study CSV's summary rows."""
    lim = err = order = None
    with open(path) as f:
        header = f.readline().strip().split(",")
        qcols = [header.index(q) for q in QUANTS]
        for line in f:
            cells = line.strip().split(",")
            if cells[0] == "h->0":
                lim = {q: float(cells[c]) for q, c in zip(QUANTS, qcols)}
            elif cells[0] == "extrap_err":
                err = {q: float(cells[c]) for q, c in zip(QUANTS, qcols)}
            elif cells[0] == "spatial_order":
                order = {q: cells[c] for q, c in zip(QUANTS, qcols)}
    if lim is None or err is None:
        raise SystemExit(
            f"{path} has no h->0/extrap_err summary rows — run "
            "karman_dt_study.py (--cache-only regenerates them)")
    return lim, err, order


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="artifacts")
    args = ap.parse_args(argv)

    e_lim, e_err, e_ord = load_limits(
        os.path.join(args.dir, "karman_dt_study.csv"))
    a_lim, a_err, a_ord = load_limits(
        os.path.join(args.dir, "karman_dt_study_ab2.csv"))

    out = os.path.join(args.dir, "karman_continuum.csv")
    ok = True
    with open(out, "w") as f:
        f.write("quantity,euler_limit,ab2_limit,disagreement,value,err,"
                "band_lo,band_hi,verdict,euler_order,ab2_order\n")
        for q in QUANTS:
            d = abs(e_lim[q] - a_lim[q])
            # Standard consistency test for two independent estimates with
            # (non-statistical, GCI-style) uncertainty bars: the intervals
            # must overlap, |d| <= err_E + err_A.
            bar = e_err[q] + a_err[q]
            agree = d <= bar
            ok &= agree
            val = 0.5 * (e_lim[q] + a_lim[q])
            # Reported uncertainty: two CONSISTENT estimates justify the
            # tighter of the two bars (never less than half their spread).
            err = max(0.5 * d, min(e_err[q], a_err[q]))
            lo, hi = BANDS[q]
            verdict = ("IN" if lo <= val <= hi else
                       "IN(+err)" if lo - err <= val <= hi + err else
                       "OUT")
            f.write(f"{q},{e_lim[q]:.4f},{a_lim[q]:.4f},{d:.4f},"
                    f"{val:.4f},{err:.4f},{lo},{hi},{verdict},"
                    f"{e_ord[q]},{a_ord[q]}\n")
            print(f"{q:9s} euler={e_lim[q]:.4f} ab2={a_lim[q]:.4f} "
                  f"|d|={d:.4f} {'<=' if agree else '> '} bar={bar:.4f}"
                  f"  ->  {val:.4f} +/- {err:.4f}  [{lo}, {hi}] {verdict}")
            if not agree:
                print(f"  ** {q}: the integrators DISAGREE beyond the "
                      "smaller error bar — at least one extrapolation is "
                      "unconverged", file=sys.stderr)
    print(f"wrote {out}")
    if not ok:
        raise SystemExit(1)
    print("cross-integrator agreement: OK (every quantity's Euler and "
          "AB2 intervals overlap)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
