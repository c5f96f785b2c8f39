"""Field text I/O — byte-format parity with the reference.

Writes u/v/p text grids in exactly the reference's `output()` format
(src/serial/io.c:61-120): per field a 3-line header (t, a, b, each "%.5f"),
then rows of "%.5f "-formatted values, outer loop over j (so a text row is a
fixed-j slice), inner over i.  Quirks reproduced: the u file has i_max+1
columns, the v file has j_max+1 data rows followed by one empty line, the p
file is the full (i_max+2) x (j_max+2) padded grid.

This keeps the reference's downstream tooling (plot_ghia.py, plot_field.py,
the notebook comparator) working unchanged against our outputs.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def _write_grid(path: str, arr: np.ndarray, t: float, a: float, b: float,
                n_cols: int, n_rows: int) -> None:
    """arr is indexed [i, j]; file rows are j-slices (io.c:102-112)."""
    with open(path, "w") as fh:
        fh.write(f"{t:.5f}\n{a:.5f}\n{b:.5f}\n")
        total_rows = arr.shape[1]
        for j in range(total_rows):
            if j < n_rows:
                row = arr[:n_cols, j]
                fh.write(" ".join(f"{val:.5f}" for val in row) + " \n")
            else:
                fh.write("\n")


def output(u, v, p, t: float, a: float, b: float, prefix: str,
           verbose: bool = True) -> None:
    """Write `<prefix>_{u,v,p}.txt` (reference io.c:61-120)."""
    u = np.asarray(u)
    v = np.asarray(v)
    p = np.asarray(p)
    i_max = p.shape[0] - 2
    j_max = p.shape[1] - 2

    d = os.path.dirname(prefix)
    if d:
        os.makedirs(d, exist_ok=True)

    _write_grid(f"{prefix}_u.txt", u, t, a, b, i_max + 1, j_max + 2)
    _write_grid(f"{prefix}_v.txt", v, t, a, b, i_max + 2, j_max + 1)
    _write_grid(f"{prefix}_p.txt", p, t, a, b, i_max + 2, j_max + 2)
    if verbose:
        print("Output created!")


def read_field(path: str) -> Tuple[float, float, float, np.ndarray]:
    """Read a field file back; returns (t, a, b, array indexed [i, j])."""
    with open(path, "r") as fh:
        t = float(fh.readline())
        a = float(fh.readline())
        b = float(fh.readline())
        rows = []
        for line in fh:
            vals = line.split()
            if vals:
                rows.append([float(x) for x in vals])
    # File rows are j-slices with i varying along the row -> transpose.
    return t, a, b, np.array(rows).T


def tolerance_errors(a, b):
    """The reference notebook's comparator metric on arrays: elementwise
    relative error where |x| > 1, absolute error otherwise
    (colab-runner.ipynb compare_outputs_with_tolerance).  Returns the error
    array; compare its max against the tolerance (1e-4 in the contract).
    This is the single implementation — the parity script and the test
    suite both use it."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    big = (np.abs(a) > 1.0) | (np.abs(b) > 1.0)
    denom = np.maximum(np.abs(a), np.abs(b))
    rel = np.abs(a - b) / np.where(denom == 0, 1.0, denom)
    return np.where(big, rel, np.abs(a - b))


def compare_outputs_with_tolerance(path_a: str, path_b: str,
                                   tol: float = 1e-4) -> bool:
    """File-based parity check in the notebook's contract."""
    with open(path_a) as fa, open(path_b) as fb:
        lines_a, lines_b = fa.readlines(), fb.readlines()
    if len(lines_a) != len(lines_b):
        return False
    for la, lb in zip(lines_a, lines_b):
        ta, tb = la.split(), lb.split()
        if len(ta) != len(tb):
            return False
        if ta and np.max(
            tolerance_errors([float(x) for x in ta], [float(x) for x in tb])
        ) > tol:
            return False
    return True
