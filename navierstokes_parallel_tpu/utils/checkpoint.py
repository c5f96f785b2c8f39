"""Checkpoint / resume.

The reference has none (SURVEY.md §5: its n_print output path is commented
out and there is no restart capability).  We store the full solver state —
u, v, p, t, n — as a compressed .npz; `load_checkpoint` validates the grid
shape against the active config so a checkpoint cannot silently resume onto
the wrong resolution.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import Params
from ..grid import State


def save_checkpoint(path: str, state: State) -> None:
    np.savez_compressed(
        path,
        u=np.asarray(state.u),
        v=np.asarray(state.v),
        p=np.asarray(state.p),
        t=np.asarray(state.t),
        n=np.asarray(state.n),
    )


def load_checkpoint(path: str, params: Params) -> State:
    with np.load(path) as data:
        u, v, p = data["u"], data["v"], data["p"]
        t, n = data["t"], data["n"]
    if p.shape != params.shape:
        raise ValueError(
            f"checkpoint grid {p.shape} does not match config grid {params.shape}"
        )
    dtype = params.jnp_dtype
    return State(
        u=jnp.asarray(u, dtype),
        v=jnp.asarray(v, dtype),
        p=jnp.asarray(p, dtype),
        t=jnp.asarray(t, dtype),
        n=jnp.asarray(n, jnp.int32),
    )
