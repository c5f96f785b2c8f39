"""Shared pre-jax-init ``--platform`` override for the measurement scripts.

JAX_PLATFORMS=axon is pinned by the environment and overrides the env var;
only ``jax.config.update("jax_platforms", ...)`` forces another platform
(CLAUDE.md platform notes).  Must run before any device use, and handles
both ``--platform cpu`` and ``--platform=cpu`` spellings — argparse accepts
either, and silently ignoring one would hand back TPU timings labeled cpu.
"""

import sys


def apply_platform_override(argv=None):
    tokens = sys.argv if argv is None else argv
    if "--platform" not in tokens and not any(
            t.startswith("--platform=") for t in tokens):
        return
    import jax

    for i, tok in enumerate(tokens):
        if tok == "--platform" and i + 1 < len(tokens):
            jax.config.update("jax_platforms", tokens[i + 1])
        elif tok.startswith("--platform="):
            jax.config.update("jax_platforms", tok.split("=", 1)[1])
