#!/usr/bin/env python
"""Crash-tolerant solve driver — elastic recovery the reference never had
(SURVEY.md §5: its only failure handling is an abort macro).

Advances the integration in bounded per-process chunks with checkpoints; if
a worker/process crashes (observed sporadically on tunneled TPUs under
sustained load at 4096^2), the next invocation resumes from the last
checkpoint instead of losing the run.

    python scripts/resilient_solve.py configs/5.in --method mg \
        --steps-per-run 64 --checkpoint ck5.npz
"""

import argparse
import os
import subprocess
import sys
import time


def _checkpoint_progress(path):
    """(step n, time t) recorded in the checkpoint, or None if unreadable."""
    try:
        import numpy as np

        with np.load(path) as ck:
            return int(ck["n"]), float(ck["t"])
    except Exception:
        return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--method", default="mg")
    ap.add_argument("--steps-per-run", type=int, default=64)
    ap.add_argument("--checkpoint", default="resilient_ck.npz")
    ap.add_argument("--max-retries", type=int, default=20)
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args(argv)

    attempt = 0
    t0 = time.time()
    last_progress = None  # (mtime, size) of the checkpoint after each chunk
    while True:
        cmd = [
            sys.executable, "-m", "navierstokes_parallel_tpu", args.config,
            "--method", args.method,
            "--max-steps", str(args.steps_per_run),
            "--checkpoint-every", str(args.steps_per_run),
            "--checkpoint-path", args.checkpoint,
            "--stats", *args.extra,
        ]
        if os.path.exists(args.checkpoint):
            cmd += ["--resume", args.checkpoint]
        proc = subprocess.run(cmd)
        if proc.returncode == 0:
            print(f"COMPLETE in {time.time() - t0:.1f}s wall "
                  f"({attempt} recoveries)")
            return 0
        if proc.returncode == 3:
            # Clean incomplete chunk — but only keep going if it actually
            # advanced the checkpoint (a chunk that repeatedly exits 3
            # without moving `n`/`t` — unwritable checkpoint path, dt
            # underflow — must not spin forever).
            progress = _checkpoint_progress(args.checkpoint)
            if progress is not None and progress != last_progress:
                last_progress = progress
                continue
            attempt += 1
            print(f"[resilient_solve] chunk made no progress "
                  f"(checkpoint at {progress}); retry {attempt}/"
                  f"{args.max_retries}", file=sys.stderr)
            if attempt > args.max_retries:
                print("[resilient_solve] giving up", file=sys.stderr)
                return 1
            continue
        attempt += 1
        print(f"[resilient_solve] process died (rc={proc.returncode}); "
              f"recovery {attempt}/{args.max_retries} from {args.checkpoint}",
              file=sys.stderr)
        if attempt > args.max_retries:
            print("[resilient_solve] giving up", file=sys.stderr)
            return 1


if __name__ == "__main__":
    sys.exit(main())
