"""Tracing & profiling utilities (SURVEY.md §5.1).

The reference ships only a flag-gated wall-clock timer (utils.py:86-111
TimeCheck) and per-phase time lists (train_macarons.py compute_time). This
module provides those plus TPU-native tooling: a device-synchronized step
timer and a jax.profiler trace context for XLA-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional


class TimeCheck:
    """Flag-gated wall-clock checkpoints (reference utils.py:86-111)."""

    def __init__(self, on: bool = True):
        self.on = on
        self.t0 = time.perf_counter()

    def start(self):
        self.t0 = time.perf_counter()

    def check(self, label: str = ""):
        if self.on:
            dt = time.perf_counter() - self.t0
            print(f"[time] {label}: {dt:.4f}s")
            self.t0 = time.perf_counter()
            return dt
        return None


class StepTimer:
    """Accumulates per-phase durations; device-synchronized when given arrays.

    Replaces the reference's loop_time/backward_time lists
    (train_macarons.py:1112-1117)."""

    def __init__(self):
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, sync_array=None):
        t0 = time.perf_counter()
        yield
        if sync_array is not None:
            try:
                sync_array.block_until_ready()
            except AttributeError:
                pass
        self.times[name].append(time.perf_counter() - t0)

    def means(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.times.items() if v}

    def report(self):
        for k, m in self.means().items():
            print(f"[step-timer] {k}: {m * 1e3:.2f} ms (n={len(self.times[k])})")


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/macarons_trace"):
    """jax.profiler trace context — open the result with TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def check_gradients(grads, verbose: bool = True) -> Dict[str, float]:
    """Per-leaf gradient norms (reference utils.py:188-197)."""
    import jax
    import numpy as np

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        name = jax.tree_util.keystr(path)
        out[name] = float(np.linalg.norm(np.asarray(leaf)))
    if verbose:
        worst = sorted(out.items(), key=lambda kv: -kv[1])[:10]
        for name, n in worst:
            print(f"[grad] {n:.3e} {name}")
    return out
