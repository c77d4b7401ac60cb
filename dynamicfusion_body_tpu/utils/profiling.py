"""Observability: per-phase wall-clock timers and device traces.

Replaces the reference's ad-hoc cProfile dumps + pstats pretty-printer
(test.py:126-129, profiles/printProfile.py): phases are timed with
device-synchronized wall clocks, accumulated per name, and dumped as JSON
next to the run; ``device_trace`` wraps ``jax.profiler.trace`` for
XProf-compatible traces of the on-device kernels.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall time per named phase (device-synchronized)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None, fetch=False):
        """Context manager; pass ``sync=array`` to block on a device value
        before stopping the clock. ``fetch=True`` forces completion with a
        host fetch of one element instead — ``block_until_ready`` can
        return early on remote-attached (axon-tunneled) TPUs, under-
        reporting device time; use fetch there."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                if fetch:
                    jnp = jax.numpy
                    float(jnp.ravel(jax.tree_util.tree_leaves(sync)[0])[0])
                else:
                    jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def record(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self):
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(self.counts[name], 1), 6),
            }
            for name in sorted(self.totals)
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

    def report(self):
        lines = []
        for name, s in self.summary().items():
            lines.append(
                f"{name:<24} total {s['total_s']:9.3f}s  x{s['count']:<4d} "
                f"mean {s['mean_s']*1000:9.2f}ms"
            )
        return "\n".join(lines)


def print_profile(path: str, sort: str = "total_s"):
    """Pretty-print a dumped profile JSON (the printProfile.py analogue)."""
    with open(path) as f:
        data = json.load(f)
    for name, s in sorted(data.items(), key=lambda kv: -kv[1].get(sort, 0)):
        print(
            f"{name:<24} total {s['total_s']:9.3f}s  x{s['count']:<4d} "
            f"mean {s['mean_s']*1000:9.2f}ms"
        )


@contextlib.contextmanager
def device_trace(logdir: str):
    """XProf trace of everything inside the block (view with
    tensorboard-profile tooling)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
