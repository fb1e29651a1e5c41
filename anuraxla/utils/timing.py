"""Stage timing + optional jax.profiler tracing.

The reference has no profiling at all (SURVEY.md §5.1 — print/tqdm only);
this gives every pipeline stage wall-clock + throughput numbers and an
opt-in XLA trace (ANURAXLA_TRACE_DIR=...) viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time


class StageTimer:
    def __init__(self, name: str, n_items: int = 0):
        self.name = name
        self.n_items = n_items
        self.seconds = 0.0

    @property
    def rate(self) -> float:
        return self.n_items / self.seconds if self.seconds > 0 else float("nan")


@contextlib.contextmanager
def stage_timer(name: str, n_items: int = 0, log=print):
    t = StageTimer(name, n_items)
    start = time.perf_counter()
    try:
        yield t
    finally:
        t.seconds = time.perf_counter() - start
        if log is not None:
            extra = f" ({t.rate:.1f} items/s)" if n_items else ""
            log(f"⏱️ {name}: {t.seconds:.3f}s{extra}")
        # structured forwarding (no-op unless a metrics sink is configured)
        from anuraxla.utils.metrics import log_metrics

        log_metrics(
            {"kind": "stage", "stage": name, "seconds": t.seconds,
             **({"n_items": t.n_items, "rate": t.rate} if n_items else {})}
        )


@contextlib.contextmanager
def maybe_trace(name: str = "anuraxla"):
    """Wrap a region in a jax.profiler trace when ANURAXLA_TRACE_DIR is set."""
    trace_dir = os.environ.get("ANURAXLA_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
