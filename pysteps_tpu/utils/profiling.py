"""Profiling and tracing helpers (SURVEY §5.1).

The reference's observability is the ``measure_time=True`` flag printing
init/main-loop wall seconds (reference: nowcasts/steps.py:194-196,
1242-1254), which every model here keeps.  This module adds the TPU-side
instrumentation on top: XLA profiler traces viewable in TensorBoard /
Perfetto, op-level annotations, and device memory stats.
"""

import contextlib
import time


@contextlib.contextmanager
def trace(logdir="/tmp/pysteps_tpu_trace", host=False):
    """Capture an XLA profiler trace of the enclosed block.

    View with ``tensorboard --logdir <logdir>`` (Profile tab) or by
    loading the generated ``.trace.json.gz`` into Perfetto.
    """
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_trace=not host)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region that shows up inside profiler traces.

    Usage::

        with annotate("cascade-decompose"):
            levels, mu, sigma = decompose_core(field, weights)
    """
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None):
    """Per-device memory usage dict (bytes), or {} if the backend does
    not expose allocator statistics (CPU)."""
    import jax

    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:  # noqa: BLE001 — backend without allocator stats
        return {}
    return dict(stats or {})


class Timer:
    """Cumulative named wall-clock timers for host-side phase accounting.

    ``measure_time`` reports one number per phase; Timer lets scripts and
    benchmarks accumulate arbitrary named sections::

        t = Timer()
        with t("init"): ...
        with t("scan"): ...
        print(t.report())
    """

    def __init__(self):
        self.totals = {}

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self):
        width = max((len(k) for k in self.totals), default=0)
        return "\n".join(
            f"{k:{width}s}  {v*1e3:10.2f} ms" for k, v in self.totals.items()
        )
