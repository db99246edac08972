"""Profiling and tracing as first-class utilities.

The reference scatters ad-hoc wall-clock prints (reference:
``src/dynamics/train/train.py:73,159-160``, ``src/planning/
forward_dynamics.py:13,203-204``, ``plan.py:314-315``); its only real
profiler is the FleX-internal timer readback (``PyFleX/bindings/
pyflex.cpp:3557-3583``). Here: hierarchical stage timers with aggregate
reporting, and a context manager around ``jax.profiler`` for device traces
viewable in TensorBoard/Perfetto.
"""

import contextlib
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    """Accumulating named-stage wall timers.

    >>> timer = StageTimer()
    >>> with timer("solve"):
    ...     ...
    >>> timer.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._stack = []

    @contextlib.contextmanager
    def __call__(self, name):
        self._stack.append(name)
        full = "/".join(self._stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[full] += dt
            self.counts[full] += 1
            self._stack.pop()

    def stats(self):
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
            for k in sorted(self.totals)
        }

    def report(self, print_fn=print):
        for k, s in self.stats().items():
            print_fn(f"{k:40s} {s['total_s']:8.3f}s  x{s['count']:<5d} "
                     f"{s['mean_ms']:8.2f} ms/call")

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir, host_tracer_level=2):
    """Capture a jax.profiler device trace (XLA ops, fusion boundaries, HBM
    traffic) into ``log_dir`` for TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, iters=10, warmup=1, **kwargs):
    """Wall-time a jitted callable with block_until_ready, returning
    (mean_s, std_s). Interim results are blocked on each call, so tunnel/
    dispatch pipelining cannot fake sub-FLOP timings."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return float(np.mean(times)), float(np.std(times))


def gnn_forward_flops(cfg, k_used):
    """Analytic FLOP count for ONE GNN forward (one sample, one substep),
    split into "useful" model FLOPs (encoders, propagators, head — the math
    the reference's bmm chain does, model.py:296-342) and the one-hot
    sender-gather matmuls (a TPU-specific lowering choice: gathers run on
    the MXU as (N*K, N) x (N, F) products instead of serialized HBM
    gathers). The split keeps MFU honest — gather FLOPs are real work the
    chip does, but they are not model math.

    Returns dict(useful=..., gather=...) in FLOPs (multiply-adds x 2).
    """
    N = cfg.n_nodes
    K = int(k_used)
    nf = cfg.nf_effect
    n_p = cfg.max_nobj
    nh3 = cfg.n_his * 3

    d_in_p = cfg.attr_dim + cfg.phys_dim + (3 if cfg.action_dim else 0) \
        + (nh3 if cfg.state_dim else 0) + (1 if cfg.density_dim else 0)
    d_in_r = 2 * cfg.rel_attr_dim + (1 if cfg.rel_group_dim else 0) \
        + (nh3 if cfg.rel_distance_dim else 0)

    useful = 0
    useful += 2 * N * (d_in_p * nf + 2 * nf * nf)          # particle encoder
    useful += 2 * N * K * (d_in_r * nf + 2 * nf * nf)      # relation encoder
    useful += 2 * N * K * nf * nf                          # rel_base (enc @ w1)
    useful += 2 * N * nf * nf                              # part_base
    useful += cfg.pstep * (3 * 2 * N * nf * nf)            # recv/send/agg mats
    useful += 2 * n_p * (2 * nf * nf + nf * 3)             # motion head

    # one-hot gathers: attrs, group, state-residual block, pstep x effect
    gather_cols = cfg.attr_dim + cfg.n_instance + nh3 + cfg.pstep * nf
    gather = 2 * N * N * K * gather_cols
    return {"useful": float(useful), "gather": float(gather)}
