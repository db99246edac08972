"""AdaptiGraph-TPU: a TPU-native framework for material-adaptive graph neural dynamics.

Re-implements the capabilities of the AdaptiGraph reference (RSS 2024) with a
JAX/XLA/Pallas-first architecture:

- static-shape neighbor graphs (``ops.graph``) instead of dense incidence matrices
- a functional interaction-network dynamics model (``models.gnn``)
- scan/vmap-native autoregressive rollout and MPPI planning (``planning``)
- device-mesh sharding of the MPPI sample axis (``parallel``)
- a C++ XPBD particle simulator for data generation (``sim``)
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache (opt-out via JAX_COMPILATION_CACHE_DIR="").
# The flagship 20k-sample MPPI program compiles in tens of minutes through the
# remote-TPU tunnel; caching it on disk makes that a one-time cost that
# survives client restarts and watchdog kills. setdefault BEFORE jax is
# imported (jax reads these env vars at import); harmless if the embedding
# process imported jax already — the CLI / bench entry points import this
# package first.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                  ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
