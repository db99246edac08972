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

# NOTE: the persistent XLA compilation cache is enabled explicitly by the
# entry points (cli.main, bench.py) via utils.jaxcache.enable_persistent_cache
# — importing the package must not mutate process env or write outside a
# user-chosen location (ADVICE r4: an installed copy would otherwise drop
# .jax_cache into site-packages' parent and leak env into embedding apps).
