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
