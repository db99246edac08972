"""Seeding helpers (reference: ``src/dynamics/utils.py:128`` ``set_seed``).

JAX is functional, so the device-side story is explicit ``jax.random`` keys;
this only pins the host-side numpy/python RNGs used by the data pipeline.
"""

import random

import numpy as np


def set_seed(seed: int):
    np.random.seed(seed)
    random.seed(seed)


def np_rng(seed=None):
    return np.random.default_rng(seed)
