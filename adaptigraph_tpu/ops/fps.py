"""Farthest point sampling.

The reference uses DGL's ``farthest_point_sampler`` followed by a radius
dedup (reference: ``src/dynamics/dataset/graph.py:8-36`` and
``src/dynamics/utils.py:10-24`` ``fps_rad_idx``). FPS is inherently
sequential, so we provide:

- ``fps_numpy`` / ``fps_rad_numpy`` — host-side numpy, used by the data
  pipeline (runs in loader workers, never on the device hot path)
- ``fps_jax`` — a ``lax.fori_loop`` device version for the perception loop,
  returning a fixed-size index set plus a validity count
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp


def fps_numpy(pcd, num, start_idx=None, rng=None):
    """Greedy farthest-point sampling of ``num`` indices from ``pcd (n, d)``.

    Matches DGL's algorithm (random start like graph.py:12).
    """
    n = pcd.shape[0]
    num = min(num, n)
    if start_idx is None:
        rng = rng or np.random
        start_idx = int(rng.randint(0, n)) if hasattr(rng, "randint") else int(rng.integers(0, n))
    idxs = np.empty(num, dtype=np.int64)
    idxs[0] = start_idx
    dist = np.linalg.norm(pcd - pcd[start_idx], axis=1)
    for i in range(1, num):
        nxt = int(dist.argmax())
        idxs[i] = nxt
        dist = np.minimum(dist, np.linalg.norm(pcd - pcd[nxt], axis=1))
    return idxs


def fps_rad_numpy(pcd, radius, rng=None):
    """Radius-capped FPS: keep adding farthest points until max distance
    <= radius (reference: ``src/dynamics/utils.py:10-24``). Returns indices."""
    n = pcd.shape[0]
    rng = rng or np.random
    start = int(rng.randint(0, n)) if hasattr(rng, "randint") else int(rng.integers(0, n))
    idxs = [start]
    dist = np.linalg.norm(pcd - pcd[start], axis=1)
    while dist.max() > radius:
        nxt = int(dist.argmax())
        idxs.append(nxt)
        dist = np.minimum(dist, np.linalg.norm(pcd - pcd[nxt], axis=1))
    return np.asarray(idxs, dtype=np.int64)


def fps_downsample(pcd, max_num, radius, rng=None, start_idx=None):
    """The reference's two-stage downsample (graph.py:8-36): FPS to
    ``max_num`` points, then radius-dedup the result. Returns indices into
    ``pcd``."""
    idx1 = fps_numpy(pcd, max_num, start_idx=start_idx, rng=rng)
    down = pcd[idx1]
    # deterministic start for stage 2 to keep the first FPS point first
    idx2 = fps_rad_numpy_from(down, radius, start=0)
    return idx1[idx2]


def fps_rad_numpy_from(pcd, radius, start=0):
    idxs = [start]
    dist = np.linalg.norm(pcd - pcd[start], axis=1)
    while dist.max() > radius:
        nxt = int(dist.argmax())
        idxs.append(nxt)
        dist = np.minimum(dist, np.linalg.norm(pcd - pcd[nxt], axis=1))
    return np.asarray(idxs, dtype=np.int64)


@functools.partial(jax.jit, static_argnames=("num",))
def fps_jax(pcd, mask, num, start_idx=0):
    """Device FPS returning exactly ``num`` indices (may repeat when fewer
    valid points than ``num``) plus per-index validity.

    Args:
      pcd: (n, d) points.
      mask: (n,) bool validity.
      num: static sample count.

    Returns:
      idxs: (num,) int32.
      valid: (num,) bool — False for slots beyond the valid point count.
    """
    n = pcd.shape[0]
    inf = jnp.asarray(jnp.inf, pcd.dtype)

    d0 = jnp.linalg.norm(pcd - pcd[start_idx], axis=1)
    d0 = jnp.where(mask, d0, -inf)

    def body(i, carry):
        dist, idxs = carry
        nxt = jnp.argmax(dist)
        idxs = idxs.at[i].set(nxt.astype(jnp.int32))
        dist = jnp.minimum(dist, jnp.where(mask, jnp.linalg.norm(pcd - pcd[nxt], axis=1), -inf))
        return dist, idxs

    idxs0 = jnp.zeros(num, dtype=jnp.int32).at[0].set(jnp.asarray(start_idx, jnp.int32))
    _, idxs = jax.lax.fori_loop(1, num, body, (d0, idxs0))
    valid = jnp.arange(num) < jnp.sum(mask)
    return idxs, valid
