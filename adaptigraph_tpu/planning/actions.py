"""Action encoding, sampling and the MPPI update (JAX).

Re-implements the reference action utilities (reference:
``src/planning/plan_utils.py:11-101`` and the default samplers in
``src/planning/real_world/planner.py:118-165``). The action is
``(x, z, theta, length)``: a push starting at (x, z) in direction theta,
repeated ``int(length)`` sub-pushes of ``push_length`` each.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp


def decode_action(action, push_length=0.10):
    """(..., 4) action -> ((..., 4) [x0, z0, x1, z1], (...,) int repeats)
    (reference: plan_utils.py:11-20)."""
    x0 = action[..., 0]
    z0 = action[..., 1]
    theta = action[..., 2]
    repeat = action[..., 3].astype(jnp.int32)
    x1 = x0 - push_length * jnp.cos(theta)
    z1 = z0 - push_length * jnp.sin(theta)
    return jnp.stack([x0, z0, x1, z1], axis=-1), repeat


def angle_normalize(x):
    return ((x + math.pi) % (2 * math.pi)) - math.pi


def clip_actions(action, lower, upper):
    """Normalize the angle then clamp all dims (plan_utils.py:35-39)."""
    action = action.at[..., 2].set(angle_normalize(action[..., 2]))
    return jnp.clip(action, lower, upper)


def sample_action_seq(key, act_seq, lower, upper, n_sample, iter_index=0,
                      noise_level=0.3, push_length=0.10):
    """Length-aware resampling around the current best sequence
    (reference: plan_utils.py:42-77).

    iter 0: uniform over the action box. Later iters: perturb in *endpoint*
    space with per-step noise scale beta = 0.1 * 10**i, re-encode to
    (theta, length), keep sample 0 unperturbed.
    """
    L, A = act_seq.shape
    if iter_index == 0:
        u = jax.random.uniform(key, (n_sample, L, A))
        return u * (upper - lower) + lower

    xs = act_seq[:, 0]
    zs = act_seq[:, 1]
    thetas = act_seq[:, 2]
    lengths = act_seq[:, 3]
    x_ends = xs - lengths * push_length * jnp.cos(thetas)
    z_ends = zs - lengths * push_length * jnp.sin(thetas)

    keys = jax.random.split(key, L)
    rows = []
    for i in range(L):
        noise = jax.random.normal(keys[i], (n_sample, 4)) * noise_level
        beta = 0.1 * (10.0**i)
        res = beta * noise
        xi = xs[i] + res[:, 0]
        zi = zs[i] + res[:, 1]
        xei = x_ends[i] + res[:, 2]
        zei = z_ends[i] + res[:, 3]
        thi = jnp.arctan2(zi - zei, xi - xei)
        leni = jnp.sqrt((xei - xi) ** 2 + (zei - zi) ** 2) / push_length
        row = clip_actions(jnp.stack([xi, zi, thi, leni], axis=-1), lower, upper)
        rows.append(row)
    samples = jnp.stack(rows, axis=1)  # (n_sample, L, 4)
    # sample 0 keeps the unperturbed sequence (plan_utils.py:75)
    return samples.at[0].set(act_seq)


def sample_action_seq_correlated(key, act_seq, lower, upper, n_sample,
                                 noise_level=0.1, beta_filter=0.7):
    """Default correlated-noise sampler
    (reference: planner.py:138-165)."""
    L, A = act_seq.shape
    base = jnp.broadcast_to(act_seq[None], (n_sample, L, A))

    def body(carry, k):
        residual = carry
        noise = jax.random.normal(k, (n_sample, A)) * noise_level
        residual = beta_filter * noise + residual * (1.0 - beta_filter)
        return residual, residual

    keys = jax.random.split(key, L)
    _, residuals = jax.lax.scan(body, jnp.zeros((n_sample, A)), keys)
    out = base + jnp.moveaxis(residuals, 0, 1)
    return jnp.clip(out, lower, upper)


def optimize_action_mppi(act_seqs, reward_seqs, reward_weight=100.0, lower=None,
                         upper=None, push_length=0.10):
    """Softmax-weighted MPPI update in endpoint space
    (reference: plan_utils.py:80-101)."""
    w = jax.nn.softmax(reward_seqs * reward_weight, axis=0)[:, None]  # (n_sample, 1)

    xs = act_seqs[:, :, 0]
    zs = act_seqs[:, :, 1]
    thetas = act_seqs[:, :, 2]
    lengths = act_seqs[:, :, 3]
    x_ends = xs - lengths * push_length * jnp.cos(thetas)
    z_ends = zs - lengths * push_length * jnp.sin(thetas)

    x = jnp.sum(w * xs, axis=0)
    z = jnp.sum(w * zs, axis=0)
    xe = jnp.sum(w * x_ends, axis=0)
    ze = jnp.sum(w * z_ends, axis=0)

    theta = jnp.arctan2(z - ze, x - xe)
    length = jnp.sqrt((xe - x) ** 2 + (ze - z) ** 2) / push_length
    act_seq = jnp.stack([x, z, theta, length], axis=-1)
    return clip_actions(act_seq, lower, upper)


def fps_action_grid(lower, upper, n_sample, grid_size=0.02):
    """Host-side FPS over the action grid for diverse initialization
    (reference: planner.py:124-136 'fps' noise type + fps_np:14-36, which
    seeds from the largest-motion point)."""
    lower = np.asarray(lower)
    upper = np.asarray(upper)
    axes = [np.arange(lower[i], upper[i], grid_size) for i in range(len(lower))]
    grid = np.stack(np.meshgrid(*axes), axis=-1).reshape(-1, len(lower))
    c = grid.shape[1]
    motion = np.linalg.norm(grid[:, c // 2 :] - grid[:, : c // 2], axis=1)
    start = int(motion.argmax())
    from adaptigraph_tpu.ops.fps import fps_numpy

    idx = fps_numpy(grid, n_sample, start_idx=start)
    return grid[idx]
