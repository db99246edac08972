"""Planning cost and penalty functions (JAX).

Re-implements the reference cost library (``src/planning/losses.py``) with
mask support so every function is static-shape and vmap/shard_map friendly.
"""

import jax
import jax.numpy as jnp


def chamfer(x, y, x_mask=None, y_mask=None, eps=1e-12):
    """Symmetric Chamfer distance (reference: losses.py:4-10).

    x: (..., N, D), y: (..., M, D); optional bool masks (..., N) / (..., M).
    Returns (...,). Uses mean of nearest-neighbor *euclidean* distances in
    both directions, matching the reference (torch.norm then min then mean).
    """
    diff = x[..., :, None, :] - y[..., None, :, :]  # (..., N, M, D)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps)  # (..., N, M)
    if x_mask is not None:
        dist = jnp.where(x_mask[..., :, None], dist, jnp.inf)
    if y_mask is not None:
        dist = jnp.where(y_mask[..., None, :], dist, jnp.inf)

    d_xy = jnp.min(dist, axis=-1)  # (..., N) nearest y for each x
    d_yx = jnp.min(dist, axis=-2)  # (..., M) nearest x for each y

    if x_mask is not None:
        d_xy = jnp.where(x_mask, d_xy, 0.0)
        n_x = jnp.maximum(jnp.sum(x_mask, axis=-1), 1)
    else:
        n_x = x.shape[-2]
    if y_mask is not None:
        d_yx = jnp.where(y_mask, d_yx, 0.0)
        n_y = jnp.maximum(jnp.sum(y_mask, axis=-1), 1)
    else:
        n_y = y.shape[-2]

    return jnp.sum(d_xy, axis=-1) / n_x + jnp.sum(d_yx, axis=-1) / n_y


def masked_chamfer(state_pred, state_real, pred_mask, real_mask):
    """Per-sample masked Chamfer (reference: losses.py:12-24 ``mean_chamfer``).

    The reference loops over the batch on the host; here it is one batched
    masked call. state_pred/state_real: (B, N, 3); masks (B, N) bool.
    Returns (B,).
    """
    return chamfer(state_pred, state_real, pred_mask, real_mask)


def box_loss(state, target, mask=None):
    """Mean planar distance of particles to a target box
    (reference: losses.py:26-35).

    state: (..., N, 3); target: (2, 2) [[xmin, xmax], [zmin, zmax]].
    """
    xmin, xmax = target[0, 0], target[0, 1]
    zmin, zmax = target[1, 0], target[1, 1]
    x = state[..., 0]
    z = state[..., 2]
    x_diff = jnp.maximum(xmin - x, 0.0) + jnp.maximum(x - xmax, 0.0)
    z_diff = jnp.maximum(zmin - z, 0.0) + jnp.maximum(z - zmax, 0.0)
    r = jnp.sqrt(x_diff**2 + z_diff**2)
    if mask is not None:
        r = jnp.where(mask, r, 0.0)
        return jnp.sum(r, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1)
    return jnp.mean(r, axis=-1)


def rope_penalty(state_pred, action, state_init, sim_real_ratio=10.0):
    """Keep the pusher start near the rope (reference: losses.py:37-48).

    state_pred: (B, L, N, 3); action: (B, L, 4); state_init: (N, 3).
    Returns (B, L) collision penalty in [0, 1].
    """
    B, L = action.shape[0], action.shape[1]
    pt = jnp.stack([action[..., 0], action[..., 1]], axis=-1)  # (B, L, 2)
    init_2d = jnp.broadcast_to(state_init[None, None, :, [0, 2]], (B, 1) + state_init.shape[:1] + (2,))
    state_2d = jnp.concatenate([init_2d, state_pred[:, :-1][..., [0, 2]]], axis=1)  # (B, L, N, 2)
    d = jnp.linalg.norm(pt[:, :, None] - state_2d, axis=-1).min(axis=-1)  # (B, L)
    pusher_size = 0.02 * sim_real_ratio
    d = jnp.maximum(d - pusher_size, 0.0)
    return jnp.exp(-d * 100.0)


def cloth_penalty(state_pred, action, state_init, sim_real_ratio=10.0):
    """Encourage the gripper to grasp near the cloth edge
    (reference: losses.py:50-64)."""
    pt = jnp.stack([action[..., 0], action[..., 1]], axis=-1)  # (B, L, 2)
    state_2d = state_init[:, [0, 2]]  # (N, 2)
    d = jnp.linalg.norm(pt[:, :, None] - state_2d[None, None], axis=-1)  # (B, L, N)
    d_min = jnp.maximum(d.min(axis=-1) - 0.005 * sim_real_ratio, 0.0)
    d_max = jnp.minimum(d.max(axis=-1), 0.4 * sim_real_ratio)
    d_max = d_max / jnp.maximum(d_max.max(), 1e-6)
    return 1.0 - jnp.exp(-d_min * 100.0) - d_max * 0.2


def granular_penalty(state_pred, action, state_init, sim_real_ratio=10.0):
    """9-point board-sweep proximity penalty (reference: losses.py:66-92)."""
    B, L = action.shape[0], action.shape[1]
    x0 = action[..., 0]
    z0 = action[..., 1]
    theta = action[..., 2]
    pusher_radius = 0.05 * sim_real_ratio
    dx = pusher_radius * jnp.sin(theta)
    dz = -pusher_radius * jnp.cos(theta)
    fracs = jnp.linspace(-1.0, 1.0, 9)
    pts = jnp.stack(
        [x0[..., None] + fracs * dx[..., None], z0[..., None] + fracs * dz[..., None]], axis=-1
    )  # (B, L, 9, 2)
    init_2d = jnp.broadcast_to(state_init[None, None, :, [0, 2]], (B, 1) + state_init.shape[:1] + (2,))
    state_2d = jnp.concatenate([init_2d, state_pred[:, :-1][..., [0, 2]]], axis=1)  # (B, L, N, 2)
    d = jnp.linalg.norm(pts[:, :, :, None] - state_2d[:, :, None], axis=-1)  # (B, L, 9, N)
    d = d.min(axis=-1).min(axis=-1)  # (B, L)
    d = jnp.maximum(d - 0.02 * sim_real_ratio, 0.0)
    return jnp.exp(-d * 100.0)


def bbox_penalty(state, bbox):
    """Workspace bounding-box exp penalty (reference: plan.py:41-51).

    state: (B, L, N, 3); bbox: (2, 2). Returns (B, L)."""
    xmax = state[..., 0].max(axis=-1)
    xmin = state[..., 0].min(axis=-1)
    zmax = state[..., 2].max(axis=-1)
    zmin = state[..., 2].min(axis=-1)
    pens = jnp.stack(
        [
            jnp.maximum(xmin - bbox[0, 0], 0.0),
            jnp.maximum(bbox[0, 1] - xmax, 0.0),
            jnp.maximum(zmin - bbox[1, 0], 0.0),
            jnp.maximum(bbox[1, 1] - zmax, 0.0),
        ],
        axis=-1,
    )
    return jnp.exp(-pens * 100.0).max(axis=-1)


def hausdorff(x, y, x_mask=None, y_mask=None, eps=1e-12):
    """Symmetric Hausdorff distance (reference: src/dynamics/gnn/loss.py:63-80):
    max (instead of mean) of directed nearest-neighbor distances, summed both
    ways. x: (..., N, D), y: (..., M, D) -> (...,)."""
    diff = x[..., :, None, :] - y[..., None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps)
    if x_mask is not None:
        dist = jnp.where(x_mask[..., :, None], dist, jnp.inf)
    if y_mask is not None:
        dist = jnp.where(y_mask[..., None, :], dist, jnp.inf)
    d_xy = jnp.min(dist, axis=-1)
    d_yx = jnp.min(dist, axis=-2)
    if x_mask is not None:
        d_xy = jnp.where(x_mask, d_xy, -jnp.inf)
    if y_mask is not None:
        d_yx = jnp.where(y_mask, d_yx, -jnp.inf)
    return jnp.max(d_xy, axis=-1) + jnp.max(d_yx, axis=-1)


def emd_hungarian(x, y):
    """Earth mover's distance by exact assignment (reference:
    src/dynamics/gnn/loss.py:25-60 EarthMoverLoss, which runs scipy's
    Hungarian per batch element on the host). Host-side numpy; use
    :func:`emd_sinkhorn` for an on-device differentiable surrogate.

    x, y: (B, N, D) equal-size point sets -> (B,) mean matched distance.
    """
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    x = np.asarray(x)
    y = np.asarray(y)
    out = np.zeros(x.shape[0], np.float32)
    for i in range(x.shape[0]):
        cost = np.linalg.norm(x[i][:, None, :] - y[i][None, :, :], axis=-1)
        r, c = linear_sum_assignment(cost)
        out[i] = cost[r, c].mean()
    return out


def emd_sinkhorn(x, y, epsilon=0.02, n_iters=50):
    """Entropy-regularized EMD (Sinkhorn) — the TPU-native, differentiable
    stand-in for the reference's host-side Hungarian loop: fixed iteration
    count, static shapes, batched. Converges to emd_hungarian as epsilon -> 0.

    x, y: (B, N, D) -> (B,) transport cost under the Sinkhorn plan.
    """
    diff = x[:, :, None, :] - y[:, None, :, :]
    C = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)  # (B, N, M)
    B, N, M = C.shape
    log_a = jnp.full((B, N), -jnp.log(N))
    log_b = jnp.full((B, M), -jnp.log(M))
    f = jnp.zeros((B, N))
    g = jnp.zeros((B, M))

    def body(carry, _):
        f, g = carry
        # log-domain Sinkhorn updates
        f = -epsilon * jax.scipy.special.logsumexp(
            (g[:, None, :] - C) / epsilon + log_b[:, None, :], axis=-1)
        g = -epsilon * jax.scipy.special.logsumexp(
            (f[:, :, None] - C) / epsilon + log_a[:, :, None], axis=-2)
        return (f, g), None

    (f, g), _ = jax.lax.scan(body, (f, g), None, length=n_iters)
    P = jnp.exp((f[:, :, None] + g[:, None, :] - C) / epsilon
                + log_a[:, :, None] + log_b[:, None, :])
    return jnp.sum(P * C, axis=(-2, -1))
