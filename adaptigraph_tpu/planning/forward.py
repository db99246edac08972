"""Batched forward dynamics for MPPI — the hottest path in the framework.

Re-implements the reference's ``dynamics`` / ``dynamics_masked``
(reference: ``src/planning/forward_dynamics.py:12-399``) TPU-first:

- the whole (samples x look-ahead x push-substeps) rollout is ONE jitted
  program: ``vmap`` over samples, Python loop over the (static, small)
  look-ahead horizon, ``lax.scan`` over push substeps
- variable integer ``action_repeat`` per sample becomes a masked fixed-length
  scan to the static bound ``max_repeat`` (= ceil of the action length upper
  limit): every sample steps in lock-step and records its state at substep
  ``ai == repeat`` (forward_dynamics.py:156-161 semantics)
- per-substep edge rebuild is the batched static-shape kernel — the
  reference's biggest cost (O(B·N²) + host sync per substep) stays on-device
  with zero host round-trips per solve
- eef "re-sticking": after each substep the eef keypoints snap to the
  object's current min-y (dynamics, forward_dynamics.py:163-166) or masked
  mean-y (dynamics_masked, forward_dynamics.py:359)
"""

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, forward
from adaptigraph_tpu.ops.graph import EdgeConfig, build_neighbor_graph
from adaptigraph_tpu.planning.actions import decode_action


@dataclasses.dataclass(frozen=True)
class DynamicsConfig:
    """Static planning-time dynamics parameters (reference: the task_config
    fields read at forward_dynamics.py:12-30 and config/planning/*.yaml)."""

    gnn: GNNConfig
    edge: EdgeConfig
    n_his: int
    push_length: float = 0.1
    sim_real_ratio: float = 10.0
    max_repeat: int = 15  # static bound: ceil(action_upper_lim[3])
    pusher_offsets: tuple = ()  # lateral offsets of the pusher points (5-pt board)
    gripper_enable: bool = False
    adj_thresh: float = 0.5
    use_mean_y: bool = False  # dynamics_masked uses masked mean-y re-sticking

    def __post_init__(self):
        # n_his mirrors gnn.n_his (kept as a field for config-dict symmetry
        # with the reference task_config); they must agree
        assert self.n_his == self.gnn.n_his, (self.n_his, self.gnn.n_his)


def _pusher_keypoints(cfg: DynamicsConfig, decoded, theta, y):
    """eef keypoints + per-substep delta for one sample at one look-ahead step
    (reference: forward_dynamics.py:42-78).

    decoded: (4,) [x0, z0, x1, z1]; y: scalar height. Returns
    (n_eef, 3) keypoints and (n_eef, 3) delta.
    """
    n_eef = cfg.gnn.max_neef
    delta = jnp.stack([decoded[2] - decoded[0], 0.0 * decoded[0], decoded[3] - decoded[1]])
    if cfg.pusher_offsets and len(cfg.pusher_offsets) > 1:
        # board pusher: points spread laterally by the configured offsets
        # (reference uses pusher_points[j][1] as the lateral offset,
        # forward_dynamics.py:64-75)
        offs = jnp.asarray(cfg.pusher_offsets, jnp.float32) * cfg.sim_real_ratio
        xs = decoded[0] + offs * jnp.sin(theta)
        zs = decoded[1] - offs * jnp.cos(theta)
        kp = jnp.stack([xs, jnp.full_like(xs, y), zs], axis=-1)  # (n_eef, 3)
    else:
        kp = jnp.stack([decoded[0], y, decoded[1]])[None]  # (1, 3)
        kp = jnp.broadcast_to(kp, (n_eef, 3))
    if cfg.gripper_enable:
        kp = kp.at[:, 1].add(0.01 * cfg.sim_real_ratio)  # forward_dynamics.py:80-81
    return kp, jnp.broadcast_to(delta[None], (n_eef, 3))


def _spb_for(gnn, edge):
    """samples-per-block for the fused kernels: S=8 is the measured v5e sweet
    spot, backed off while the edge-row working set exceeds the raised
    in-kernel VMEM limit (~18k rows). ADAPTIGRAPH_SPB overrides for tuning
    sweeps (scripts/profile_kernel_parts.py)."""
    import os

    env = os.environ.get("ADAPTIGRAPH_SPB")
    if env:
        return int(env)
    Np8 = (gnn.n_nodes + 7) // 8 * 8
    return next((s for s in (8, 4, 2, 1) if s * edge.topk * Np8 <= 18000), 1)


def _obj_y(cfg, obj, obj_mask):
    if cfg.use_mean_y:
        m = obj_mask.astype(obj.dtype)
        return jnp.sum(obj[:, 1] * m) / jnp.maximum(jnp.sum(m), 1.0)
    big = jnp.where(obj_mask, obj[:, 1], jnp.inf)
    return jnp.min(big)


def _single_sample_rollout(params, cfg: DynamicsConfig, state0, obj_mask, action_seq, physics_param):
    """Rollout one action sequence from one object state.

    state0: (max_nobj, 3); action_seq: (L, 4). Returns (L, max_nobj, 3).
    """
    gnn = cfg.gnn
    edge = cfg.edge
    max_nobj, n_eef = gnn.max_nobj, gnn.max_neef
    N = gnn.n_nodes
    L = action_seq.shape[0]

    decoded, repeat = decode_action(action_seq[None], cfg.push_length)
    decoded, repeat = decoded[0], repeat[0]  # (L, 4), (L,)

    state_mask = jnp.concatenate([obj_mask, jnp.ones(n_eef, bool)])
    eef_mask = jnp.concatenate([jnp.zeros(max_nobj, bool), jnp.ones(n_eef, bool)])

    attrs = jnp.zeros((N, 2)).at[:max_nobj, 0].set(obj_mask.astype(jnp.float32)).at[max_nobj:, 1].set(1.0)
    p_instance = jnp.zeros((max_nobj, 1)).at[:, 0].set(obj_mask.astype(jnp.float32))

    obj = state0
    outs = []
    for li in range(L):
        y = _obj_y(cfg, obj, obj_mask)
        kp, delta = _pusher_keypoints(cfg, decoded[li], action_seq[li, 2], y)

        hist = jnp.zeros((cfg.n_his, N, 3))
        hist = hist.at[:, :max_nobj].set(obj[None])
        hist = hist.at[:, max_nobj:].set(kp[None])
        action = jnp.zeros((N, 3)).at[max_nobj:].set(delta)

        def substep(carry, ai):
            hist, recorded = carry
            nbrs, mask = build_neighbor_graph(
                hist[-1], state_mask, eef_mask, cfg.adj_thresh, edge
            )
            graph = {
                "state": hist,
                "attrs": attrs,
                "neighbors": nbrs,
                "nbr_mask": mask,
                "action": action,
                "p_instance": p_instance,
                "physics_param": physics_param,
            }
            pred, _ = forward(params, graph, gnn)
            recorded = jnp.where(repeat[li] == ai, pred, recorded)
            # eef advances by its delta, re-stuck to the object height
            # (forward_dynamics.py:163-168)
            y_cur = _obj_y(cfg, pred, obj_mask)
            y_cur = y_cur + (0.01 * cfg.sim_real_ratio if cfg.gripper_enable else 0.0)
            eef_cur = hist[-1, max_nobj:] + action[max_nobj:]
            eef_cur = eef_cur.at[:, 1].set(y_cur)
            nxt = jnp.concatenate([pred, eef_cur], axis=0)
            hist = jnp.concatenate([hist[1:], nxt[None]], axis=0)
            return (hist, recorded), None

        # under shard_map the recorded-state carry must start with the same
        # varying-manual-axes as its update (which depends on the sharded
        # action); adding an exact zero of the action ties them together
        recorded0 = obj + 0.0 * decoded[li, 0]
        (hist, recorded), _ = jax.lax.scan(
            substep, (hist, recorded0), jnp.arange(1, cfg.max_repeat + 1)
        )
        obj = recorded
        outs.append(recorded)
    return jnp.stack(outs, axis=0)  # (L, max_nobj, 3)


@functools.partial(jax.jit, static_argnames=("cfg",))
def dynamics_rollout(params, state, action_seqs, physics_param, cfg: DynamicsConfig):
    """MPPI batched forward model (reference: forward_dynamics.py:12-205).

    Args:
      state: (max_nobj, 3) current object particles (all valid).
      action_seqs: (n_sample, L, 4).
      physics_param: (phys_dim,).

    Returns dict with state_seqs (n_sample, L, max_nobj, 3) and decoded
    action_seqs, mirroring the reference's output dict.
    """
    obj_mask = jnp.ones(cfg.gnn.max_nobj, bool)
    roll = jax.vmap(lambda a: _single_sample_rollout(params, cfg, state, obj_mask, a, physics_param))
    state_seqs = roll(action_seqs)
    decoded, _ = decode_action(action_seqs, cfg.push_length)
    return {"state_seqs": state_seqs, "action_seqs": decoded}


@functools.partial(jax.jit, static_argnames=("cfg", "use_fused", "compute_dtype",
                                              "dynamic_substeps",
                                              "fused_substeps", "interpret"))
def dynamics_rollout_batched(params, state, action_seqs, physics_param,
                             cfg: DynamicsConfig, use_fused=True,
                             compute_dtype=jnp.bfloat16,
                             dynamic_substeps=True, fused_substeps=True,
                             interpret=False):
    """Batch-level MPPI forward model; semantics of :func:`dynamics_rollout`
    but with the whole sample batch advanced together per substep, so the
    forward can run through the fused Pallas kernel
    (``ops.fused_gnn.fused_forward_batch``) instead of a vmapped per-sample
    program — ablated ~2.4x faster per substep at MPPI chunk sizes.

    With ``use_fused=False`` it uses the XLA ``forward_batch`` (autodiff-able,
    CPU-testable); both paths are parity-tested vs ``dynamics_rollout``.

    ``dynamic_substeps``: run each look-ahead step's substep loop as a
    ``lax.while_loop`` to the BATCH max repeat instead of a fixed scan to the
    static ``max_repeat`` bound. Identical results (substeps past a sample's
    own repeat only advance its unused history); when the caller sorts
    samples by repeat so low-repeat samples share a chunk (mppi_solve does),
    a uniform 5..15-repeat budget drops ~30% of the substep work.
    """
    from adaptigraph_tpu.models.gnn import forward_batch
    from adaptigraph_tpu.ops.fused_gnn import (fused_forward_batch,
                                               fused_rollout_chunk)
    from adaptigraph_tpu.ops.graph import build_neighbor_graph_batch

    gnn, edge = cfg.gnn, cfg.edge
    max_nobj, n_eef, N = gnn.max_nobj, gnn.max_neef, gnn.n_nodes
    B, L = action_seqs.shape[0], action_seqs.shape[1]

    decoded, repeat = decode_action(action_seqs, cfg.push_length)  # (B,L,4),(B,L)

    obj_mask = jnp.ones(max_nobj, bool)
    state_mask = jnp.broadcast_to(
        jnp.concatenate([obj_mask, jnp.ones(n_eef, bool)])[None], (B, N))
    eef_mask = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros(max_nobj, bool), jnp.ones(n_eef, bool)])[None], (B, N))
    attrs = jnp.zeros((N, 2)).at[:max_nobj, 0].set(1.0).at[max_nobj:, 1].set(1.0)
    attrs = jnp.broadcast_to(attrs[None], (B, N, 2))
    p_instance = jnp.broadcast_to(jnp.ones((max_nobj, 1))[None], (B, max_nobj, 1))
    phys = jnp.broadcast_to(physics_param[None], (B,) + physics_param.shape)

    # policy "none" + all-valid object slots: the kernel can build the
    # radius∧topk graph itself, skipping the XLA edge pass entirely
    kernel_edges = use_fused and edge.policy == "none"
    if kernel_edges:
        spb = _spb_for(gnn, edge)

    batched_y = (lambda o: jnp.mean(o, axis=1)) if cfg.use_mean_y else (
        lambda o: jnp.min(o, axis=1))

    if kernel_edges and fused_substeps:
        # whole-chunk path: each look-ahead step's entire substep loop is ONE
        # kernel launch (history shift, edge rebuild, forward, eef re-stick
        # all in VMEM) — no per-substep XLA glue or DMA round trips
        glift = 0.01 * cfg.sim_real_ratio if cfg.gripper_enable else 0.0
        obj = jnp.broadcast_to(state[None], (B, max_nobj, 3))
        outs = []
        for li in range(L):
            y = batched_y(obj[..., 1])
            kp, delta = jax.vmap(
                lambda d, th, yy: _pusher_keypoints(cfg, d, th, yy)
            )(decoded[:, li], action_seqs[:, li, 2], y)
            obj = fused_rollout_chunk(
                params, obj, kp, delta, repeat[:, li], physics_param, gnn,
                adj_radius=float(cfg.adj_thresh), edge_topk=edge.topk,
                max_repeat=cfg.max_repeat, gripper_lift=glift,
                mean_y=cfg.use_mean_y, interpret=interpret,
                compute_dtype=compute_dtype, samples_per_block=spb)
            outs.append(obj)
        return {"state_seqs": jnp.stack(outs, axis=1), "action_seqs": decoded}

    if kernel_edges:
        fwd = lambda g: fused_forward_batch(
            params, g, gnn, compute_dtype=compute_dtype, build_edges=True,
            adj_radius=float(cfg.adj_thresh), edge_topk=edge.topk,
            samples_per_block=spb, want_motion=False, interpret=interpret)
    elif use_fused:
        fwd = lambda g: fused_forward_batch(
            params, g, gnn, compute_dtype=compute_dtype, interpret=interpret,
            k_used=edge.topk + edge.max_neef, want_motion=False)
    else:
        fwd = lambda g: forward_batch(params, g, gnn, compute_dtype=compute_dtype)

    obj = jnp.broadcast_to(state[None], (B, max_nobj, 3))
    outs = []
    for li in range(L):
        y = batched_y(obj[..., 1])  # (B,) all-valid min-y (or mean-y)
        kp, delta = jax.vmap(
            lambda d, th, yy: _pusher_keypoints(cfg, d, th, yy)
        )(decoded[:, li], action_seqs[:, li, 2], y)

        hist = jnp.zeros((B, cfg.n_his, N, 3))
        hist = hist.at[:, :, :max_nobj].set(obj[:, None])
        hist = hist.at[:, :, max_nobj:].set(kp[:, None])
        action = jnp.zeros((B, N, 3)).at[:, max_nobj:].set(delta)

        def substep(carry, ai):
            hist, recorded = carry
            graph = {
                "state": hist,
                "attrs": attrs,
                "action": action,
                "p_instance": p_instance,
                "physics_param": phys,
            }
            if not kernel_edges:
                nbrs, mask = build_neighbor_graph_batch(
                    hist[:, -1], state_mask, eef_mask, cfg.adj_thresh, edge
                )
                graph["neighbors"] = nbrs
                graph["nbr_mask"] = mask
            pred, _ = fwd(graph)
            recorded = jnp.where((repeat[:, li] == ai)[:, None, None], pred, recorded)
            y_cur = batched_y(pred[..., 1])
            y_cur = y_cur + (0.01 * cfg.sim_real_ratio if cfg.gripper_enable else 0.0)
            eef_cur = hist[:, -1, max_nobj:] + action[:, max_nobj:]
            eef_cur = eef_cur.at[..., 1].set(y_cur[:, None])
            nxt = jnp.concatenate([pred, eef_cur], axis=1)
            hist = jnp.concatenate([hist[:, 1:], nxt[:, None]], axis=1)
            return (hist, recorded), None

        recorded0 = obj + 0.0 * decoded[:, li, :1, None]
        if dynamic_substeps:
            # clamp to the static bound for exact scan-path parity
            r_max = jnp.minimum(jnp.max(repeat[:, li]), cfg.max_repeat)

            def w_cond(carry):
                return carry[2] <= r_max

            def w_body(carry):
                hist, recorded, ai = carry
                (hist, recorded), _ = substep((hist, recorded), ai)
                return (hist, recorded, ai + 1)

            hist, obj, _ = jax.lax.while_loop(
                w_cond, w_body, (hist, recorded0, jnp.int32(1)))
        else:
            (hist, obj), _ = jax.lax.scan(
                substep, (hist, recorded0), jnp.arange(1, cfg.max_repeat + 1)
            )
        outs.append(obj)
    state_seqs = jnp.stack(outs, axis=1)  # (B, L, max_nobj, 3)
    return {"state_seqs": state_seqs, "action_seqs": decoded}


@functools.partial(jax.jit, static_argnames=("cfg", "use_fused", "interpret"))
def dynamics_masked(params, state_init, state_mask, actions, physics_params,
                    cfg: DynamicsConfig, use_fused=False, interpret=False):
    """Per-sample masked variant for physics identification
    (reference: forward_dynamics.py:209-399): each batch element has its own
    point cloud + mask and a single action; physics params may also be
    batched (one candidate per element), enabling population evaluation.

    Args:
      state_init: (B, max_nobj, 3); state_mask: (B, max_nobj) bool.
      actions: (B, 4); physics_params: (B, phys_dim) or (phys_dim,).
      use_fused: route through the whole-chunk Pallas kernel in masked mode
        (TPU hot path for the physics optimizer); requires policy "none".

    Returns (B, max_nobj, 3) predicted states after each push.
    """
    if physics_params.ndim == 1:
        physics_params = jnp.broadcast_to(physics_params[None], (state_init.shape[0],) + physics_params.shape)
    mcfg = dataclasses.replace(cfg, use_mean_y=True)

    if use_fused and cfg.edge.policy == "none":
        from adaptigraph_tpu.ops.fused_gnn import fused_rollout_chunk

        decoded, repeat = decode_action(actions[:, None, :], cfg.push_length)
        m = state_mask.astype(jnp.float32)
        y0 = jnp.sum(state_init[..., 1] * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0)
        kp, delta = jax.vmap(
            lambda d, th, yy: _pusher_keypoints(mcfg, d, th, yy)
        )(decoded[:, 0], actions[:, 2], y0)
        glift = 0.01 * cfg.sim_real_ratio if cfg.gripper_enable else 0.0
        return fused_rollout_chunk(
            params, state_init, kp, delta, repeat[:, 0], physics_params,
            cfg.gnn, adj_radius=float(cfg.adj_thresh), edge_topk=cfg.edge.topk,
            max_repeat=cfg.max_repeat, gripper_lift=glift,
            obj_mask=state_mask, mean_y=True, interpret=interpret,
            samples_per_block=_spb_for(cfg.gnn, cfg.edge))

    def one(s, m, a, p):
        out = _single_sample_rollout(params, mcfg, s, m, a[None], p)
        return out[0]

    return jax.vmap(one)(state_init, state_mask, actions, physics_params)
