"""Parity of the fused Pallas forward vs the XLA reference forward
(interpret mode on CPU; the real-TPU run is exercised by bench/verify)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, init_params, forward_batch
from adaptigraph_tpu.ops.fused_gnn import fused_forward_batch
from adaptigraph_tpu.ops.graph import EdgeConfig, build_neighbor_graph_batch

CFG = GNNConfig(n_his=4, max_nobj=24, max_neef=2, nf_particle=32, nf_relation=32,
                nf_effect=32, pstep=3)
ECFG = EdgeConfig(max_nobj=24, max_neef=2, topk=6)


def make_batch(B=3, seed=0):
    rng = np.random.RandomState(seed)
    N = CFG.n_nodes
    state = jnp.asarray(rng.randn(B, 4, N, 3).astype(np.float32) * 0.4)
    node_mask = np.ones((B, N), bool)
    node_mask[:, 20:24] = False  # padded object slots
    tool_mask = np.zeros((B, N), bool)
    tool_mask[:, 24:] = True
    nbrs, mask = build_neighbor_graph_batch(
        state[:, -1], jnp.asarray(node_mask), jnp.asarray(tool_mask), 0.6, ECFG
    )
    attrs = np.zeros((B, N, 2), np.float32)
    attrs[:, :20, 0] = 1.0
    attrs[:, 24:, 1] = 1.0
    p_inst = np.zeros((B, 24, 1), np.float32)
    p_inst[:, :20] = 1.0
    action = np.zeros((B, N, 3), np.float32)
    action[:, 24:] = rng.randn(B, 2, 3) * 0.1
    return {
        "state": state,
        "attrs": jnp.asarray(attrs),
        "neighbors": nbrs,
        "nbr_mask": mask,
        "action": jnp.asarray(action),
        "p_instance": jnp.asarray(p_inst),
        "physics_param": jnp.asarray(rng.rand(B, 1).astype(np.float32)),
    }


def test_fused_matches_forward():
    params = init_params(jax.random.PRNGKey(0), CFG)
    graphs = make_batch()
    want_pos, want_mot = forward_batch(params, graphs, CFG)
    got_pos, got_mot = fused_forward_batch(params, graphs, CFG,
                                           compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got_pos), np.asarray(want_pos), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_mot), np.asarray(want_mot), rtol=2e-4, atol=2e-4)


def test_fused_bf16_close():
    params = init_params(jax.random.PRNGKey(1), CFG)
    graphs = make_batch(seed=2)
    want_pos, _ = forward_batch(params, graphs, CFG)
    got_pos, _ = fused_forward_batch(params, graphs, CFG,
                                     compute_dtype=jnp.bfloat16, interpret=True)
    # bf16 has ~2-3 decimal digits; positions are O(1)
    np.testing.assert_allclose(np.asarray(got_pos), np.asarray(want_pos), atol=0.05)


def test_fused_per_particle_physics():
    params = init_params(jax.random.PRNGKey(2), CFG)
    graphs = make_batch(seed=3)
    rng = np.random.RandomState(3)
    graphs["physics_param"] = jnp.asarray(rng.rand(3, CFG.max_nobj).astype(np.float32))
    want_pos, _ = forward_batch(params, graphs, CFG)
    got_pos, _ = fused_forward_batch(params, graphs, CFG,
                                     compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got_pos), np.asarray(want_pos), rtol=2e-4, atol=2e-4)


def test_fused_multi_sample_block_and_k_used():
    """S>1 blocks and k_used slot compaction must not change results."""
    params = init_params(jax.random.PRNGKey(4), CFG)
    graphs = make_batch(B=8, seed=5)
    want_pos, want_mot = forward_batch(params, graphs, CFG)
    got_pos, got_mot = fused_forward_batch(
        params, graphs, CFG, compute_dtype=jnp.float32, interpret=True,
        samples_per_block=4, k_used=ECFG.topk + ECFG.max_neef)
    np.testing.assert_allclose(np.asarray(got_pos), np.asarray(want_pos), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_mot), np.asarray(want_mot), rtol=2e-4, atol=2e-4)


def test_fused_in_kernel_edge_build():
    """build_edges=True must reproduce the XLA edge build + forward exactly
    (policy none, all object slots valid — the MPPI rollout case)."""
    params = init_params(jax.random.PRNGKey(6), CFG)
    B, N = 4, CFG.n_nodes
    rng = np.random.RandomState(7)
    state = jnp.asarray(rng.randn(B, 4, N, 3).astype(np.float32) * 0.4)
    node_mask = jnp.ones((B, N), bool)
    tool_mask = jnp.zeros((B, N), bool).at[:, CFG.max_nobj:].set(True)
    adj = 0.6
    nbrs, mask = build_neighbor_graph_batch(state[:, -1], node_mask, tool_mask,
                                            adj, ECFG)
    attrs = jnp.zeros((B, N, 2)).at[:, :CFG.max_nobj, 0].set(1.0).at[:, CFG.max_nobj:, 1].set(1.0)
    graphs = {
        "state": state,
        "attrs": attrs,
        "neighbors": nbrs,
        "nbr_mask": mask,
        "action": jnp.zeros((B, N, 3)).at[:, CFG.max_nobj:].set(0.05),
        "p_instance": jnp.ones((B, CFG.max_nobj, 1)),
        "physics_param": jnp.full((B, 1), 0.5),
    }
    want_pos, want_mot = forward_batch(params, graphs, CFG)
    g2 = {k: v for k, v in graphs.items() if k not in ("neighbors", "nbr_mask")}
    got_pos, got_mot = fused_forward_batch(
        params, g2, CFG, compute_dtype=jnp.float32, interpret=True,
        build_edges=True, adj_radius=adj, edge_topk=ECFG.topk,
        samples_per_block=2)
    np.testing.assert_allclose(np.asarray(got_pos), np.asarray(want_pos),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_mot), np.asarray(want_mot),
                               rtol=2e-4, atol=2e-4)


def _chunk_reference(params, state, acts, phys, dcfg):
    """XLA reference for the whole-chunk kernel: the per-substep batched path."""
    from adaptigraph_tpu.planning.forward import dynamics_rollout_batched

    return dynamics_rollout_batched(params, state, acts, phys, dcfg,
                                    use_fused=False, compute_dtype=jnp.float32,
                                    fused_substeps=False)["state_seqs"]


def _chunk_fused(params, state, acts, phys, dcfg, spb):
    """Drive fused_rollout_chunk the way forward.py's fused-substep path does."""
    from adaptigraph_tpu.ops.fused_gnn import fused_rollout_chunk
    from adaptigraph_tpu.planning.actions import decode_action
    from adaptigraph_tpu.planning.forward import _pusher_keypoints

    B, L = acts.shape[0], acts.shape[1]
    decoded, repeat = decode_action(acts, dcfg.push_length)
    glift = 0.01 * dcfg.sim_real_ratio if dcfg.gripper_enable else 0.0
    obj = jnp.broadcast_to(state[None], (B, dcfg.gnn.max_nobj, 3))
    outs = []
    for li in range(L):
        y = jnp.min(obj[..., 1], axis=1)
        kp, delta = jax.vmap(
            lambda d, th, yy: _pusher_keypoints(dcfg, d, th, yy)
        )(decoded[:, li], acts[:, li, 2], y)
        obj = fused_rollout_chunk(
            params, obj, kp, delta, repeat[:, li], phys, dcfg.gnn,
            adj_radius=float(dcfg.adj_thresh), edge_topk=dcfg.edge.topk,
            max_repeat=dcfg.max_repeat, gripper_lift=glift,
            compute_dtype=jnp.float32, samples_per_block=spb, interpret=True)
        outs.append(obj)
    return jnp.stack(outs, axis=1)


def test_fused_rollout_chunk_matches_substep_path():
    """The whole-chunk in-kernel rollout must reproduce the per-substep XLA
    path (policy none, 1-pt pusher, varying integer repeats, 2 look-aheads)."""
    from adaptigraph_tpu.planning.forward import DynamicsConfig

    cfg = GNNConfig(n_his=4, max_nobj=24, max_neef=1, nf_particle=32,
                    nf_relation=32, nf_effect=32, pstep=2)
    ecfg = EdgeConfig(max_nobj=24, max_neef=1, topk=6)
    dcfg = DynamicsConfig(gnn=cfg, edge=ecfg, n_his=4, push_length=0.1,
                          sim_real_ratio=10.0, max_repeat=8, adj_thresh=0.6)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    state = jnp.asarray(rng.randn(24, 3).astype(np.float32) * 0.4)
    B = 8
    acts = jnp.asarray(np.stack(
        [rng.uniform(-1, 0, (B, 2)), rng.uniform(-1, 1, (B, 2)),
         rng.uniform(-np.pi, np.pi, (B, 2)), rng.uniform(2, 8, (B, 2))],
        axis=-1).astype(np.float32))
    phys = jnp.asarray([0.5])
    want = _chunk_reference(params, state, acts, phys, dcfg)
    got = _chunk_fused(params, state, acts, phys, dcfg, spb=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_rollout_chunk_board_pusher_gripper():
    """5-point board pusher + gripper lift through the whole-chunk kernel."""
    from adaptigraph_tpu.planning.forward import DynamicsConfig

    cfg = GNNConfig(n_his=4, max_nobj=24, max_neef=5, nf_particle=32,
                    nf_relation=32, nf_effect=32, pstep=2)
    ecfg = EdgeConfig(max_nobj=24, max_neef=5, topk=6)
    dcfg = DynamicsConfig(gnn=cfg, edge=ecfg, n_his=4, push_length=0.1,
                          sim_real_ratio=10.0, max_repeat=8, adj_thresh=0.6,
                          pusher_offsets=(-0.05, -0.025, 0.0, 0.025, 0.05),
                          gripper_enable=True)
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    state = jnp.asarray(rng.randn(24, 3).astype(np.float32) * 0.4)
    B = 4
    acts = jnp.asarray(np.stack(
        [rng.uniform(-1, 0, (B, 1)), rng.uniform(-1, 1, (B, 1)),
         rng.uniform(-np.pi, np.pi, (B, 1)), rng.uniform(2, 8, (B, 1))],
        axis=-1).astype(np.float32))
    phys = jnp.asarray([0.3])
    want = _chunk_reference(params, state, acts, phys, dcfg)
    got = _chunk_fused(params, state, acts, phys, dcfg, spb=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_rollout_chunk_masked_matches_dynamics_masked():
    """Masked mode (per-sample point clouds + mean-y re-sticking + per-sample
    physics candidates — the physics-optimizer path) must reproduce the
    vmapped XLA dynamics_masked."""
    from adaptigraph_tpu.planning.forward import DynamicsConfig, dynamics_masked

    cfg = GNNConfig(n_his=4, max_nobj=24, max_neef=1, nf_particle=32,
                    nf_relation=32, nf_effect=32, pstep=2)
    ecfg = EdgeConfig(max_nobj=24, max_neef=1, topk=6)
    dcfg = DynamicsConfig(gnn=cfg, edge=ecfg, n_his=4, push_length=0.1,
                          sim_real_ratio=10.0, max_repeat=8, adj_thresh=0.6)
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(3)
    B = 6
    state = jnp.asarray(rng.randn(B, 24, 3).astype(np.float32) * 0.4)
    mask = np.zeros((B, 24), bool)
    for i in range(B):
        mask[i, : rng.randint(12, 25)] = True
    state = state * jnp.asarray(mask)[..., None]
    phys = jnp.asarray(rng.rand(B, 1).astype(np.float32))
    # single substep: tight parity (the two paths differ only in f32
    # reduction order, ~5e-4 after one GNN forward)
    # longer pushes: the per-substep reduction-order noise amplifies through
    # the autoregressive loop, so the bound loosens with repeat count
    for length, atol in ((1.0, 2e-3), (4.0, 8e-3), (8.0, 3e-2)):
        acts = jnp.asarray(np.stack(
            [rng.uniform(-1, 0, B), rng.uniform(-1, 1, B),
             rng.uniform(-np.pi, np.pi, B), np.full(B, length)],
            axis=-1).astype(np.float32))
        want = dynamics_masked(params, state, jnp.asarray(mask), acts, phys, dcfg)
        got = dynamics_masked(params, state, jnp.asarray(mask), acts, phys, dcfg,
                              use_fused=True, interpret=True)
        w, g, m = np.asarray(want), np.asarray(got), mask[..., None]
        np.testing.assert_allclose(g * m, w * m, atol=atol)
