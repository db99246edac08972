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
