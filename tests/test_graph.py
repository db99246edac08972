"""Edge-set equivalence of the static neighbor graph vs the dense reference
algorithm (reference: src/dynamics/dataset/graph.py:68-298)."""

import numpy as np
import pytest

import jax.numpy as jnp

from adaptigraph_tpu.ops.graph import (
    EdgeConfig,
    build_neighbor_graph,
    build_neighbor_graph_batch,
    graph_to_edge_set,
    neighbor_gather,
    neighbor_aggregate,
)
from tests.oracles import dense_edges


def make_scene(rng, max_nobj=40, max_neef=3, n_obj=30, n_eef=2, scale=1.0):
    N = max_nobj + max_neef
    states = np.zeros((N, 3), dtype=np.float32)
    states[:n_obj] = rng.uniform(-scale, scale, size=(n_obj, 3))
    states[max_nobj : max_nobj + n_eef] = rng.uniform(-scale, scale, size=(n_eef, 3))
    node_mask = np.zeros(N, dtype=bool)
    node_mask[:n_obj] = True
    node_mask[max_nobj : max_nobj + n_eef] = True
    tool_mask = np.zeros(N, dtype=bool)
    tool_mask[max_nobj : max_nobj + n_eef] = True
    return states, node_mask, tool_mask


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("topk", [5, 10])
def test_radius_topk_matches_oracle(seed, topk):
    rng = np.random.RandomState(seed)
    states, node_mask, tool_mask = make_scene(rng)
    radius = 0.5

    cfg = EdgeConfig(max_nobj=40, max_neef=3, topk=topk, policy="none")
    nbrs, mask = build_neighbor_graph(states, node_mask, tool_mask, radius, cfg)
    got = graph_to_edge_set(nbrs, mask)

    want = dense_edges(states, radius, node_mask, tool_mask, topk)
    assert got == want


@pytest.mark.parametrize("seed", range(5))
def test_tools_all_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    states, node_mask, tool_mask = make_scene(rng)
    radius = 0.75

    cfg = EdgeConfig(max_nobj=40, max_neef=3, topk=5, policy="tools_all")
    nbrs, mask = build_neighbor_graph(states, node_mask, tool_mask, radius, cfg)
    got = graph_to_edge_set(nbrs, mask)

    want = dense_edges(states, radius, node_mask, tool_mask, 5, connect_tools_all=True)
    assert got == want


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("far", [False, True])
def test_tools_all_gated_matches_oracle(seed, far):
    rng = np.random.RandomState(seed)
    states, node_mask, tool_mask = make_scene(rng)
    if far:  # move the tool out of contact: gate should disconnect it entirely
        states[40:] += 100.0
    radius = 0.6

    cfg = EdgeConfig(max_nobj=40, max_neef=3, topk=5, policy="tools_all", gate_on_contact=True)
    nbrs, mask = build_neighbor_graph(states, node_mask, tool_mask, radius, cfg)
    got = graph_to_edge_set(nbrs, mask)

    want = dense_edges(
        states, radius, node_mask, tool_mask, 5, connect_tools_all=True, gate_on_contact=True
    )
    assert got == want
    if far:
        tool_edges = [e for e in got if e[0] >= 40 or e[1] >= 40]
        assert not tool_edges


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("knn_frac", [1.0, 0.6])
def test_non_fixed_matches_oracle(seed, knn_frac):
    rng = np.random.RandomState(seed)
    states, node_mask, tool_mask = make_scene(rng, scale=0.8)
    # lift object so some particles are above the bottom-10% threshold
    states[:30, 1] += 1.0
    states[40:, 1] += 1.0
    radius = 0.7

    cfg = EdgeConfig(max_nobj=40, max_neef=3, topk=8, policy="non_fixed")
    nbrs, mask = build_neighbor_graph(states, node_mask, tool_mask, radius, cfg, knn_frac=knn_frac)
    got = graph_to_edge_set(nbrs, mask)

    want = dense_edges(
        states,
        radius,
        node_mask,
        tool_mask,
        8,
        connect_non_fixed=True,
        knn_frac=knn_frac,
        max_nobj=40,
    )
    assert got == want


def test_batch_matches_single():
    rng = np.random.RandomState(7)
    B = 4
    scenes = [make_scene(np.random.RandomState(i)) for i in range(B)]
    states = np.stack([s[0] for s in scenes])
    node_mask = np.stack([s[1] for s in scenes])
    tool_mask = np.stack([s[2] for s in scenes])
    radii = rng.uniform(0.4, 0.6, size=B).astype(np.float32)

    cfg = EdgeConfig(max_nobj=40, max_neef=3, topk=6, policy="none")
    nbrs_b, mask_b = build_neighbor_graph_batch(states, node_mask, tool_mask, radii, cfg)
    for b in range(B):
        nbrs, mask = build_neighbor_graph(states[b], node_mask[b], tool_mask[b], radii[b], cfg)
        assert graph_to_edge_set(nbrs_b[b], mask_b[b]) == graph_to_edge_set(nbrs, mask)


def test_gather_aggregate_matches_dense_bmm():
    """neighbor_gather/aggregate reproduce Rs.bmm / Rr^T.bmm semantics."""
    rng = np.random.RandomState(3)
    states, node_mask, tool_mask = make_scene(rng)
    cfg = EdgeConfig(max_nobj=40, max_neef=3, topk=6, policy="none")
    nbrs, mask = build_neighbor_graph(states, node_mask, tool_mask, 0.5, cfg)
    nbrs, mask = np.asarray(nbrs), np.asarray(mask)

    F = 5
    x = rng.randn(43, F).astype(np.float32)

    # dense oracle
    edges = sorted(graph_to_edge_set(nbrs, mask))
    agg = np.zeros((43, F), dtype=np.float32)
    for r, s in edges:
        agg[r] += x[s]  # message = sender features; receiver-sum

    sender_feats = np.asarray(neighbor_gather(jnp.asarray(x), jnp.asarray(nbrs)))
    got = np.asarray(neighbor_aggregate(jnp.asarray(sender_feats), jnp.asarray(mask)))
    np.testing.assert_allclose(got, agg, rtol=1e-5, atol=1e-5)


def test_gather_batched():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 10, 4).astype(np.float32)
    nbrs = rng.randint(0, 10, size=(2, 10, 3)).astype(np.int32)
    out = np.asarray(neighbor_gather(jnp.asarray(x), jnp.asarray(nbrs)))
    for b in range(2):
        for i in range(10):
            for k in range(3):
                np.testing.assert_array_equal(out[b, i, k], x[b, nbrs[b, i, k]])


def test_degree_bound_is_static():
    cfg = EdgeConfig(max_nobj=40, max_neef=3, topk=6, policy="tools_all")
    assert cfg.K == 16  # 9 slots tile-aligned up to a multiple of 8
    rng = np.random.RandomState(0)
    states, node_mask, tool_mask = make_scene(rng)
    nbrs, mask = build_neighbor_graph(states, node_mask, tool_mask, 10.0, cfg)
    assert nbrs.shape == (43, 16)
    assert mask.shape == (43, 16)
    assert not np.asarray(mask)[:, 9:].any()  # padding slots always masked
