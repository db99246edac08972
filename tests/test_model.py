"""Golden tests: the (N,K)-graph GNN forward must reproduce the reference's
dense-incidence interaction network (reference: src/dynamics/gnn/model.py:130-342)
given the same weights and the same edge set."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, init_params, forward, forward_batch, count_params
from adaptigraph_tpu.ops.graph import EdgeConfig, build_neighbor_graph, graph_to_edge_set


def relu(x):
    return np.maximum(x, 0.0)


def dense_oracle(params, graph, cfg, edges):
    """Numpy re-derivation of model.py:130-342 using dense one-hot Rr/Rs."""
    p = jax.tree_util.tree_map(np.asarray, params)
    state = np.asarray(graph["state"], np.float64)  # (n_his, N, 3)
    attrs = np.asarray(graph["attrs"], np.float64)
    action = np.asarray(graph["action"], np.float64)
    p_instance = np.asarray(graph["p_instance"], np.float64)
    phys = np.asarray(graph["physics_param"], np.float64)

    N = cfg.n_nodes
    n_p, n_s = cfg.max_nobj, cfg.max_neef
    E = len(edges)
    Rr = np.zeros((E, N))
    Rs = np.zeros((E, N))
    for e, (r, s) in enumerate(sorted(edges)):
        Rr[e, r] = 1
        Rs[e, s] = 1

    state_res = state[1:] - state[:-1]
    state_norm = np.concatenate([state_res, state[-1:]], axis=0)  # (n_his, N, 3)
    state_norm_t = np.moveaxis(state_norm, 0, 1).reshape(N, cfg.n_his * 3)

    p_inputs = attrs
    if phys.ndim == 1 and phys.shape[0] == cfg.phys_dim:
        phys_p = np.repeat(phys[None, :], n_p, axis=0)
    else:
        phys_p = phys.reshape(n_p, cfg.phys_dim)
    phys_full = np.concatenate([phys_p, np.zeros((n_s, cfg.phys_dim))], axis=0)
    p_inputs = np.concatenate([p_inputs, phys_full, action], axis=1)

    rel_inputs = np.zeros((E, 0))
    # rel_attr (model.py:249-257)
    rel_inputs = np.concatenate([rel_inputs, Rr @ attrs, Rs @ attrs], axis=1)
    # rel_group (model.py:259-270)
    g = np.concatenate([p_instance, np.zeros((n_s, cfg.n_instance))], axis=0)
    group_diff = np.abs(Rr @ g - Rs @ g).sum(axis=1, keepdims=True)
    rel_inputs = np.concatenate([rel_inputs, group_diff], axis=1)
    # rel_distance (model.py:272-282)
    rel_inputs = np.concatenate([rel_inputs, Rr @ state_norm_t - Rs @ state_norm_t], axis=1)

    def mlp3(pp, x, final_relu):
        x = relu(x @ pp[0]["w"] + pp[0]["b"])
        x = relu(x @ pp[1]["w"] + pp[1]["b"])
        x = x @ pp[2]["w"] + pp[2]["b"]
        return relu(x) if final_relu else x

    particle_encode = mlp3(p["particle_encoder"], p_inputs, True)
    relation_encode = mlp3(p["relation_encoder"], rel_inputs, True)

    particle_effect = particle_encode
    for _ in range(cfg.pstep):
        eff_r = Rr @ particle_effect
        eff_s = Rs @ particle_effect
        x = np.concatenate([relation_encode, eff_r, eff_s], axis=1)
        effect_rel = relu(x @ p["relation_propagator"]["w"] + p["relation_propagator"]["b"])
        agg = Rr.T @ effect_rel
        y = np.concatenate([particle_encode, agg], axis=1)
        particle_effect = relu(
            y @ p["particle_propagator"]["w"] + p["particle_propagator"]["b"] + particle_effect
        )

    motion = mlp3(p["non_rigid_predictor"], particle_effect[:n_p], False)
    pred_pos = state[-1, :n_p] + np.clip(motion, -cfg.motion_clamp, cfg.motion_clamp)
    return pred_pos, motion


def make_graph(seed, cfg, n_obj=30, n_eef=None):
    rng = np.random.RandomState(seed)
    n_eef = n_eef if n_eef is not None else cfg.max_neef
    N = cfg.n_nodes
    state = np.zeros((cfg.n_his, N, 3), np.float32)
    traj = rng.uniform(-1, 1, size=(1, n_obj, 3)) + 0.05 * rng.randn(cfg.n_his, n_obj, 3)
    state[:, :n_obj] = traj
    state[:, cfg.max_nobj : cfg.max_nobj + n_eef] = rng.uniform(-1, 1, size=(1, n_eef, 3))

    node_mask = np.zeros(N, bool)
    node_mask[:n_obj] = True
    node_mask[cfg.max_nobj : cfg.max_nobj + n_eef] = True
    tool_mask = np.zeros(N, bool)
    tool_mask[cfg.max_nobj : cfg.max_nobj + n_eef] = True

    ecfg = EdgeConfig(max_nobj=cfg.max_nobj, max_neef=cfg.max_neef, topk=6, policy="none")
    nbrs, mask = build_neighbor_graph(state[-1], node_mask, tool_mask, 0.7, ecfg)

    attrs = np.zeros((N, 2), np.float32)
    attrs[:n_obj, 0] = 1
    attrs[cfg.max_nobj : cfg.max_nobj + n_eef, 1] = 1

    action = np.zeros((N, 3), np.float32)
    action[cfg.max_nobj : cfg.max_nobj + n_eef] = 0.1 * rng.randn(n_eef, 3)

    p_instance = np.zeros((cfg.max_nobj, 1), np.float32)
    p_instance[:n_obj, 0] = 1

    graph = {
        "state": jnp.asarray(state),
        "attrs": jnp.asarray(attrs),
        "neighbors": nbrs,
        "nbr_mask": mask,
        "action": jnp.asarray(action),
        "p_instance": jnp.asarray(p_instance),
        "physics_param": jnp.asarray(rng.rand(cfg.phys_dim).astype(np.float32)),
    }
    return graph, graph_to_edge_set(nbrs, mask)


CFG = GNNConfig(n_his=4, max_nobj=40, max_neef=2, nf_particle=32, nf_relation=32, nf_effect=32, pstep=3)


@pytest.mark.parametrize("seed", range(3))
def test_forward_matches_dense_oracle(seed):
    graph, edges = make_graph(seed, CFG)
    params = init_params(jax.random.PRNGKey(seed), CFG)
    pred_pos, motion = forward(params, graph, CFG)
    want_pos, want_motion = dense_oracle(params, graph, CFG, edges)
    np.testing.assert_allclose(np.asarray(pred_pos), want_pos, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(motion), want_motion, rtol=1e-4, atol=1e-4)


def test_per_particle_physics_param():
    graph, edges = make_graph(5, CFG)
    rng = np.random.RandomState(5)
    graph["physics_param"] = jnp.asarray(rng.rand(CFG.max_nobj).astype(np.float32))
    params = init_params(jax.random.PRNGKey(1), CFG)
    pred_pos, motion = forward(params, graph, CFG)
    want_pos, _ = dense_oracle(params, graph, CFG, edges)
    np.testing.assert_allclose(np.asarray(pred_pos), want_pos, rtol=1e-4, atol=1e-4)


def test_physics_param_conditions_output():
    graph, _ = make_graph(2, CFG)
    params = init_params(jax.random.PRNGKey(0), CFG)
    g2 = dict(graph)
    g2["physics_param"] = graph["physics_param"] + 0.5
    p1, _ = forward(params, graph, CFG)
    p2, _ = forward(params, g2, CFG)
    assert np.abs(np.asarray(p1) - np.asarray(p2)).max() > 1e-5


def test_forward_batch_matches_single():
    params = init_params(jax.random.PRNGKey(0), CFG)
    graphs = [make_graph(s, CFG)[0] for s in range(4)]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *graphs)
    pos_b, mot_b = forward_batch(params, batched, CFG)
    for i, g in enumerate(graphs):
        pos, mot = forward(params, g, CFG)
        np.testing.assert_allclose(np.asarray(pos_b[i]), np.asarray(pos), rtol=1e-5, atol=1e-5)


def test_param_count_rope_scale():
    """Rope config ≈0.2M params (BASELINE.md 'Model size')."""
    cfg = GNNConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    n = count_params(params)
    assert 1.5e5 < n < 3.5e5, n


def test_translation_invariance_of_motion():
    """state_dim=0: only residuals and relative distances enter, so a global
    translation must not change predicted motion (SURVEY.md §2.4 note)."""
    graph, _ = make_graph(3, CFG)
    params = init_params(jax.random.PRNGKey(3), CFG)
    _, m1 = forward(params, graph, CFG)
    g2 = dict(graph)
    g2["state"] = graph["state"] + jnp.asarray([10.0, -5.0, 3.0])
    _, m2 = forward(params, g2, CFG)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-3, atol=1e-3)


def test_forward_matches_golden_fixture():
    """Regression guard: the forward must reproduce saved activations
    bit-for-bit-ish across refactors (fixtures/golden/gnn_forward.npz,
    generated from this implementation; the reference offers no goldens —
    SURVEY.md §4 requires us to create them)."""
    import os

    import jax

    path = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden",
                        "gnn_forward.npz")
    z = np.load(path)
    cfg = GNNConfig(n_his=4, max_nobj=20, max_neef=2, nf_particle=24,
                    nf_relation=24, nf_effect=24, pstep=3, phys_dim=2)
    template = init_params(jax.random.PRNGKey(0), cfg)
    flat, treedef = jax.tree_util.tree_flatten(template)
    params = jax.tree_util.tree_unflatten(
        treedef, [z[f"param_{i}"] for i in range(len(flat))])
    graph = {
        "state": z["state"], "attrs": z["attrs"], "neighbors": z["neighbors"],
        "nbr_mask": z["nbr_mask"], "action": z["action"],
        "p_instance": z["p_instance"], "physics_param": z["physics_param"],
    }
    pred, motion = forward(params, graph, cfg)
    # fixture generated on the single-device CPU backend; the 8-virtual-device
    # test backend reassociates reductions (~5e-4 abs) — tolerance is sized to
    # catch semantic drift (O(0.1+)), not FP reassociation
    np.testing.assert_allclose(np.asarray(pred), z["pred"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(motion), z["motion"], rtol=2e-3, atol=2e-3)
