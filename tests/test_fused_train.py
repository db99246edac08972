"""Differentiable fused training forward: value + gradient parity vs the
XLA path (interpret mode on CPU; the real-TPU run is exercised by verify).

Reference semantics being differentiated: the pstep bmm chain of
src/dynamics/gnn/model.py:307-332 under the multi-step training loss of
src/dynamics/train/train.py:94-124.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, init_params, forward
from adaptigraph_tpu.ops.graph import EdgeConfig, build_neighbor_graph_batch
from adaptigraph_tpu.ops.fused_gnn_train import make_fused_train_forward

CFG = GNNConfig(n_his=3, max_nobj=12, max_neef=1, nf_particle=16,
                nf_relation=16, nf_effect=16, pstep=2, phys_dim=1)
ECFG = EdgeConfig(max_nobj=12, max_neef=1, topk=4)
K_USED = ECFG.topk + ECFG.max_neef


def make_inputs(B=4, seed=0):
    rng = np.random.RandomState(seed)
    N = CFG.n_nodes
    state = jnp.asarray(rng.randn(B, CFG.n_his, N, 3).astype(np.float32) * 0.3)
    node_mask = jnp.ones((B, N), bool)
    tool_mask = jnp.zeros((B, N), bool).at[:, CFG.max_nobj].set(True)
    nbrs, mask = build_neighbor_graph_batch(state[:, -1], node_mask, tool_mask,
                                            0.9, ECFG)
    attrs = jnp.zeros((B, N, 2)).at[:, :CFG.max_nobj, 0].set(1.0).at[:, CFG.max_nobj:, 1].set(1.0)
    action = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.05)
    p_instance = jnp.ones((B, CFG.max_nobj, 1))
    physics = jnp.asarray(rng.rand(B, 1).astype(np.float32))
    return state, action, physics, attrs, p_instance, nbrs, mask


def xla_pred(params, state, action, physics, attrs, p_instance, nbrs, mask):
    graphs = {"state": state, "attrs": attrs, "neighbors": nbrs,
              "nbr_mask": mask, "action": action, "p_instance": p_instance,
              "physics_param": physics}
    return jax.vmap(lambda g: forward(params, g, CFG)[0])(graphs)


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    fused = make_fused_train_forward(CFG, K_USED, compute_dtype=jnp.float32,
                                     interpret=True)
    return params, fused, make_inputs()


def test_forward_value_parity(setup):
    params, fused, ins = setup
    pred_f = fused(params, *ins)
    pred_x = xla_pred(params, *ins)
    np.testing.assert_allclose(np.asarray(pred_f), np.asarray(pred_x),
                               rtol=2e-5, atol=2e-5)


def test_grad_parity_params_and_state(setup):
    params, fused, ins = setup
    state, action, physics = ins[0], ins[1], ins[2]
    tail = ins[3:]
    target = jnp.asarray(np.random.RandomState(7).randn(
        4, CFG.max_nobj, 3).astype(np.float32) * 0.3)

    def loss_fused(p, s, a, ph):
        return jnp.mean((fused(p, s, a, ph, *tail) - target) ** 2)

    def loss_xla(p, s, a, ph):
        return jnp.mean((xla_pred(p, s, a, ph, *tail) - target) ** 2)

    lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
        params, state, action, physics)
    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3))(
        params, state, action, physics)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)

    flat_f, tree_f = jax.tree_util.tree_flatten(gf)
    flat_x, tree_x = jax.tree_util.tree_flatten(gx)
    assert tree_f == tree_x
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


def test_grad_through_autoregressive_chain(setup):
    """The training loss differentiates through pred -> next state history
    (train.py:104-120); the custom VJP's d_state must carry that chain."""
    params, fused, ins = setup
    state, action, physics = ins[0], ins[1], ins[2]
    tail = ins[3:]
    n_p = CFG.max_nobj

    def two_step(pred_fn, p):
        pred1 = pred_fn(p, state, action, physics, *tail)
        nxt = state[:, -1].at[:, :n_p].set(pred1)
        state2 = jnp.concatenate([state[:, 1:], nxt[:, None]], axis=1)
        pred2 = pred_fn(p, state2, action, physics, *tail)
        return jnp.mean(pred2 ** 2) + jnp.mean(pred1 ** 2)

    gf = jax.grad(lambda p: two_step(fused, p))(params)
    gx = jax.grad(lambda p: two_step(
        lambda p_, s, a, ph, *t: xla_pred(p_, s, a, ph, *t), p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)


def test_grad_parity_per_particle_physics(setup):
    """The hetero case (per-particle physics, reference rollout/graph.py:591-643):
    d_physics must be per-(sample, particle), not summed."""
    params, fused, ins = setup
    state, action = ins[0], ins[1]
    tail = ins[3:]
    rng = np.random.RandomState(3)
    phys_pp = jnp.asarray(rng.rand(4, CFG.max_nobj).astype(np.float32))

    def loss_fused(ph):
        return jnp.mean(fused(params, state, action, ph, *tail) ** 2)

    def loss_xla(ph):
        return jnp.mean(xla_pred(params, state, action, ph, *tail) ** 2)

    gf = jax.grad(loss_fused)(phys_pp)
    gx = jax.grad(loss_xla)(phys_pp)
    assert gf.shape == phys_pp.shape
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=5e-4, atol=1e-7)
