"""Fused Pallas kernels composed with multi-chip shard_map (VERDICT r1 #1).

Under ``shard_map`` every device runs its own program, so the fused kernels
launch per-shard: the MPPI chunk path and the custom-VJP train step must
match their single-device fused runs. Kernels run in Pallas interpret mode
on the 8-virtual-device CPU mesh (tests/conftest.py); the real-TPU runs are
exercised by the verify skill."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from adaptigraph_tpu.dynamics import train as train_mod
from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.costs import chamfer
from adaptigraph_tpu.ops.graph import EdgeConfig
from adaptigraph_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from adaptigraph_tpu.planning.forward import DynamicsConfig
from adaptigraph_tpu.planning.mppi_solve import MPPIConfig, make_mppi_solver

GNN = GNNConfig(n_his=4, max_nobj=20, max_neef=1, nf_particle=16,
                nf_relation=16, nf_effect=16, pstep=2)
EDGE = EdgeConfig(max_nobj=20, max_neef=1, topk=5)
DCFG = DynamicsConfig(gnn=GNN, edge=EDGE, n_his=4, max_repeat=3, adj_thresh=0.5)
LOWER = np.asarray([-2.0, -2.0, -np.pi, 1.0], np.float32)
UPPER = np.asarray([2.0, 2.0, np.pi, 3.0], np.float32)


def _reward(target):
    def fn(state_seqs, act_seqs, state_cur):
        final = state_seqs[:, -1]
        return -chamfer(final, jnp.broadcast_to(target[None],
                                                (final.shape[0],) + target.shape))
    return fn


def test_sharded_fused_mppi_matches_single_fused():
    params = init_params(jax.random.PRNGKey(0), GNN)
    rng = np.random.RandomState(0)
    state = jnp.asarray(rng.uniform(-0.5, 0.5, size=(20, 3)).astype(np.float32))
    target = state + jnp.asarray([0.3, 0.0, 0.2])
    mcfg = MPPIConfig(n_sample=32, n_sample_chunk=4, n_look_ahead=1,
                      n_update_iter=2, reward_weight=50.0, noise_level=0.5)
    mesh = make_mesh(8)
    s1 = make_mppi_solver(DCFG, mcfg, _reward(target), LOWER, UPPER,
                          use_fused=True, interpret=True)
    s8 = make_mppi_solver(DCFG, mcfg, _reward(target), LOWER, UPPER,
                          mesh=mesh, use_fused=True, interpret=True)
    act0 = jnp.zeros((1, 4)).at[0, 3].set(2.0)
    r1 = s1(params, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.5]))
    r8 = s8(params, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.5]))
    # same sample set; per-sample math identical per shard. Only the
    # softmax-weighted action average sums in a different order.
    np.testing.assert_allclose(float(r1["best_reward"]), float(r8["best_reward"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r1["act_seq"]), np.asarray(r8["act_seq"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1["best_final_state"]),
                               np.asarray(r8["best_final_state"]),
                               rtol=1e-4, atol=1e-5)


def _batch(rng, B):
    N, No = GNN.n_nodes, GNN.max_nobj
    batch = {
        "state": rng.randn(B, 4, N, 3).astype(np.float32) * 0.3,
        "action": np.zeros((B, N, 3), np.float32),
        "eef_future": np.zeros((B, 2, N, 3), np.float32),
        "action_future": np.zeros((B, 2, N, 3), np.float32),
        "state_future": rng.randn(B, 3, No, 3).astype(np.float32) * 0.3,
        "attrs": np.zeros((B, N, 2), np.float32),
        "p_instance": np.ones((B, No, 1), np.float32),
        "state_mask": np.ones((B, N), bool),
        "eef_mask": np.zeros((B, N), bool),
        "obj_mask": np.ones((B, No), bool),
        "physics_param": np.full((B, 1), 0.5, np.float32),
        "adj_thresh": np.full(B, 0.5, np.float32),
        "knn_frac": np.ones(B, np.float32),
    }
    batch["eef_mask"][:, No] = True
    batch["attrs"][:, :No, 0] = 1.0
    batch["attrs"][:, No, 1] = 1.0
    batch["action"][:, No:] = 0.05
    return batch


@pytest.fixture(scope="module")
def fused_fn():
    fn = train_mod.fused_train_fn(GNN, EDGE, interpret=True)
    assert fn is not None
    return fn


def test_sharded_fused_train_step_matches_single(fused_fn):
    """Fused custom-VJP under shard_map == single-device fused step."""
    rng = np.random.RandomState(1)
    batch = _batch(rng, 8)
    hyper = train_mod.TrainHyper(n_future=3, use_augmentation=False)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(7)

    params = init_params(jax.random.PRNGKey(0), GNN)
    step1 = train_mod.make_train_step(GNN, EDGE, hyper, opt, fused_fn=fused_fn)
    p1, _, loss1 = step1(params, opt.init(params), batch, key)

    mesh = make_mesh(8)
    params2 = init_params(jax.random.PRNGKey(0), GNN)
    step8 = train_mod.make_train_step(GNN, EDGE, hyper, opt, fused_fn=fused_fn,
                                      mesh=mesh)
    p8, _, loss8 = step8(replicate(params2, mesh),
                         replicate(opt.init(params2), mesh),
                         shard_batch(batch, mesh), key)
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_sharded_fused_grads_match_xla(fused_fn):
    """On the mesh, fused-VJP parameter updates == XLA-autodiff updates."""
    rng = np.random.RandomState(2)
    batch = _batch(rng, 8)
    hyper = train_mod.TrainHyper(n_future=2, use_augmentation=False)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(8)

    outs = []
    for fn in (None, fused_fn):
        params = init_params(jax.random.PRNGKey(0), GNN)
        step = train_mod.make_train_step(GNN, EDGE, hyper, opt, fused_fn=fn,
                                         mesh=mesh)
        p, _, loss = step(replicate(params, mesh),
                          replicate(opt.init(params), mesh),
                          shard_batch(batch, mesh), key)
        outs.append((p, float(loss)))
    (p_xla, l_xla), (p_fused, l_fused) = outs
    np.testing.assert_allclose(l_fused, l_xla, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_xla),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-5)


def test_sharded_fused_superbatch_scan(fused_fn):
    """K-steps-per-dispatch scan inside shard_map with the fused VJP:
    matches the single-device fused scan (augmentation off)."""
    rng = np.random.RandomState(3)
    K, B = 2, 8
    sb = _batch(rng, K * B)
    sb = {k: v.reshape((K, B) + v.shape[1:]) for k, v in sb.items()}
    hyper = train_mod.TrainHyper(n_future=2, use_augmentation=False)
    opt = optax.adam(1e-3)
    keys = jax.random.split(jax.random.PRNGKey(5), K)

    params = init_params(jax.random.PRNGKey(0), GNN)
    steps1 = train_mod.make_train_steps(GNN, EDGE, hyper, opt, fused_fn=fused_fn)
    p1, _, l1 = steps1(params, opt.init(params), sb, keys)

    mesh = make_mesh(8)
    params2 = init_params(jax.random.PRNGKey(0), GNN)
    steps8 = train_mod.make_train_steps(GNN, EDGE, hyper, opt, fused_fn=fused_fn,
                                        mesh=mesh)
    p8, _, l8 = steps8(replicate(params2, mesh),
                       replicate(opt.init(params2), mesh),
                       shard_batch(sb, mesh, batch_axis=1), keys)
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)
