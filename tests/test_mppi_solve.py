"""Fused MPPI solver tests, incl. multi-device shard_map consistency."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.graph import EdgeConfig
from adaptigraph_tpu.ops.costs import chamfer
from adaptigraph_tpu.planning.forward import DynamicsConfig
from adaptigraph_tpu.planning.mppi_solve import MPPIConfig, make_mppi_solver
from adaptigraph_tpu.parallel.mesh import make_mesh

GNN = GNNConfig(n_his=4, max_nobj=20, max_neef=1, nf_particle=16, nf_relation=16,
                nf_effect=16, pstep=2)
DCFG = DynamicsConfig(
    gnn=GNN, edge=EdgeConfig(max_nobj=20, max_neef=1, topk=5), n_his=4,
    max_repeat=4, adj_thresh=0.5,
)
LOWER = np.asarray([-2.0, -2.0, -np.pi, 2.0], np.float32)
UPPER = np.asarray([2.0, 2.0, np.pi, 4.0], np.float32)


def make_reward(target):
    def reward_fn(state_seqs, act_seqs, state_cur):
        final = state_seqs[:, -1]
        return -chamfer(final, jnp.broadcast_to(target[None], (final.shape[0],) + target.shape))
    return reward_fn


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), GNN)
    rng = np.random.RandomState(0)
    state = jnp.asarray(rng.uniform(-0.5, 0.5, size=(20, 3)).astype(np.float32))
    target = jnp.asarray(np.asarray(state) + np.asarray([0.3, 0.0, 0.2], np.float32))
    return params, state, target


def test_solve_improves_reward(setup):
    params, state, target = setup
    mcfg = MPPIConfig(n_sample=64, n_sample_chunk=16, n_look_ahead=1, n_update_iter=3,
                      reward_weight=50.0, noise_level=0.5)
    solve = make_mppi_solver(DCFG, mcfg, make_reward(target), LOWER, UPPER)
    act0 = jnp.zeros((1, 4)).at[0, 3].set(3.0)
    res = solve(params, state, act0, jax.random.PRNGKey(1), jnp.asarray([0.5]))
    assert np.isfinite(res["best_reward"])
    assert res["act_seq"].shape == (1, 4)
    assert res["best_final_state"].shape == (20, 3)
    # best reward beats the average of a fresh uniform batch by construction
    assert res["best_reward"] > -10.0


def test_solve_multi_step_horizon(setup):
    """n_look_ahead > 1: per-step eef re-sticking + receding-horizon shapes
    (reference: forward_dynamics.py:156-168 look-ahead loop,
    config/planning task_config n_look_ahead)."""
    params, state, target = setup
    mcfg = MPPIConfig(n_sample=32, n_sample_chunk=8, n_look_ahead=3, n_update_iter=2,
                      reward_weight=50.0, noise_level=0.5)
    solve = make_mppi_solver(DCFG, mcfg, make_reward(target), LOWER, UPPER)
    act0 = jnp.zeros((3, 4)).at[:, 3].set(3.0)
    res = solve(params, state, act0, jax.random.PRNGKey(3), jnp.asarray([0.5]))
    assert res["act_seq"].shape == (3, 4)
    assert res["mppi_seq"].shape == (3, 4)
    assert np.isfinite(res["best_reward"])
    assert np.isfinite(np.asarray(res["best_final_state"])).all()


def test_sharded_solve_matches_single(setup):
    params, state, target = setup
    mesh = make_mesh(8)
    mcfg = MPPIConfig(n_sample=64, n_sample_chunk=8, n_look_ahead=1, n_update_iter=2,
                      reward_weight=50.0, noise_level=0.5)
    solve1 = make_mppi_solver(DCFG, mcfg, make_reward(target), LOWER, UPPER)
    solve8 = make_mppi_solver(DCFG, mcfg, make_reward(target), LOWER, UPPER, mesh=mesh)
    act0 = jnp.zeros((1, 4)).at[0, 3].set(3.0)
    r1 = solve1(params, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.5]))
    r8 = solve8(params, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.5]))
    np.testing.assert_allclose(r1["best_reward"], r8["best_reward"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1["act_seq"]), np.asarray(r8["act_seq"]), rtol=1e-4, atol=1e-5)


def test_multi_material_joint_eval_submeshes(setup):
    """Multi-material joint eval across a pod slice (BASELINE.md eval
    config #5): two materials' MPPI solves — rope-style stick pusher and a
    granular-style 5-point board — run on DISJOINT 4-device submeshes of the
    8-device mesh, dispatched together (async) and each bit-identical to its
    own single-device solve. This is the TPU-native replacement for the
    reference's one-GPU-per-material sequential evaluation."""
    from jax.sharding import Mesh

    params, state, target = setup
    devs = jax.devices()
    mesh_a = Mesh(np.array(devs[:4]), ("data",))
    mesh_b = Mesh(np.array(devs[4:8]), ("data",))

    mcfg = MPPIConfig(n_sample=32, n_sample_chunk=4, n_look_ahead=1,
                      n_update_iter=1, reward_weight=50.0, noise_level=0.5)
    board = DynamicsConfig(
        gnn=GNN, edge=EdgeConfig(max_nobj=20, max_neef=5, topk=5), n_his=4,
        max_repeat=4, adj_thresh=0.5,
        pusher_offsets=(-0.02, -0.01, 0.0, 0.01, 0.02),
    )
    gnn_b = GNNConfig(n_his=4, max_nobj=20, max_neef=5, nf_particle=16,
                      nf_relation=16, nf_effect=16, pstep=2)
    board = dataclasses.replace(board, gnn=gnn_b)
    params_b = init_params(jax.random.PRNGKey(7), gnn_b)

    solve_rope = make_mppi_solver(DCFG, mcfg, make_reward(target), LOWER, UPPER,
                                  mesh=mesh_a)
    solve_gran = make_mppi_solver(board, mcfg, make_reward(target), LOWER, UPPER,
                                  mesh=mesh_b)
    act0 = jnp.zeros((1, 4)).at[0, 3].set(3.0)

    # dispatch both materials; jax async dispatch overlaps the two slices
    ra = solve_rope(params, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.5]))
    rb = solve_gran(params_b, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.3]))
    jax.block_until_ready((ra["best_reward"], rb["best_reward"]))

    # each submesh result matches its material's single-device solve
    s1a = make_mppi_solver(DCFG, mcfg, make_reward(target), LOWER, UPPER)
    s1b = make_mppi_solver(board, mcfg, make_reward(target), LOWER, UPPER)
    ea = s1a(params, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.5]))
    eb = s1b(params_b, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.3]))
    np.testing.assert_allclose(ra["best_reward"], ea["best_reward"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rb["best_reward"], eb["best_reward"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ra["act_seq"]), np.asarray(ea["act_seq"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb["act_seq"]), np.asarray(eb["act_seq"]),
                               rtol=1e-4, atol=1e-5)


def test_sharded_solve_matches_single_rope_scale(setup):
    """Rope-WIDTH sharded-vs-single parity (VERDICT r1 item 9): the real
    model geometry — N=101 nodes, nf=128, pstep=3, topk=10
    (config/dynamics/rope.yaml) — not the toy shapes. Sample budget is kept
    CPU-sized; the full 20k budget runs on TPU in bench.py."""
    gnn = GNNConfig(n_his=4, max_nobj=100, max_neef=1, nf_particle=128,
                    nf_relation=128, nf_effect=128, pstep=3)
    dcfg = DynamicsConfig(gnn=gnn, edge=EdgeConfig(max_nobj=100, max_neef=1, topk=10),
                          n_his=4, max_repeat=3, adj_thresh=0.5)
    params = init_params(jax.random.PRNGKey(1), gnn)
    rng = np.random.RandomState(1)
    state = jnp.asarray(rng.uniform(-0.8, 0.8, size=(100, 3)).astype(np.float32))
    target = state + jnp.asarray([0.3, 0.0, 0.2])
    mcfg = MPPIConfig(n_sample=16, n_sample_chunk=2, n_look_ahead=1,
                      n_update_iter=1, reward_weight=50.0, noise_level=0.5)
    mesh = make_mesh(8)
    s1 = make_mppi_solver(dcfg, mcfg, make_reward(target), LOWER, UPPER)
    s8 = make_mppi_solver(dcfg, mcfg, make_reward(target), LOWER, UPPER, mesh=mesh)
    act0 = jnp.zeros((1, 4)).at[0, 3].set(3.0)
    r1 = s1(params, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.5]))
    r8 = s8(params, state, act0, jax.random.PRNGKey(2), jnp.asarray([0.5]))
    np.testing.assert_allclose(float(r1["best_reward"]), float(r8["best_reward"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r1["act_seq"]), np.asarray(r8["act_seq"]),
                               rtol=1e-4, atol=1e-5)


def test_sharded_train_matches_single_rope_scale():
    """Rope-width DP training parity on the 8-device mesh (shard_map step)."""
    import optax

    from adaptigraph_tpu.dynamics import train as train_mod
    from adaptigraph_tpu.parallel.mesh import replicate, shard_batch

    gnn = GNNConfig(n_his=4, max_nobj=100, max_neef=1, nf_particle=128,
                    nf_relation=128, nf_effect=128, pstep=3)
    edge = EdgeConfig(max_nobj=100, max_neef=1, topk=10)
    hyper = train_mod.TrainHyper(n_future=3, use_augmentation=False)
    rng = np.random.RandomState(2)
    B, N, No = 16, gnn.n_nodes, gnn.max_nobj
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

    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(5)
    params = init_params(jax.random.PRNGKey(0), gnn)
    step1 = train_mod.make_train_step(gnn, edge, hyper, opt)
    p1, _, loss1 = step1(params, opt.init(params), batch, key)

    mesh = make_mesh(8)
    params2 = init_params(jax.random.PRNGKey(0), gnn)
    step8 = train_mod.make_train_step(gnn, edge, hyper, opt, mesh=mesh)
    p8, _, loss8 = step8(replicate(params2, mesh), replicate(opt.init(params2), mesh),
                         shard_batch(batch, mesh), key)
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)
