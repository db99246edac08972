"""Planner + action math + batched forward dynamics tests
(reference semantics: src/planning/plan_utils.py, planner.py,
forward_dynamics.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptigraph_tpu.planning.actions import (
    decode_action,
    angle_normalize,
    clip_actions,
    sample_action_seq,
    sample_action_seq_correlated,
    optimize_action_mppi,
)
from adaptigraph_tpu.planning.planner import Planner, PlannerConfig
from adaptigraph_tpu.planning.forward import DynamicsConfig, dynamics_rollout, dynamics_masked
from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.graph import EdgeConfig

LOWER = jnp.asarray([-4.5, -2.5, -np.pi, 2.0])
UPPER = jnp.asarray([0.0, 4.5, np.pi, 10.0])


def test_decode_action():
    a = jnp.asarray([[[1.0, 2.0, 0.0, 3.7]]])
    dec, rep = decode_action(a, push_length=0.1)
    np.testing.assert_allclose(np.asarray(dec[0, 0]), [1.0, 2.0, 0.9, 2.0], atol=1e-6)
    assert int(rep[0, 0]) == 3  # int cast, not round (plan_utils.py:15-16)


def test_angle_normalize():
    np.testing.assert_allclose(float(angle_normalize(jnp.asarray(3 * np.pi / 2))), -np.pi / 2, atol=1e-6)


def test_clip_actions_normalizes_angle_then_clamps():
    a = jnp.asarray([[10.0, 10.0, 5.0, 50.0]])
    out = np.asarray(clip_actions(a, LOWER, UPPER))
    assert out[0, 0] == 0.0 and out[0, 1] == 4.5 and out[0, 3] == 10.0
    assert -np.pi <= out[0, 2] <= np.pi


def test_sample_action_seq_iter0_uniform_in_bounds():
    key = jax.random.PRNGKey(0)
    seqs = sample_action_seq(key, jnp.zeros((2, 4)), LOWER, UPPER, 64, iter_index=0)
    assert seqs.shape == (64, 2, 4)
    assert (np.asarray(seqs) >= np.asarray(LOWER) - 1e-6).all()
    assert (np.asarray(seqs) <= np.asarray(UPPER) + 1e-6).all()


def test_sample_action_seq_keeps_sample0():
    key = jax.random.PRNGKey(1)
    act = jnp.asarray([[-2.0, 1.0, 0.5, 5.0]])
    seqs = sample_action_seq(key, act, LOWER, UPPER, 16, iter_index=1)
    np.testing.assert_allclose(np.asarray(seqs[0]), np.asarray(act), atol=1e-6)
    assert np.abs(np.asarray(seqs[1:]) - np.asarray(act)[None]).max() > 1e-3


def test_correlated_sampler_bounds():
    key = jax.random.PRNGKey(2)
    act = jnp.asarray([[-2.0, 1.0, 0.5, 5.0]] * 3)
    seqs = sample_action_seq_correlated(key, act, LOWER, UPPER, 32, noise_level=0.5)
    assert seqs.shape == (32, 3, 4)
    assert (np.asarray(seqs) >= np.asarray(LOWER) - 1e-6).all()


def test_mppi_update_endpoint_space():
    """With one dominant reward, the update converges to that sample."""
    acts = jnp.asarray(
        [[[-2.0, 1.0, 0.3, 5.0]], [[-1.0, 2.0, -0.7, 7.0]]]
    )  # (2, 1, 4)
    rewards = jnp.asarray([100.0, 0.0])
    out = optimize_action_mppi(acts, rewards, reward_weight=10.0, lower=LOWER, upper=UPPER)
    np.testing.assert_allclose(np.asarray(out), np.asarray(acts[0]), atol=1e-3)


class ToyRollout:
    """Analytic model: point at `state` shifts by the push vector times
    repeats. Optimal action pushes the point toward the target."""

    def __call__(self, state_cur, act_seqs):
        dec, rep = decode_action(act_seqs, push_length=0.1)
        delta = jnp.stack([dec[..., 2] - dec[..., 0], dec[..., 3] - dec[..., 1]], axis=-1)
        motion = delta * rep[..., None]
        pos = state_cur[None, None, :2] + jnp.cumsum(motion, axis=1)
        return {"state_seqs": pos[..., None, :]}  # (n_sample, L, 1, 2)


def test_mppi_planner_converges_to_target():
    # within reach: |target| <= push_length * max repeats = 1.0
    target = jnp.asarray([0.5, 0.3])
    rollout = ToyRollout()

    def evaluate(state_seqs, act_seqs, state_cur=None, **kw):
        final = state_seqs[:, -1, 0]
        return {"reward_seqs": -jnp.linalg.norm(final - target, axis=-1)}

    cfg = PlannerConfig(
        action_dim=4,
        model_rollout_fn=rollout,
        evaluate_traj_fn=evaluate,
        n_sample=256,
        n_look_ahead=1,
        n_update_iter=5,
        reward_weight=50.0,
        action_lower_lim=jnp.asarray([-3.0, -3.0, -np.pi, 2.0]),
        action_upper_lim=jnp.asarray([3.0, 3.0, np.pi, 10.0]),
        noise_level=0.5,
    )
    planner = Planner(cfg)
    res = planner.trajectory_optimization(
        jnp.zeros(2), jnp.zeros((1, 4)).at[0, 3].set(5.0), jax.random.PRNGKey(0)
    )
    final = rollout(jnp.zeros(2), res["act_seq"][None])["state_seqs"][0, -1, 0]
    err = float(jnp.linalg.norm(final - target))
    assert err < 0.2, (err, np.asarray(res["act_seq"]))
    assert float(res["best_reward"]) > -0.25


def test_merge_res_picks_best_chunk():
    res = [
        {"act_seq": jnp.asarray([1.0]), "best_eval_output": {"reward_seqs": jnp.asarray([-3.0])}},
        {"act_seq": jnp.asarray([2.0]), "best_eval_output": {"reward_seqs": jnp.asarray([-1.0])}},
    ]
    assert float(Planner.merge_res(res)["act_seq"][0]) == 2.0


GNN = GNNConfig(n_his=4, max_nobj=20, max_neef=1, nf_particle=16, nf_relation=16,
                nf_effect=16, pstep=2)
DCFG = DynamicsConfig(
    gnn=GNN,
    edge=EdgeConfig(max_nobj=20, max_neef=1, topk=5),
    n_his=4,
    max_repeat=6,
    adj_thresh=0.5,
)


def test_dynamics_rollout_shapes_and_conditioning():
    params = init_params(jax.random.PRNGKey(0), GNN)
    rng = np.random.RandomState(0)
    state = jnp.asarray(rng.uniform(-0.5, 0.5, size=(20, 3)).astype(np.float32))
    acts = jnp.asarray(rng.uniform(-1, 1, size=(8, 1, 4)).astype(np.float32))
    acts = acts.at[..., 3].set(jnp.asarray(rng.uniform(2, 6, size=(8, 1)), jnp.float32))

    out = dynamics_rollout(params, state, acts, jnp.asarray([0.5]), DCFG)
    assert out["state_seqs"].shape == (8, 1, 20, 3)
    assert np.isfinite(np.asarray(out["state_seqs"])).all()

    out2 = dynamics_rollout(params, state, acts, jnp.asarray([0.9]), DCFG)
    assert np.abs(np.asarray(out["state_seqs"]) - np.asarray(out2["state_seqs"])).max() > 1e-6


def test_dynamics_repeat_semantics():
    """A sample with repeat k must record the state after exactly k substeps."""
    params = init_params(jax.random.PRNGKey(1), GNN)
    rng = np.random.RandomState(1)
    state = jnp.asarray(rng.uniform(-0.5, 0.5, size=(20, 3)).astype(np.float32))
    base = np.array([0.2, 0.1, 0.3, 2.0], np.float32)
    a2 = jnp.asarray(base)[None, None]
    a4 = jnp.asarray(np.concatenate([base[:3], [4.0]]).astype(np.float32))[None, None]

    out2 = dynamics_rollout(params, state, a2, jnp.asarray([0.5]), DCFG)
    out4 = dynamics_rollout(params, state, a4, jnp.asarray([0.5]), DCFG)
    # more repeats -> different (generally larger) displacement
    d2 = np.abs(np.asarray(out2["state_seqs"]) - np.asarray(state)[None, None]).max()
    d4 = np.abs(np.asarray(out4["state_seqs"]) - np.asarray(state)[None, None]).max()
    assert d4 != d2


def test_dynamics_masked_batched_physics():
    params = init_params(jax.random.PRNGKey(2), GNN)
    rng = np.random.RandomState(2)
    B = 4
    state = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 20, 3)).astype(np.float32))
    mask = jnp.asarray(np.tile(np.arange(20) < 15, (B, 1)))
    acts = jnp.asarray(rng.uniform(-1, 1, size=(B, 4)).astype(np.float32)).at[:, 3].set(3.0)
    phys = jnp.asarray(rng.rand(B, 1).astype(np.float32))
    out = dynamics_masked(params, state, mask, acts, phys, DCFG)
    assert out.shape == (B, 20, 3)
    assert np.isfinite(np.asarray(out)).all()
    # different physics candidates must give different predictions
    assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 1e-7


def test_dynamics_rollout_batched_matches_vmapped():
    """Batch-level rollout (the fused-kernel host path) must reproduce the
    vmapped per-sample rollout exactly in f32."""
    from adaptigraph_tpu.planning.forward import dynamics_rollout_batched

    params = init_params(jax.random.PRNGKey(0), GNN)
    rng = np.random.RandomState(4)
    state = jnp.asarray(rng.randn(20, 3).astype(np.float32) * 0.3)
    acts = jnp.asarray(
        np.stack([[[-0.5, 0.0, 0.3, 2.0]], [[0.2, -0.1, 1.0, 3.0]],
                  [[0.0, 0.3, -0.7, 1.0]], [[0.4, 0.4, 2.0, 3.0]]]).astype(np.float32))
    want = dynamics_rollout(params, state, acts, jnp.asarray([0.5]), DCFG)
    got = dynamics_rollout_batched(params, state, acts, jnp.asarray([0.5]), DCFG,
                                   use_fused=False, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got["state_seqs"]),
                               np.asarray(want["state_seqs"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["action_seqs"]),
                               np.asarray(want["action_seqs"]), rtol=1e-6)


def test_dynamics_rollout_batched_board_pusher():
    """Parity for the granular-style 5-point board pusher (pusher_offsets,
    max_neef=5, topk with tool rows)."""
    from adaptigraph_tpu.planning.forward import dynamics_rollout_batched

    gnn5 = GNNConfig(n_his=3, max_nobj=20, max_neef=5, nf_particle=16,
                     nf_relation=16, nf_effect=16, pstep=2)
    dcfg5 = DynamicsConfig(
        gnn=gnn5, edge=EdgeConfig(max_nobj=20, max_neef=5, topk=6),
        n_his=3, push_length=0.1, max_repeat=3, adj_thresh=0.8,
        pusher_offsets=(-0.05, -0.025, 0.0, 0.025, 0.05))
    params = init_params(jax.random.PRNGKey(1), gnn5)
    rng = np.random.RandomState(5)
    state = jnp.asarray(rng.randn(20, 3).astype(np.float32) * 0.3)
    acts = jnp.asarray(rng.uniform(-1, 1, (3, 1, 4)).astype(np.float32))
    acts = acts.at[..., 3].set(2.0)
    want = dynamics_rollout(params, state, acts, jnp.asarray([0.5]), dcfg5)
    got = dynamics_rollout_batched(params, state, acts, jnp.asarray([0.5]),
                                   dcfg5, use_fused=False,
                                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got["state_seqs"]),
                               np.asarray(want["state_seqs"]), rtol=1e-5,
                               atol=1e-5)


def test_gd_planner_improves_reward():
    """The gradient-descent variant (Adam through the differentiable rollout,
    reference planner.py:279-310) must improve on its initial samples."""
    target = jnp.asarray([0.4, 0.2])
    rollout = ToyRollout()

    def evaluate(state_seqs, act_seqs, state_cur=None, **kw):
        final = state_seqs[:, -1, 0]
        return {"reward_seqs": -jnp.linalg.norm(final - target, axis=-1)}

    cfg = PlannerConfig(
        action_dim=4,
        model_rollout_fn=rollout,
        evaluate_traj_fn=evaluate,
        n_sample=64,
        n_look_ahead=1,
        n_update_iter=40,
        reward_weight=50.0,
        action_lower_lim=jnp.asarray([-3.0, -3.0, -np.pi, 2.0]),
        action_upper_lim=jnp.asarray([3.0, 3.0, np.pi, 10.0]),
        noise_level=0.5,
        planner_type="GD",
        lr=3e-2,
    )
    planner = Planner(cfg)
    res = planner.trajectory_optimization(
        jnp.zeros(2), jnp.zeros((1, 4)).at[0, 3].set(5.0), jax.random.PRNGKey(2)
    )
    final = rollout(jnp.zeros(2), res["act_seq"][None])["state_seqs"][0, -1, 0]
    err = float(jnp.linalg.norm(final - target))
    assert err < 0.3, err
