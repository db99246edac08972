"""Sampling-MPC planner (MPPI and gradient-descent variants).

Re-implements the reference ``Planner``
(reference: ``src/planning/real_world/planner.py:38-326``) with the same
injectable structure — ``model_rollout_fn``, ``evaluate_traj_fn``, sampling /
clip / MPPI-update functions — but functional and key-threaded. The
n_update_iter loop runs on the host (each iteration is one fused on-device
program); multi-device sample sharding lives in
``adaptigraph_tpu.planning.mppi_solve`` (``make_mppi_solver(mesh=...)``).

The GD variant optimizes action sequences by Adam on -mean(reward)
(reference: planner.py:279-310) using jax.grad through the rollout.
"""

import dataclasses
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from adaptigraph_tpu.planning.actions import (
    clip_actions,
    optimize_action_mppi,
    sample_action_seq_correlated,
)


@dataclasses.dataclass
class PlannerConfig:
    """Mirrors the reference planner config dict (planner.py:40-116)."""

    action_dim: int
    model_rollout_fn: Callable  # (state_cur, act_seqs) -> {"state_seqs": ...}
    evaluate_traj_fn: Callable  # (state_seqs, act_seqs, state_cur) -> {"reward_seqs": ...}
    n_sample: int
    n_look_ahead: int
    n_update_iter: int
    reward_weight: float
    action_lower_lim: Any
    action_upper_lim: Any
    planner_type: str = "MPPI"
    sampling_action_seq_fn: Optional[Callable] = None  # (key, act_seq, iter_index) -> act_seqs
    clip_action_seq_fn: Optional[Callable] = None
    optimize_action_mppi_fn: Optional[Callable] = None
    noise_level: float = 0.1
    rollout_best: bool = True
    lr: float = 1e-3
    verbose: bool = False


class Planner:
    def __init__(self, config: PlannerConfig):
        assert config.planner_type in ("MPPI", "GD")
        self.c = config
        lower = jnp.asarray(config.action_lower_lim)
        upper = jnp.asarray(config.action_upper_lim)
        self.lower, self.upper = lower, upper
        self.sample_fn = config.sampling_action_seq_fn or (
            lambda key, act_seq, iter_index=0: sample_action_seq_correlated(
                key, act_seq, lower, upper, config.n_sample, config.noise_level
            )
        )
        self.clip_fn = config.clip_action_seq_fn or (lambda a: clip_actions(a, lower, upper))
        self.mppi_fn = config.optimize_action_mppi_fn or (
            lambda acts, rewards: optimize_action_mppi(
                acts, rewards, config.reward_weight, lower, upper
            )
        )
        self.chunk_id = 0
        self.total_chunks = 1

    def trajectory_optimization(self, state_cur, act_seq, key):
        if self.c.planner_type == "MPPI":
            return self.trajectory_optimization_mppi(state_cur, act_seq, key)
        return self.trajectory_optimization_gd(state_cur, act_seq, key)

    def trajectory_optimization_mppi(self, state_cur, act_seq, key):
        """n_update_iter x {sample, rollout, evaluate, MPPI update}; track the
        best sampled sequence across iterations (planner.py:234-277)."""
        c = self.c
        best_act_seq = None
        best_reward = -jnp.inf
        for i in range(c.n_update_iter):
            key, k = jax.random.split(key)
            act_seqs = self.sample_fn(k, act_seq, iter_index=i)
            model_out = c.model_rollout_fn(state_cur, act_seqs)
            eval_out = c.evaluate_traj_fn(model_out["state_seqs"], act_seqs, state_cur=state_cur)
            reward_seqs = eval_out["reward_seqs"]
            act_seq = self.mppi_fn(act_seqs, reward_seqs)

            idx = jnp.argmax(reward_seqs)
            it_best = reward_seqs[idx]
            if best_act_seq is None or bool(it_best > best_reward):
                best_reward = it_best
                best_act_seq = act_seqs[idx]

        res = {"act_seq": best_act_seq, "best_reward": best_reward,
               "best_model_output": None, "best_eval_output": None}
        if c.rollout_best:
            bm = c.model_rollout_fn(state_cur, best_act_seq[None])
            be = c.evaluate_traj_fn(bm["state_seqs"], best_act_seq[None], state_cur=state_cur)
            res["best_model_output"] = bm
            res["best_eval_output"] = be
        return res

    def trajectory_optimization_gd(self, state_cur, act_seq, key):
        """Adam on -mean(reward) through the differentiable rollout
        (planner.py:279-310)."""
        c = self.c
        key, k = jax.random.split(key)
        act_seqs = self.sample_fn(k, act_seq, iter_index=0)

        def neg_reward(a):
            out = c.model_rollout_fn(state_cur, a)
            ev = c.evaluate_traj_fn(out["state_seqs"], a, state_cur=state_cur)
            return -jnp.mean(ev["reward_seqs"])

        opt = optax.adam(c.lr)
        opt_state = opt.init(act_seqs)
        grad_fn = jax.value_and_grad(neg_reward)
        for _ in range(c.n_update_iter):
            _, g = grad_fn(act_seqs)
            updates, opt_state = opt.update(g, opt_state)
            act_seqs = self.clip_fn(optax.apply_updates(act_seqs, updates))

        out = c.model_rollout_fn(state_cur, act_seqs)
        ev = c.evaluate_traj_fn(out["state_seqs"], act_seqs, state_cur=state_cur)
        idx = jnp.argmax(ev["reward_seqs"])
        best = act_seqs[idx]
        res = {"act_seq": best, "best_reward": ev["reward_seqs"][idx],
               "best_model_output": None, "best_eval_output": None}
        if c.rollout_best:
            bm = c.model_rollout_fn(state_cur, best[None])
            be = c.evaluate_traj_fn(bm["state_seqs"], best[None], state_cur=state_cur)
            res["best_model_output"] = bm
            res["best_eval_output"] = be
        return res

    @staticmethod
    def merge_res(res_list):
        """Pick the best chunk by its re-rolled-out reward
        (planner.py:312-323)."""
        rewards = [float(jnp.mean(r["best_eval_output"]["reward_seqs"])) for r in res_list]
        return res_list[int(np.argmax(rewards))]
