"""Fused MPPI solve: the framework's headline hot path.

The reference splits one 20000-sample rope solve into 40 sequential GPU
chunks driven from Python (reference: ``src/planning/plan.py:177-182,241-247``
with ``n_sample_chunk=500``), paying a host sync + edge rebuild per substep
per chunk. Here one solve iteration is ONE jitted program:

  sample actions -> reshape (n_chunks, chunk, L, 4) -> lax.map over chunks of
  {vmap'd scan rollout + reward} -> softmax MPPI update + best tracking

``lax.map`` keeps peak memory at chunk granularity (the per-substep edge/
effect tensors are the working set) while the whole budget stays on-device.
Across multiple chips the sample axis is sharded with ``shard_map``; the
reward vector (n_sample floats) is all-gathered, so the softmax update and
argmax see the global budget (SURVEY.md §2.8 sample-parallel row).
"""

import dataclasses
import functools
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from adaptigraph_tpu.planning.actions import (
    clip_actions,
    decode_action,
    optimize_action_mppi,
    sample_action_seq,
)
from adaptigraph_tpu.planning.forward import (
    DynamicsConfig,
    dynamics_rollout,
    dynamics_rollout_batched,
)


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    """Solve budget (reference: config/planning/*.yaml task_config)."""

    n_sample: int = 20000
    n_sample_chunk: int = 2000
    n_look_ahead: int = 1
    n_update_iter: int = 1
    reward_weight: float = 500.0
    noise_level: float = 1.0
    push_length: float = 0.1


def make_mppi_solver(
    dcfg: DynamicsConfig,
    mcfg: MPPIConfig,
    reward_fn: Callable,  # (state_seqs, act_seqs, state_cur) -> (n_sample,) rewards
    lower,
    upper,
    mesh=None,
    axis="data",
    use_fused=False,
    interpret=False,
):
    """Build a jitted MPPI solve-iteration.

    Returns ``solve(params, state_cur, act_seq, key, physics_param)`` running
    ``n_update_iter`` fused iterations and the final best-sequence re-rollout
    (reference: planner.py:234-277 + plan.py chunk merge collapsed into one
    on-device argmax over the full sample budget).
    """
    lower = jnp.asarray(lower)
    upper = jnp.asarray(upper)
    n_chunks = mcfg.n_sample // mcfg.n_sample_chunk
    assert n_chunks * mcfg.n_sample_chunk == mcfg.n_sample

    def chunk_rewards(params, state_cur, act_chunk, physics_param):
        if use_fused:
            # batch-level rollout through the fused Pallas GNN kernel
            # (interpret=True builds it in interpret mode for CPU-mesh tests
            # of the fused multi-chip composition)
            out = dynamics_rollout_batched(params, state_cur, act_chunk,
                                           physics_param, dcfg, use_fused=True,
                                           interpret=interpret)
        else:
            out = dynamics_rollout(params, state_cur, act_chunk, physics_param, dcfg)
        r = reward_fn(out["state_seqs"], act_chunk, state_cur)
        return r, out["state_seqs"][:, -1]

    def sort_by_repeat(act_seqs, interleave=1):
        """Order samples by total push repeats so each chunk's dynamic
        substep loop (forward.dynamics_rollout_batched) runs only to its own
        max — ~30% less substep work for a uniform 5..15 repeat budget, with
        the exact same sample set (MPPI's softmax update and argmax are
        order-invariant). ``interleave`` > 1 deals strata round-robin across
        that many devices so the sharded path stays load-balanced.
        ADAPTIGRAPH_NO_REPEAT_SORT=1 disables it (perf-regression A/B:
        this landed between BENCH_r02 and r03's 18% headline drop)."""
        import os as _os

        if _os.environ.get("ADAPTIGRAPH_NO_REPEAT_SORT") == "1":
            return act_seqs
        _, repeat = decode_action(act_seqs, mcfg.push_length)
        order = jnp.argsort(jnp.sum(repeat, axis=1))
        if interleave > 1:
            # chunk c -> device c % n_dev: each device gets an even spread
            perm = np.arange(n_chunks).reshape(-1, interleave).T.reshape(-1)
            order = order.reshape(n_chunks, mcfg.n_sample_chunk)[perm].reshape(-1)
        return act_seqs[order]

    def all_rewards(params, state_cur, act_seqs, physics_param):
        """(n_sample, L, 4) -> rewards (n_sample,), finals (n_sample, nobj, 3)."""
        act_seqs = sort_by_repeat(act_seqs)
        chunks = act_seqs.reshape(n_chunks, mcfg.n_sample_chunk, mcfg.n_look_ahead, 4)
        r, f = jax.lax.map(lambda a: chunk_rewards(params, state_cur, a, physics_param), chunks)
        return (act_seqs, r.reshape(mcfg.n_sample),
                f.reshape(mcfg.n_sample, *f.shape[2:]))

    if mesh is not None:
        n_dev = mesh.devices.size
        assert n_chunks % n_dev == 0, (n_chunks, n_dev)
        local_chunks = n_chunks // n_dev

        def sharded_rewards(params, state_cur, act_seqs, physics_param):
            act_seqs = sort_by_repeat(act_seqs, interleave=n_dev)

            def body(p, s, a, ph):
                chunks = a.reshape(local_chunks, mcfg.n_sample_chunk, mcfg.n_look_ahead, 4)
                r, f = jax.lax.map(lambda c: chunk_rewards(p, s, c, ph), chunks)
                return (
                    r.reshape(local_chunks * mcfg.n_sample_chunk),
                    f.reshape(local_chunks * mcfg.n_sample_chunk, *f.shape[2:]),
                )

            r, f = jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P(), P(axis), P()),
                out_specs=(P(axis), P(axis)),
                # pallas_call results carry no varying-mesh-axes metadata;
                # vma checking must be off for the fused kernels to run
                # per-shard inside the body
                check_vma=False,
            )(params, state_cur, act_seqs, physics_param)
            return act_seqs, r, f

        rewards_fn = sharded_rewards
    else:
        rewards_fn = all_rewards

    @functools.partial(jax.jit, static_argnames=("iter_index",))
    def solve_iter(params, state_cur, act_seq, key, physics_param, iter_index):
        act_seqs = sample_action_seq(
            key, act_seq, lower, upper, mcfg.n_sample,
            iter_index=iter_index, noise_level=mcfg.noise_level,
            push_length=mcfg.push_length,
        )
        act_seqs, rewards, finals = rewards_fn(params, state_cur, act_seqs, physics_param)
        new_seq = optimize_action_mppi(
            act_seqs, rewards, mcfg.reward_weight, lower, upper, mcfg.push_length
        )
        best = jnp.argmax(rewards)
        return new_seq, act_seqs[best], rewards[best], finals[best]

    def solve(params, state_cur, act_seq, key, physics_param):
        """Host loop over fused iterations; tracks the best sampled sequence
        across iterations (planner.py:253-266). Best tracking stays ON DEVICE
        (jnp.where) — a float() compare here costs a ~100 ms host round trip
        per update iteration through the remote-TPU path."""
        best_seq, best_reward, best_final = None, None, None
        for i in range(mcfg.n_update_iter):
            key, k = jax.random.split(key)
            # iter_index is static: only 0 vs nonzero changes the program
            act_seq, it_seq, it_reward, it_final = solve_iter(
                params, state_cur, act_seq, k, physics_param, min(i, 1)
            )
            if best_seq is None:
                best_seq, best_reward, best_final = it_seq, it_reward, it_final
            else:
                better = it_reward > best_reward
                best_seq = jnp.where(better, it_seq, best_seq)
                best_final = jnp.where(better, it_final, best_final)
                best_reward = jnp.maximum(it_reward, best_reward)
        return {
            "act_seq": best_seq,
            "mppi_seq": act_seq,
            "best_reward": best_reward,
            "best_final_state": best_final,
        }

    return solve
