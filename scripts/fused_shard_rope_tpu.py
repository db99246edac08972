#!/usr/bin/env python
"""On-TPU evidence that the fused Pallas kernels compose with shard_map at
ROPE WIDTH (VERDICT r2 weak #5): N=101 nodes, nf=128, the real MPPI solve.

Single chip is fine for kernel correctness under shard_map — a 1-device mesh
still routes the fused pallas_call through the shard_map body and exercises
the all-gather/psum plumbing. Compares the sharded-fused solve against the
unsharded-fused and unsharded-XLA solves on identical inputs and prints one
JSON line with the rewards and deltas.
"""

import json
import os
import sys

# robust when the editable install is absent (observed: lost mid-round)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
from adaptigraph_tpu.ops.graph import EdgeConfig
from adaptigraph_tpu.ops.costs import chamfer
from adaptigraph_tpu.parallel.mesh import make_mesh
from adaptigraph_tpu.planning.forward import DynamicsConfig
from adaptigraph_tpu.planning.mppi_solve import MPPIConfig, make_mppi_solver

GNN = GNNConfig(n_his=4, max_nobj=100, max_neef=1, nf_particle=128,
                nf_relation=128, nf_effect=128, pstep=3)
EDGE = EdgeConfig(max_nobj=100, max_neef=1, topk=10)
DCFG = DynamicsConfig(gnn=GNN, edge=EDGE, n_his=4, push_length=0.1,
                      sim_real_ratio=10.0, max_repeat=15, adj_thresh=0.5)
MCFG = MPPIConfig(n_sample=2000, n_sample_chunk=500, n_look_ahead=1,
                  n_update_iter=1, reward_weight=500.0, noise_level=1.0)
LOWER = np.asarray([-4.5, -2.5, -np.pi, 5.0], np.float32)
UPPER = np.asarray([0.0, 4.5, np.pi, 15.0], np.float32)


def main():
    rng = np.random.RandomState(0)
    t = np.linspace(0, 2.0, 100)
    pts = np.stack([-2.0 + np.sin(t * 2) * 0.3, 0.05 * np.ones_like(t), t], 1)
    state = jnp.asarray((pts + rng.randn(100, 3) * 0.01).astype(np.float32))
    target = state + jnp.asarray([0.5, 0.0, 0.3])

    def reward_fn(state_seqs, act_seqs, state_cur):
        B = state_seqs.shape[0]
        err = chamfer(state_seqs[:, -1],
                      jnp.broadcast_to(target[None], (B,) + target.shape))
        return -err

    params = init_params(jax.random.PRNGKey(0), GNN)
    act0 = jnp.asarray(np.array([[-2.0, 1.0, 0.5, 8.0]], np.float32))
    key = jax.random.PRNGKey(7)
    phys = jnp.asarray([0.5])

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    variants = {
        "xla": make_mppi_solver(DCFG, MCFG, reward_fn, LOWER, UPPER,
                                use_fused=False),
        "fused": make_mppi_solver(DCFG, MCFG, reward_fn, LOWER, UPPER,
                                  use_fused=True),
        "fused_shard": make_mppi_solver(DCFG, MCFG, reward_fn, LOWER, UPPER,
                                        use_fused=True, mesh=mesh),
    }
    out = {"device": str(jax.devices()[0]), "n_devices": n_dev,
           "N": GNN.n_nodes, "nf": GNN.nf_effect, "n_sample": MCFG.n_sample}
    res = {}
    for name, solve in variants.items():
        r = solve(params, state, act0, key, phys)
        res[name] = r
        out[name + "_best_reward"] = round(float(r["best_reward"]), 6)
    # same key + same sample budget => identical sample sets; the sharded
    # solve only reorders chunks across devices, so best reward must match
    out["fused_vs_xla_reward_delta"] = round(
        abs(out["fused_best_reward"] - out["xla_best_reward"]), 6)
    out["shard_vs_fused_reward_delta"] = round(
        abs(out["fused_shard_best_reward"] - out["fused_best_reward"]), 6)
    out["shard_final_state_maxdiff"] = round(float(jnp.max(jnp.abs(
        res["fused_shard"]["best_final_state"] - res["fused"]["best_final_state"]))), 6)
    out["ok"] = bool(out["shard_vs_fused_reward_delta"] < 1e-3
                     and out["fused_vs_xla_reward_delta"] < 5e-2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
    import os
    import sys

    sys.stdout.flush()
    os._exit(0)  # skip axon-tunnel teardown (see bench.py)
