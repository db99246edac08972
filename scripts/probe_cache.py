#!/usr/bin/env python
"""Probe: does the persistent compilation cache work through the axon
remote-TPU backend? Run this twice in two fresh processes; if the second
run's compile+first-op time collapses and the cache dir is non-empty after
the first, the 20k-sample plan program's >25-min remote compile is a
one-time cost (the round-4 unblock for reference-budget planning)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptigraph_tpu.utils.jaxcache import enable_persistent_cache

path = enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.graph import EdgeConfig
from adaptigraph_tpu.ops.costs import chamfer
from adaptigraph_tpu.planning.forward import DynamicsConfig
from adaptigraph_tpu.planning.mppi_solve import MPPIConfig, make_mppi_solver


def main():
    gnn = GNNConfig(n_his=4, max_nobj=100, max_neef=1, nf_particle=128,
                    nf_relation=128, nf_effect=128, pstep=3)
    dcfg = DynamicsConfig(gnn=gnn, edge=EdgeConfig(max_nobj=100, max_neef=1, topk=10),
                          n_his=4, push_length=0.1, max_repeat=15, adj_thresh=0.5)
    # tiny budget but the full program structure (chunked lax.map + fused path)
    mcfg = MPPIConfig(n_sample=200, n_sample_chunk=100, n_look_ahead=1)
    rng = np.random.RandomState(0)
    state = jnp.asarray(rng.randn(100, 3).astype(np.float32) * 0.3)
    target = state + jnp.asarray([0.5, 0.0, 0.3])

    def reward_fn(s, a, c):
        return -chamfer(s[:, -1], jnp.broadcast_to(target[None], (s.shape[0],) + target.shape))

    lower = np.asarray([-4.5, -2.5, -np.pi, 5.0], np.float32)
    upper = np.asarray([0.0, 4.5, np.pi, 15.0], np.float32)
    solve = make_mppi_solver(dcfg, mcfg, reward_fn, lower, upper,
                             use_fused=jax.default_backend() == "tpu")
    params = init_params(jax.random.PRNGKey(0), gnn)
    t0 = time.time()
    r = solve(params, state, jnp.asarray([[-2.0, 1.0, 0.5, 8.0]], jnp.float32),
              jax.random.PRNGKey(1), jnp.asarray([0.5]))
    jax.block_until_ready(r["best_final_state"])
    t1 = time.time() - t0
    n_entries = len(os.listdir(path)) if path and os.path.isdir(path) else 0
    print(json.dumps({"backend": jax.default_backend(),
                      "compile_plus_first_solve_s": round(t1, 1),
                      "cache_dir": path, "cache_entries": n_entries,
                      "best_reward": float(r["best_reward"])}))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)  # skip axon-tunnel teardown (see bench.py)
