#!/usr/bin/env python
"""Ablate the MPPI substep cost on the real TPU.

Breaks one rope-config MPPI chunk into its parts and times each:
  1. fused kernel, in-kernel edge build (the production path)
  2. fused kernel, edges prebuilt outside (XLA edge pass + kernel)
  3. XLA forward_batch (no Pallas)
  4. full chunk rollout (15 substeps) via dynamics_rollout_batched
  5. XLA edge build alone

Prints one line per ablation: name, ms/iter.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, init_params, forward_batch
from adaptigraph_tpu.ops.fused_gnn import fused_forward_batch
from adaptigraph_tpu.ops.graph import EdgeConfig, build_neighbor_graph_batch
from adaptigraph_tpu.planning.forward import DynamicsConfig, dynamics_rollout_batched

GNN = GNNConfig(n_his=4, max_nobj=100, max_neef=1, nf_particle=128,
                nf_relation=128, nf_effect=128, pstep=3)
EDGE = EdgeConfig(max_nobj=100, max_neef=1, topk=10)
DCFG = DynamicsConfig(gnn=GNN, edge=EDGE, n_his=4, push_length=0.1,
                      sim_real_ratio=10.0, max_repeat=15, adj_thresh=0.5)
B = 2000
N = GNN.n_nodes


def timeit(name, fn, reps=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:50s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    params = init_params(jax.random.PRNGKey(0), GNN)
    state = jnp.asarray(rng.randn(B, 4, N, 3).astype(np.float32) * 0.5)
    attrs = jnp.zeros((B, N, 2)).at[:, :100, 0].set(1.0).at[:, 100:, 1].set(1.0)
    action = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.05)
    p_inst = jnp.ones((B, 100, 1))
    phys = jnp.broadcast_to(jnp.asarray([0.5]), (B, 1))
    state_mask = jnp.ones((B, N), bool)
    eef_mask = jnp.zeros((B, N), bool).at[:, 100:].set(True)

    g_base = {"state": state, "attrs": attrs, "action": action,
              "p_instance": p_inst, "physics_param": phys}

    @jax.jit
    def edges_only(s):
        return build_neighbor_graph_batch(s[:, -1], state_mask, eef_mask, 0.5, EDGE)

    nbrs, mask = edges_only(state)
    g_ext = dict(g_base, neighbors=nbrs, nbr_mask=mask)

    for spb in (1, 2, 4):
        timeit(f"fused kernel, in-kernel edges, S={spb}",
               lambda spb=spb: fused_forward_batch(
                   params, g_base, GNN, build_edges=True, adj_radius=0.5,
                   edge_topk=10, samples_per_block=spb))
    for spb in (2, 4, 8):
        try:
            timeit(f"fused kernel, ext edges, S={spb}",
                   lambda spb=spb: fused_forward_batch(
                       params, g_ext, GNN, k_used=11, samples_per_block=spb))
        except Exception as e:
            print(f"fused ext S={spb} failed: {type(e).__name__}: {str(e)[:120]}")
    timeit("XLA edge build alone",
           lambda: edges_only(state))
    timeit("XLA forward_batch (bf16)",
           lambda: forward_batch(params, g_ext, GNN, compute_dtype=jnp.bfloat16))

    acts = jnp.asarray(
        np.stack([rng.uniform(-4.5, 0, B), rng.uniform(-2.5, 4.5, B),
                  rng.uniform(-np.pi, np.pi, B), rng.uniform(5, 15, B)],
                 1).astype(np.float32))[:, None, :]
    st0 = jnp.asarray(rng.randn(100, 3).astype(np.float32) * 0.5)
    ph1 = jnp.asarray([0.5])
    t = timeit("full chunk rollout (<=15 substeps, dynamic)",
               lambda: dynamics_rollout_batched(params, st0, acts, ph1, DCFG,
                                                use_fused=True)["state_seqs"],
               reps=5)
    print(f"  -> per substep (15): {t / 15:.3f} ms")
    t = timeit("full chunk rollout (fixed 15-substep scan)",
               lambda: dynamics_rollout_batched(params, st0, acts, ph1, DCFG,
                                                use_fused=True,
                                                dynamic_substeps=False)["state_seqs"],
               reps=5)
    print(f"  -> per substep (15): {t / 15:.3f} ms")


if __name__ == "__main__":
    main()
