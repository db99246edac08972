#!/usr/bin/env python
"""Diagnose the batched rollout evaluator's throughput (VERDICT r2 weak #2).

Times rollout_scan_batched at several batch sizes with the fused Pallas
forward vs the plain-XLA batched forward, inputs fully device-staged, and
separately times the two pieces of one step (batch edge build vs forward) to
localize where the time goes. Prints one JSON line per configuration.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.graph import EdgeConfig
from adaptigraph_tpu.dynamics.rollout import rollout_scan_batched

GNN = GNNConfig(n_his=4, max_nobj=100, max_neef=1, nf_particle=128,
                nf_relation=128, nf_effect=128, pstep=3)
EDGE = EdgeConfig(max_nobj=100, max_neef=1, topk=10)


def stage(B, n_steps, rng):
    N = GNN.n_nodes
    kw = dict(
        state_history=rng.randn(B, 4, N, 3).astype(np.float32) * 0.3,
        eef_seq=rng.randn(B, n_steps, 1, 3).astype(np.float32) * 0.3,
        gt_seq=rng.randn(B, n_steps, 100, 3).astype(np.float32) * 0.3,
        state_mask=np.ones((B, N), bool),
        eef_mask=np.zeros((B, N), bool),
        attrs=np.zeros((B, N, 2), np.float32),
        p_instance=np.ones((B, 100, 1), np.float32),
        physics_param=np.full((B, 1), 0.5, np.float32),
        obj_count=np.full((B,), 100, np.int32),
        step_valid=np.ones((B, n_steps), bool),
    )
    kw["eef_mask"][:, 100] = True
    kw["attrs"][:, :100, 0] = 1.0
    kw["attrs"][:, 100, 1] = 1.0
    return jax.device_put(kw)


def run(B, n_steps=64, reps=5):
    rng = np.random.RandomState(1)
    params = init_params(jax.random.PRNGKey(0), GNN)
    kw = stage(B, n_steps, rng)
    out = {"B": B, "n_steps": n_steps}
    for fused in (False, True):
        try:
            err, _ = rollout_scan_batched(params, **kw, adj_thresh=jnp.asarray(0.5),
                                          gnn_cfg=GNN, edge_cfg=EDGE, use_fused=fused)
            jax.block_until_ready(err)
            t0 = time.time()
            for i in range(reps):
                err, _ = rollout_scan_batched(
                    params, **kw, adj_thresh=jnp.asarray(0.5 + i * 1e-6),
                    gnn_cfg=GNN, edge_cfg=EDGE, use_fused=fused)
            jax.block_until_ready(err)
            dt = (time.time() - t0) / reps
            out["fused" if fused else "xla"] = round(B * n_steps / dt, 1)
            out[("fused" if fused else "xla") + "_us_per_step"] = round(
                dt / n_steps * 1e6, 1)
        except Exception as e:
            out["fused" if fused else "xla"] = f"error: {e!r}"
    print(json.dumps(out), flush=True)


def time_parts(B=16, reps=20):
    """One-step decomposition: edge build vs forward (XLA and fused)."""
    from adaptigraph_tpu.models.gnn import forward_batch
    from adaptigraph_tpu.ops.graph import build_neighbor_graph_batch
    from adaptigraph_tpu.ops.fused_gnn import fused_forward_batch, _supports
    from adaptigraph_tpu.planning.forward import _spb_for

    rng = np.random.RandomState(1)
    params = init_params(jax.random.PRNGKey(0), GNN)
    kw = stage(B, 1, rng)
    hist = kw["state_history"]

    eb = jax.jit(lambda s: build_neighbor_graph_batch(
        s, kw["state_mask"], kw["eef_mask"], 0.5, EDGE))
    nbrs, mask = eb(hist[:, -1])
    jax.block_until_ready(nbrs)
    t0 = time.time()
    for i in range(reps):
        nbrs, mask = eb(hist[:, -1] + i * 1e-6)
    jax.block_until_ready(nbrs)
    edge_us = (time.time() - t0) / reps * 1e6

    graph = {"state": hist, "attrs": kw["attrs"], "neighbors": nbrs,
             "nbr_mask": mask, "action": jnp.zeros_like(hist[:, 0]),
             "p_instance": kw["p_instance"], "physics_param": kw["physics_param"]}
    fw = jax.jit(lambda g: forward_batch(params, g, GNN)[0])
    p = fw(graph)
    jax.block_until_ready(p)
    t0 = time.time()
    for i in range(reps):
        graph["action"] = jnp.full_like(graph["action"], i * 1e-6)
        p = fw(graph)
    jax.block_until_ready(p)
    xla_us = (time.time() - t0) / reps * 1e6

    fused_us = None
    if jax.default_backend() == "tpu" and _supports(GNN):
        spb = _spb_for(GNN, EDGE)
        ff = jax.jit(lambda g: fused_forward_batch(
            params, g, GNN, compute_dtype=jnp.float32,
            k_used=EDGE.topk + EDGE.max_neef, want_motion=False,
            samples_per_block=spb)[0])
        p = ff(graph)
        jax.block_until_ready(p)
        t0 = time.time()
        for i in range(reps):
            graph["action"] = jnp.full_like(graph["action"], i * 1e-6)
            p = ff(graph)
        jax.block_until_ready(p)
        fused_us = (time.time() - t0) / reps * 1e6
    print(json.dumps({"part_B": B, "edge_us": round(edge_us, 1),
                      "xla_fwd_us": round(xla_us, 1),
                      "fused_fwd_us": round(fused_us, 1) if fused_us else None,
                      "spb": _spb_for(GNN, EDGE)}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    time_parts(16)
    for B in (16, 64, 256):
        run(B)
