#!/usr/bin/env python
"""Ablate the jitted train step on the real TPU at the rope budget.

Times (batch 128, rope config): full train step, loss-only forward,
value_and_grad without optimizer, edge build alone, and single XLA
forward_batch — to show where a differentiable fused kernel would pay.

Timing through the remote tunnel: block on a host transfer of a scalar
(block_until_ready alone under-reports through the axon path).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from adaptigraph_tpu.models.gnn import GNNConfig, init_params, forward
from adaptigraph_tpu.ops.graph import EdgeConfig, build_neighbor_graph
from adaptigraph_tpu.dynamics.train import TrainHyper, make_train_step, multi_step_loss

GNN = GNNConfig(n_his=4, max_nobj=100, max_neef=1, nf_particle=128,
                nf_relation=128, nf_effect=128, pstep=3)
EDGE = EdgeConfig(max_nobj=100, max_neef=1, topk=10)
HYPER = TrainHyper(n_future=3, batch_size=128)
B = 128
N = GNN.n_nodes


def make_batch(rng, i):
    state = rng.randn(B, 4, N, 3).astype(np.float32) * 0.3 + i * 0.001
    return {
        "state": state,
        "action": rng.randn(B, N, 3).astype(np.float32) * 0.01,
        "eef_future": rng.randn(B, 2, N, 3).astype(np.float32) * 0.3,
        "action_future": rng.randn(B, 2, N, 3).astype(np.float32) * 0.01,
        "state_future": rng.randn(B, 3, 100, 3).astype(np.float32) * 0.3,
        "attrs": np.zeros((B, N, 2), np.float32),
        "p_instance": np.ones((B, 100, 1), np.float32),
        "state_mask": np.ones((B, N), bool),
        "eef_mask": np.zeros((B, N), bool),
        "obj_mask": np.ones((B, 100), bool),
        "physics_param": np.full((B, 1), 0.5, np.float32),
        "adj_thresh": np.full(B, 0.5, np.float32),
        "knn_frac": np.full(B, 1.0, np.float32),
    }


def _sync(out):
    # reduce to one scalar ON DEVICE, fetch 4 bytes (a full-array fetch
    # through the remote tunnel would swamp the timing)
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timeit(name, fn, batches, reps=10):
    _sync(fn(batches[-1]))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(batches[i % len(batches)])
    _sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:45s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    params = init_params(jax.random.PRNGKey(0), GNN)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    batches = [jax.device_put(make_batch(rng, i)) for i in range(4)]
    key = jax.random.PRNGKey(1)

    step = make_train_step(GNN, EDGE, HYPER, optimizer)
    # the train step donates params/opt_state; keep the originals for the
    # later ablations by handing the step its own copies
    p = jax.tree_util.tree_map(jnp.copy, params)
    o = jax.tree_util.tree_map(jnp.copy, opt_state)

    def full(b):
        nonlocal p, o
        p, o, loss = step(p, o, b, key)
        return loss

    timeit("full train step (aug+edges+3-future+adam)", full, batches)

    loss_j = jax.jit(lambda pp, b: multi_step_loss(pp, b, GNN, EDGE, 3, False))
    timeit("loss only (fwd x3 + edges)", lambda b: loss_j(params, b), batches)

    def _vg(pp, b):
        loss, grads = jax.value_and_grad(
            lambda q: multi_step_loss(q, b, GNN, EDGE, 3, False))(pp)
        # keep the backward alive: fold every grad leaf into the scalar
        return loss + sum(jnp.sum(g) * 0.0 + jnp.max(jnp.abs(g)) * 1e-12
                          for g in jax.tree_util.tree_leaves(grads))

    vg = jax.jit(_vg)
    timeit("value_and_grad (no optimizer)", lambda b: vg(params, b), batches)

    build = jax.jit(jax.vmap(
        lambda s, nm, tm, r, k: build_neighbor_graph(s, nm, tm, r, EDGE, k)))
    timeit("edge build alone", lambda b: build(
        b["state"][:, -1], b["state_mask"], b["eef_mask"], b["adj_thresh"],
        b["knn_frac"])[0].astype(np.float32), batches)

    fwd = jax.jit(lambda pp, b, nb, mk: jax.vmap(
        lambda g: forward(pp, g, GNN))(dict(
            state=b["state"], attrs=b["attrs"], neighbors=nb, nbr_mask=mk,
            action=b["action"], p_instance=b["p_instance"],
            physics_param=b["physics_param"]))[0])
    b0 = batches[0]
    nb, mk = build(b0["state"][:, -1], b0["state_mask"], b0["eef_mask"],
                   b0["adj_thresh"], b0["knn_frac"])
    timeit("single XLA forward_batch", lambda b: fwd(params, b, nb, mk), batches)


if __name__ == "__main__":
    main()
