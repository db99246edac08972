#!/usr/bin/env python
"""Isolate the cost centers INSIDE the fused GNN kernel at MPPI scale.

Variants (all batch 2000, rope config, S=4):
  full        — production kernel (in-kernel edge build + gathers + MLPs)
  no_edge     — skip the D-matrix/topk loop; one-hots = trivial shifted identity
  no_gather   — replace gather_s with tileK (same shapes, no one-hot matmuls)
  mlp_only    — both of the above: just the MLP/message-passing matmuls
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaptigraph_tpu.models.gnn import GNNConfig, init_params

GNN = GNNConfig(n_his=4, max_nobj=100, max_neef=1, nf_particle=128,
                nf_relation=128, nf_effect=128, pstep=3)
B = 2000
TOPK = 10
ADJ = 0.5


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_fn(variant, S=4):
    from adaptigraph_tpu.ops import fused_gnn as fg

    cfg = GNN
    Np = _round_up(cfg.n_nodes, 8)
    K = TOPK
    KN = K * Np
    f32 = jnp.float32
    cd = jnp.bfloat16

    def kernel(p_inputs_ref, state_norm_ref, attrs_ref, g_ref, last_state_ref,
               *wrefs):
        (pe0w, pe0b, pe1w, pe1b, pe2w, pe2b,
         re0w, re0b, re1w, re1b, re2w, re2b,
         rp_w1, rp_w2, rp_w3, rp_b,
         pp_wa, pp_wb, pp_b,
         nr0w, nr0b, nr1w, nr1b, nr2w, nr2b,
         pred_ref) = wrefs

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)

        def mlp3(x, w0, b0, w1, b1, w2, b2, final_relu):
            x = jnp.maximum(dot(x, w0[:]) + b0[:], 0.0).astype(cd)
            x = jnp.maximum(dot(x, w1[:]) + b1[:], 0.0).astype(cd)
            x = dot(x, w2[:]) + b2[:]
            return (jnp.maximum(x, 0.0) if final_relu else x).astype(cd)

        def tileK(x):
            return jnp.concatenate(
                [jnp.concatenate([x[s * Np:(s + 1) * Np]] * K, axis=0)
                 for s in range(S)], axis=0) if S > 1 else jnp.concatenate([x] * K, 0)

        if variant in ("full", "no_gather"):
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0).astype(f32)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1).astype(f32)
            N_real, max_nobj = cfg.n_nodes, cfg.max_nobj
            valid_c = (iota_c < N_real).astype(f32)
            tool_r = (iota_r >= max_nobj).astype(f32) * (iota_r < N_real).astype(f32)
            tool_c = (iota_c >= max_nobj).astype(f32) * (iota_c < N_real).astype(f32)
            pair_ok = valid_c * (1.0 - tool_r * tool_c)
            row_valid = (iota_r < N_real).astype(f32)[:, 0:1]
            BIG = jnp.float32(1e10)
            thresh = jnp.float32(ADJ * ADJ)
            ohs, masks = [], []
            for s in range(S):
                xs = last_state_ref[0, s * Np:(s + 1) * Np].astype(f32)
                D = jnp.zeros((Np, Np), f32)
                for d in range(3):
                    cd_ = xs[:, d:d + 1]
                    diff = cd_ - cd_.reshape(1, Np)
                    D = D + diff * diff
                D = D * pair_ok + (1.0 - pair_ok) * BIG
                oh_rows, mk_rows = [], []
                for _k in range(TOPK):
                    m = jnp.min(D, axis=1, keepdims=True)
                    mb = jnp.broadcast_to(m, (Np, Np))
                    cand = (D <= mb).astype(f32)
                    idx = jnp.min(iota_c * cand + (1.0 - cand) * Np, axis=1,
                                  keepdims=True)
                    oh = (iota_c == jnp.broadcast_to(idx, (Np, Np))).astype(cd)
                    ok2 = ((mb < thresh).astype(f32) *
                           (mb < BIG * 0.5).astype(f32))[:, 0:1]
                    mk_rows.append(ok2 * row_valid)
                    oh_rows.append(oh)
                    D = D + oh.astype(f32) * BIG
                ohs.append(jnp.concatenate(oh_rows, axis=0))
                masks.append(jnp.concatenate(mk_rows, axis=0))
            mask = (jnp.concatenate(masks, 0) if S > 1 else masks[0]).astype(cd)
        else:
            # trivial shifted identities, no distance work
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
            ohs = []
            for s in range(S):
                rows = [( (iota_c == ((iota_r + k) % Np)).astype(cd))
                        for k in range(TOPK)]
                ohs.append(jnp.concatenate(rows, axis=0))
            mask = jnp.ones((S * KN, 1), cd)

        if variant in ("no_gather", "mlp_only"):
            def gather_s(x):
                return tileK(x)
        else:
            def gather_s(x):
                outs = [dot(ohs[s], x[s * Np:(s + 1) * Np]).astype(cd)
                        for s in range(S)]
                return jnp.concatenate(outs, 0) if S > 1 else outs[0]

        attrs = attrs_ref[0].astype(cd)
        state_norm = state_norm_ref[0].astype(cd)
        g = g_ref[0].astype(cd)
        rel_inputs = jnp.concatenate(
            [tileK(attrs), gather_s(attrs),
             jnp.abs(tileK(g) - gather_s(g)),
             tileK(state_norm) - gather_s(state_norm)], axis=-1)

        p_inputs = p_inputs_ref[0].astype(cd)
        particle_encode = mlp3(p_inputs, pe0w, pe0b, pe1w, pe1b, pe2w, pe2b, True)
        relation_encode = mlp3(rel_inputs, re0w, re0b, re1w, re1b, re2w, re2b, True)

        rel_base = (dot(relation_encode, rp_w1[:]) + rp_b[:]).astype(cd)
        part_base = (dot(particle_encode, pp_wa[:]) + pp_b[:]).astype(cd)
        effect = particle_encode
        for _ in range(cfg.pstep):
            recv = dot(effect, rp_w2[:]).astype(cd)
            send = gather_s(dot(effect, rp_w3[:]).astype(cd))
            eff_rel = jnp.maximum(rel_base + tileK(recv) + send, 0.0)
            masked = (eff_rel * mask).astype(cd)
            aggs = []
            for s in range(S):
                a = masked[s * KN: s * KN + Np].astype(f32)
                for k in range(1, K):
                    a = a + masked[s * KN + k * Np: s * KN + (k + 1) * Np].astype(f32)
                aggs.append(a)
            agg = jnp.concatenate(aggs, 0) if S > 1 else aggs[0]
            effect = jnp.maximum(
                part_base + dot(agg.astype(cd), pp_wb[:]).astype(cd) + effect, 0.0
            ).astype(cd)

        motion = mlp3(effect, nr0w, nr0b, nr1w, nr1b, nr2w, nr2b, False).astype(f32)
        pred_ref[0] = last_state_ref[0].astype(f32) + jnp.clip(motion, -100, 100)

    # ---- driver ----
    rng = np.random.RandomState(0)
    params = init_params(jax.random.PRNGKey(0), GNN)
    N = cfg.n_nodes
    n_his = cfg.n_his
    nB = B // S

    state = rng.randn(B, n_his, N, 3).astype(np.float32) * 0.5
    state_res = state[:, 1:] - state[:, :-1]
    state_norm = np.concatenate([state_res, state[:, -1:]], 1)
    state_norm_t = np.moveaxis(state_norm, 1, 2).reshape(B, N, n_his * 3)
    attrs = np.zeros((B, N, 2), np.float32)
    attrs[:, :100, 0] = 1.0
    attrs[:, 100:, 1] = 1.0
    g = np.ones((B, N, 1), np.float32)
    g[:, 100:] = 0.0
    p_inputs = np.concatenate(
        [attrs, np.full((B, N, 1), 0.5, np.float32),
         rng.randn(B, N, 3).astype(np.float32) * 0.05], -1)
    last_state = state[:, -1]

    def padN(x):
        return np.pad(x, [(0, 0), (0, Np - N)] + [(0, 0)] * (x.ndim - 2))

    def blockS(x):
        return jnp.asarray(x.reshape(nB, S * Np, *x.shape[2:]))

    ins = [blockS(padN(p_inputs)), blockS(padN(state_norm_t)),
           blockS(padN(attrs)), blockS(padN(g)), blockS(padN(last_state))]

    p = params
    nf = cfg.nf_effect

    def w(x):
        return jnp.asarray(x, cd)

    weights = [
        w(p["particle_encoder"][0]["w"]), w(p["particle_encoder"][0]["b"]),
        w(p["particle_encoder"][1]["w"]), w(p["particle_encoder"][1]["b"]),
        w(p["particle_encoder"][2]["w"]), w(p["particle_encoder"][2]["b"]),
        w(p["relation_encoder"][0]["w"][:17 - 14 + 14]), w(p["relation_encoder"][0]["b"]),
        w(p["relation_encoder"][1]["w"]), w(p["relation_encoder"][1]["b"]),
        w(p["relation_encoder"][2]["w"]), w(p["relation_encoder"][2]["b"]),
        w(p["relation_propagator"]["w"][:nf]),
        w(p["relation_propagator"]["w"][nf:2 * nf]),
        w(p["relation_propagator"]["w"][2 * nf:]),
        w(p["relation_propagator"]["b"]),
        w(p["particle_propagator"]["w"][:nf]),
        w(p["particle_propagator"]["w"][nf:]),
        w(p["particle_propagator"]["b"]),
        w(p["non_rigid_predictor"][0]["w"]), w(p["non_rigid_predictor"][0]["b"]),
        w(p["non_rigid_predictor"][1]["w"]), w(p["non_rigid_predictor"][1]["b"]),
        w(p["non_rigid_predictor"][2]["w"]), w(p["non_rigid_predictor"][2]["b"]),
    ]

    def block1(shape):
        return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def wspec(arr):
        return pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    in_specs = [block1(x.shape[1:]) for x in ins] + [wspec(x) for x in weights]

    @jax.jit
    def run():
        return pl.pallas_call(
            kernel,
            grid=(nB,),
            in_specs=in_specs,
            out_specs=block1((S * Np, 3)),
            out_shape=jax.ShapeDtypeStruct((nB, S * Np, 3), jnp.float32),
        )(*ins, *weights)

    return run


def timeit(name, fn, reps=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter() - t0) / reps * 1e3:8.3f} ms")


if __name__ == "__main__":
    for v in ("full", "no_edge", "no_gather", "mlp_only"):
        try:
            timeit(v, make_fn(v))
        except Exception as e:
            print(f"{v} failed: {type(e).__name__}: {str(e)[:200]}")
