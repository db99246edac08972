"""Fused Pallas TPU kernel for the full GNN dynamics forward.

The XLA version of the forward (models/gnn.py) materializes every
edge-sized ``(B, N, K, F)`` tensor in HBM; at MPPI batch sizes that is
~1 GB of traffic per message-passing step and dominates the solve
(ablated on TPU v5e: ~48 ms per batch-2000 forward inside the substep
scan). This kernel runs ``S`` samples per grid program and keeps
everything — one-hot sender matrices, relation encodings, all ``pstep``
iterations, the motion head — in VMEM:

  HBM reads per sample: packed node features + positions (~7 KB)
  HBM writes per sample: predicted positions (~1 KB)

Layout: everything edge-sized is 2D ``(S * Ku * N_pad, ·)`` with ``N_pad`` a
multiple of 8, so Mosaic sees only tile-aligned 2D ops — the per-sample
sender gather is a ``(Ku*N_pad, N_pad) @ (N_pad, F)`` one-hot MXU matmul,
receiver broadcast is a K-fold sublane concat, and aggregation is Ku
aligned sublane slices summed. (A 3D ``(K, N, N)`` dot_general formulation
hits an unsupported Mosaic shape cast.) On top of that, measured-on-v5e
batching tricks:

- ``k_used`` drops always-masked neighbor slots: ``EdgeConfig.K`` is
  tile-padded for the XLA gather path (k_multiple=8 -> e.g. 16 slots for
  topk=10 + 1 tool slot), but inside the kernel edge rows are compute, so
  only the ``topk + max_neef`` real slots are processed (~31% fewer edge
  rows at rope scale).
- ``samples_per_block`` (S) stacks the edge rows of S samples for every
  *weight* matmul (encoders, propagators, head), amortizing per-program
  overhead and filling the MXU; only the one-hot gathers stay per-sample.
- the in-kernel edge build runs on ``(S*N_pad, N_pad)``-stacked tiles —
  one chain of VPU ops for all S samples instead of S chains of small ops.
- all cd-consumed node features ship as ONE packed bf16 input
  ``[p_inputs | state_norm | attrs | g]`` (single DMA, 4x less input VMEM
  than five separate 128-lane-padded f32 tensors); only the positions
  stay f32 (the edge build and the final ``pred = last + motion`` need
  exact distances/adds for parity with the XLA path).
- the sender features needed by the relation-feature block are gathered
  with ONE one-hot matmul per sample (``[state_norm | attrs | g]``
  concatenated) instead of three, and the two per-pstep node projections
  run as one ``(nf, 2nf)`` matmul.
- ``want_motion=False`` (the MPPI path — motion is unused there) drops
  the second kernel output and its DMA/VMEM cost.

Functionally identical to ``models.gnn.forward`` for configs with
``rel_particle_dim == rel_density_dim == density_dim == 0`` (all shipped
materials); parity is tested in tests/test_fused.py. Used on the inference
hot paths (MPPI, rollout); training keeps the XLA path for autodiff.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaptigraph_tpu.models.gnn import GNNConfig


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _supports(cfg: GNNConfig):
    return (
        cfg.rel_particle_dim == 0
        and cfg.rel_density_dim == 0
        and cfg.density_dim == 0
        and cfg.offset_dim == 0
        and cfg.rel_attr_dim == 2
        and cfg.rel_group_dim == 1
        and cfg.rel_distance_dim == 3
    )


def _stackS(xs, S):
    return jnp.concatenate(xs, axis=0) if S > 1 else xs[0]


def _kernel(cfg: GNNConfig, compute_dtype, Np, K, S, edge_build, Dp,
            want_motion,
            nodes_ref, nbr_ref, mask_ref, last_state_ref,
            pe0w, pe0b, pe1w, pe1b, pe2w, pe2b,
            re0w, re0b, re1w, re1b, re2w, re2b,
            rp_w1, rp_w23, rp_b,
            pp_wa, pp_wb, pp_b,
            nr0w, nr0b, nr1w, nr1b, nr2w, nr2b,
            *out_refs):
    f32 = jnp.float32
    cd = compute_dtype
    KN = K * Np
    SN = S * Np
    nf = cfg.nf_effect
    nh3 = cfg.n_his * 3

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def mlp3(x, w0, b0, w1, b1, w2, b2, final_relu):
        x = jnp.maximum(dot(x, w0[:]) + b0[:], 0.0).astype(cd)
        x = jnp.maximum(dot(x, w1[:]) + b1[:], 0.0).astype(cd)
        x = dot(x, w2[:]) + b2[:]
        return (jnp.maximum(x, 0.0) if final_relu else x).astype(cd)

    # Node arrays are stacked (S*Np, ·): sample s occupies rows [s*Np, (s+1)*Np).
    # Edge arrays are stacked (S*K*Np, ·): sample s occupies rows
    # [s*KN, (s+1)*KN), inner order (k, i).
    def tileK(x):  # (S*Np, F') -> (S*K*Np, F') receiver broadcast
        return jnp.concatenate(
            [jnp.concatenate([x[s * Np:(s + 1) * Np]] * K, axis=0) for s in range(S)],
            axis=0,
        ) if S > 1 else jnp.concatenate([x] * K, axis=0)

    # ---- one-hot sender matrices (per sample: (K*Np, Np)) + edge masks ----
    if edge_build is None:
        # one compare on the full (S*K*Np, Np) stack; per-sample slices below
        col = jax.lax.broadcasted_iota(jnp.int32, (S * KN, Np), 1)
        oh_all = (nbr_ref[0] == col).astype(cd)
        ohs = [oh_all[s * KN:(s + 1) * KN] for s in range(S)]
        mask = mask_ref[0].astype(cd)  # (S*K*Np, 1)
    else:
        # In-kernel radius∧topk edge construction (semantics of
        # ops.graph.build_neighbor_graph with policy "none", all object slots
        # valid — the MPPI rollout case): K == topk slots per receiver, the
        # slot-k one-hot IS the gather matrix. Ties break to the smallest
        # sender index, matching lax.top_k on negated distances.
        # All S samples' distance matrices are stacked into one (S*Np, Np)
        # tile chain — same arithmetic per row, ~S x fewer VPU op issues.
        # Comparisons stay on full 2D f32 tiles — Mosaic rejects compares on
        # (Np, 1)-shaped operands ("Target does not support this
        # comparison"); narrow results are f32-sliced afterward.
        topk, adj_thresh, max_nobj, N_real = edge_build
        iota_r1 = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0).astype(f32)
        iota_c1 = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1).astype(f32)
        valid_c1 = (iota_c1 < N_real).astype(f32)
        tool_r1 = (iota_r1 >= max_nobj).astype(f32) * (iota_r1 < N_real).astype(f32)
        tool_c1 = (iota_c1 >= max_nobj).astype(f32) * (iota_c1 < N_real).astype(f32)
        pair_ok = _stackS([valid_c1 * (1.0 - tool_r1 * tool_c1)] * S, S)  # (SN, Np)
        row_valid = _stackS([(iota_r1 < N_real).astype(f32)[:, 0:1]] * S, S)
        iota_c = _stackS([iota_c1] * S, S)
        BIG = jnp.float32(1e10)
        thresh = jnp.float32(adj_thresh * adj_thresh)
        xs = last_state_ref[0].astype(f32)  # (SN, 3)
        D = jnp.zeros((SN, Np), f32)
        for d in range(3):
            colv = xs[:, d:d + 1]  # (SN, 1)
            rowv = _stackS(
                [jnp.broadcast_to(xs[s * Np:(s + 1) * Np, d:d + 1].reshape(1, Np),
                                  (Np, Np)) for s in range(S)], S)
            diff = colv - rowv
            D = D + diff * diff
        D = D * pair_ok + (1.0 - pair_ok) * BIG
        oh_ks, mk_ks = [], []
        for _k in range(topk):
            m = jnp.min(D, axis=1, keepdims=True)  # (SN, 1)
            mb = jnp.broadcast_to(m, (SN, Np))
            cand = (D <= mb).astype(f32)
            # first minimal column: min over candidate column indices
            idx = jnp.min(iota_c * cand + (1.0 - cand) * Np, axis=1,
                          keepdims=True)
            oh = (iota_c == jnp.broadcast_to(idx, (SN, Np))).astype(cd)
            ok2 = ((mb < thresh).astype(f32) *
                   (mb < BIG * 0.5).astype(f32))[:, 0:1]  # (SN, 1)
            mk_ks.append(ok2 * row_valid)
            oh_ks.append(oh)
            D = D + oh.astype(f32) * BIG
        ohs = [
            jnp.concatenate([oh_ks[k][s * Np:(s + 1) * Np] for k in range(K)],
                            axis=0) for s in range(S)
        ]  # per sample (K*Np, Np)
        mask = _stackS(
            [jnp.concatenate([mk_ks[k][s * Np:(s + 1) * Np] for k in range(K)],
                             axis=0) for s in range(S)], S).astype(cd)

    def gather_s(x):  # (S*Np, F') -> (S*K*Np, F')
        outs = [dot(ohs[s], x[s * Np:(s + 1) * Np]).astype(cd) for s in range(S)]
        return jnp.concatenate(outs, axis=0) if S > 1 else outs[0]

    # ---- relation features (models/gnn.py:249-283 semantics) ----
    # packed node input columns: [p_inputs (Dp) | state_norm (nh3) | attrs (2) | g (1)]
    nodes = nodes_ref[0]  # (S*Np, Dp+nh3+3), already compute_dtype
    node_g = nodes[:, Dp:]            # [state_norm | attrs | g]
    T = tileK(node_g)                 # receiver side, one materialization
    G = gather_s(node_g)              # sender side, ONE one-hot matmul/sample
    rel_inputs = jnp.concatenate(
        [
            T[:, nh3:nh3 + 2],
            G[:, nh3:nh3 + 2],
            jnp.abs(T[:, nh3 + 2:] - G[:, nh3 + 2:]),  # n_instance == 1 group diff
            T[:, :nh3] - G[:, :nh3],
        ],
        axis=-1,
    )  # (S*K*Np, rel_in)

    # ---- encoders ----
    p_inputs = nodes[:, :Dp]  # (S*Np, Dp)
    particle_encode = mlp3(p_inputs, pe0w, pe0b, pe1w, pe1b, pe2w, pe2b, True)
    relation_encode = mlp3(rel_inputs, re0w, re0b, re1w, re1b, re2w, re2b, True)

    # ---- pstep message passing with hoisted linear terms ----
    rel_base = (dot(relation_encode, rp_w1[:]) + rp_b[:]).astype(cd)   # (S*K*Np, F)
    part_base = (dot(particle_encode, pp_wa[:]) + pp_b[:]).astype(cd)  # (S*Np, F)

    effect = particle_encode
    for _ in range(cfg.pstep):
        rs = dot(effect, rp_w23[:]).astype(cd)  # recv | send projections fused
        recv = rs[:, :nf]                       # (S*Np, F)
        send = gather_s(rs[:, nf:])             # (S*K*Np, F)
        eff_rel = jnp.maximum(rel_base + tileK(recv) + send, 0.0)
        masked = (eff_rel * mask).astype(cd)  # stays bf16; f32-accumulated below
        # sum the K slots per sample: rows s*KN + k*Np + i, k = 0..K-1
        aggs = []
        for s in range(S):
            a = masked[s * KN: s * KN + Np].astype(f32)
            for k in range(1, K):
                a = a + masked[s * KN + k * Np: s * KN + (k + 1) * Np].astype(f32)
            aggs.append(a)
        agg = jnp.concatenate(aggs, axis=0) if S > 1 else aggs[0]  # (S*Np, F)
        effect = jnp.maximum(
            part_base + dot(agg.astype(cd), pp_wb[:]).astype(cd) + effect, 0.0
        ).astype(cd)

    # ---- motion head (padded rows written too; sliced off outside) ----
    motion = mlp3(effect, nr0w, nr0b, nr1w, nr1b, nr2w, nr2b, False).astype(f32)
    clamped = jnp.clip(motion, -cfg.motion_clamp, cfg.motion_clamp)
    out_refs[0][0] = last_state_ref[0].astype(f32) + clamped
    if want_motion:
        out_refs[1][0] = motion


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "interpret", "k_used",
                     "samples_per_block", "build_edges", "adj_radius",
                     "edge_topk", "want_motion"),
)
def fused_forward_batch(params, graphs, cfg: GNNConfig, compute_dtype=jnp.bfloat16,
                        interpret=False, k_used=None, samples_per_block=2,
                        build_edges=False, adj_radius=None, edge_topk=None,
                        want_motion=True):
    """Batched fused forward. Same graph dict as ``forward_batch`` (leading
    batch dim on every field); returns (pred_pos, motion), (B, max_nobj, 3).

    k_used: number of real neighbor slots (``topk + max_neef``); defaults to
      the stored slot count. Slots >= k_used must be masked (EdgeConfig pads
      them with mask=False).
    samples_per_block: samples fused into one grid program (VMEM working set
      scales linearly; see the spb heuristic in planning/forward.py for the
      measured v5e ceilings).
    build_edges: construct the radius∧topk graph INSIDE the kernel from the
      last state frame (policy "none", all object slots valid — the MPPI
      rollout case). ``graphs`` then needs no neighbors/nbr_mask; pass
      ``adj_radius`` (static) and optionally ``edge_topk``. Saves the XLA
      edge-build pass and the neighbor-table HBM round trip per substep.
    want_motion: emit the raw-motion output (the MPPI path never reads it;
      False drops the second output tensor and its DMA). Returns
      ``(pred, None)`` when False.
    """
    assert _supports(cfg), "config not supported by the fused kernel"
    N = cfg.n_nodes
    n_p, n_s = cfg.max_nobj, cfg.max_neef
    Np = _round_up(N, 8)
    state = graphs["state"]
    B = state.shape[0]
    if build_edges:
        assert adj_radius is not None
        K = int(edge_topk)
    else:
        K_stored = graphs["neighbors"].shape[-1]
        K = min(k_used or K_stored, K_stored)
    n_his = cfg.n_his

    S = samples_per_block
    while B % S:  # batch must tile into S-sample blocks
        S //= 2
    nB = B // S

    def padN(x):
        # zero-pad the node axis (axis 1) N -> Np
        return jnp.pad(x, [(0, 0), (0, Np - N)] + [(0, 0)] * (x.ndim - 2))

    def blockS(x):
        # (B, Np, F) -> (nB, S*Np, F): stack S samples' node rows per block
        return x.reshape(nB, S * Np, *x.shape[2:])

    # ---- cheap node-level prep in XLA (O(B*N*small)) ----
    state_res = state[:, 1:] - state[:, :-1]
    state_norm = jnp.concatenate([state_res, state[:, -1:]], axis=1)
    state_norm_f = jnp.moveaxis(state_norm, 1, 2).reshape(B, N, n_his * 3)

    phys = graphs["physics_param"]
    if phys.ndim == 2 and phys.shape[-1] == cfg.phys_dim:
        phys_p = jnp.broadcast_to(phys[:, None, :], (B, n_p, cfg.phys_dim))
    else:
        phys_p = phys.reshape(B, n_p, cfg.phys_dim)
    phys_full = jnp.concatenate([phys_p, jnp.zeros((B, n_s, cfg.phys_dim), phys.dtype)], axis=1)

    parts = [graphs["attrs"]]
    if cfg.state_dim > 0:
        parts.append(state_norm_f)
    parts.append(phys_full)
    if cfg.action_dim > 0:
        parts.append(graphs["action"])
    p_inputs = jnp.concatenate(parts, axis=-1)
    Dp = p_inputs.shape[-1]

    g = jnp.concatenate(
        [graphs["p_instance"],
         jnp.zeros((B, n_s, cfg.n_instance), graphs["p_instance"].dtype)],
        axis=1,
    )
    # one packed bf16 node tensor: [p_inputs | state_norm | attrs | g]
    nodes = padN(
        jnp.concatenate([p_inputs, state_norm_f, graphs["attrs"], g], axis=-1)
    ).astype(compute_dtype)
    last_state_p = padN(state[:, -1])

    if build_edges:
        # dummies keep the ref list uniform; never read by the kernel
        nbr_flat = jnp.zeros((B, 1, 1), jnp.int32)
        mask_flat = jnp.zeros((B, 1, 1), jnp.float32)
    else:
        # neighbors/mask -> flat (B, K*Np, 1) in (k, i) row order; padded rows
        # point at node 0 with mask 0 (node 0's padded gather is masked out)
        nbr_t = jnp.swapaxes(graphs["neighbors"][..., :K], -1, -2).astype(jnp.int32)  # (B, K, N)
        mask_t = jnp.swapaxes(graphs["nbr_mask"][..., :K], -1, -2)
        nbr_flat = jnp.pad(nbr_t, [(0, 0), (0, 0), (0, Np - N)]).reshape(B, K * Np, 1)
        mask_flat = (
            jnp.pad(mask_t, [(0, 0), (0, 0), (0, Np - N)]).reshape(B, K * Np, 1).astype(jnp.float32)
        )

    p = params
    nf = cfg.nf_effect

    def w(x):
        return jnp.asarray(x, compute_dtype)

    rp_w = p["relation_propagator"]["w"]
    weights = [
        w(p["particle_encoder"][0]["w"]), w(p["particle_encoder"][0]["b"]),
        w(p["particle_encoder"][1]["w"]), w(p["particle_encoder"][1]["b"]),
        w(p["particle_encoder"][2]["w"]), w(p["particle_encoder"][2]["b"]),
        w(p["relation_encoder"][0]["w"]), w(p["relation_encoder"][0]["b"]),
        w(p["relation_encoder"][1]["w"]), w(p["relation_encoder"][1]["b"]),
        w(p["relation_encoder"][2]["w"]), w(p["relation_encoder"][2]["b"]),
        w(rp_w[:nf]),
        # recv/send projections fused into one (nf, 2nf) matmul
        jnp.concatenate([w(rp_w[nf:2 * nf]), w(rp_w[2 * nf:])], axis=1),
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
        return pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    if build_edges:
        nbr_in, mask_in = nbr_flat.reshape(nB, S, 1), mask_flat.reshape(nB, S, 1)
    else:
        nbr_in = nbr_flat.reshape(nB, S * K * Np, 1)
        mask_in = mask_flat.reshape(nB, S * K * Np, 1)
    ins = [blockS(nodes), nbr_in, mask_in, blockS(last_state_p)]
    in_specs = [block1(x.shape[1:]) for x in ins] + [wspec(x) for x in weights]

    out_shape = [jax.ShapeDtypeStruct((nB, S * Np, 3), jnp.float32)]
    out_specs = [block1((S * Np, 3))]
    if want_motion:
        out_shape.append(jax.ShapeDtypeStruct((nB, S * Np, 3), jnp.float32))
        out_specs.append(block1((S * Np, 3)))

    edge_build = (K, float(adj_radius), n_p, N) if build_edges else None
    kernel = functools.partial(_kernel, cfg, compute_dtype, Np, K, S, edge_build,
                               Dp, want_motion)
    outs = pl.pallas_call(
        kernel,
        grid=(nB,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*ins, *weights)
    pred = outs[0].reshape(B, Np, 3)[:, :n_p]
    if want_motion:
        return pred, outs[1].reshape(B, Np, 3)[:, :n_p]
    return pred, None
