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
hot paths (MPPI, rollout); training differentiates through it via the
custom-VJP Pallas backward in ``ops/fused_gnn_train.py``.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# temporary profiling hook: comma-joined {noedge,nogather,norelmlp,nopstep}
_ABLATE = set(filter(None, os.environ.get("FUSED_ABLATE", "").split(",")))

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
        # the kernels hard-code the node_g column layout (2 attr cols, one
        # group column) — reject configs that would silently misalign it
        and cfg.attr_dim == 2
        and cfg.n_instance == 1
    )


def _stackS(xs, S):
    return jnp.concatenate(xs, axis=0) if S > 1 else xs[0]


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mlp3(cd, x, w0, b0, w1, b1, w2, b2, final_relu):
    x = jnp.maximum(_dot(x, w0[:]) + b0[:], 0.0).astype(cd)
    x = jnp.maximum(_dot(x, w1[:]) + b1[:], 0.0).astype(cd)
    x = _dot(x, w2[:]) + b2[:]
    return (jnp.maximum(x, 0.0) if final_relu else x).astype(cd)


def _tileK(x, S, K, Np):
    """Receiver broadcast (S*Np, F) -> (S*K*Np, F), row order (s, k, i)."""
    F = x.shape[-1]
    return jnp.broadcast_to(
        x.reshape(S, 1, Np, F), (S, K, Np, F)).reshape(S * K * Np, F)


def _gather(ohs, x, S, Np, cd):
    """Sender gather via per-sample one-hot MXU matmuls -> (S*K*Np, F)."""
    outs = [_dot(ohs[s], x[s * Np:(s + 1) * Np]).astype(cd) for s in range(S)]
    return jnp.concatenate(outs, axis=0) if S > 1 else outs[0]


def _edges_stacked(xs, S, Np, K, edge_build, cd, valid_row=None,
                   valid_col=None):
    """In-kernel radius∧topk edge construction (semantics of
    ops.graph.build_neighbor_graph with policy "none", all object slots
    valid — the MPPI rollout case): K == topk slots per receiver, the
    slot-k one-hot IS the gather matrix. Ties break to the smallest
    sender index, matching lax.top_k on negated distances.

    All S samples' distance matrices are stacked into one (S*Np, Np)
    tile chain — same arithmetic per row, ~S x fewer VPU op issues.
    Comparisons stay on full 2D f32 tiles — Mosaic rejects compares on
    (Np, 1)-shaped operands ("Target does not support this comparison");
    narrow results are f32-sliced afterward.

    xs: (S*Np, 3) f32 positions. Returns (per-sample one-hots
    [(K*Np, Np)] in cd, edge-mask BIAS (S*K*Np, 1) in cd: 0 on real edges,
    -3e38 on masked ones — added to the relation pre-activation, the relu
    turns masked rows into exact zeros; a narrow bf16 bias costs 4x less
    VMEM than an f32 mask and removes the per-use compare/select).
    """
    f32 = jnp.float32
    SN = S * Np
    topk, adj_thresh, max_nobj, N_real = edge_build
    iota_r1 = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0).astype(f32)
    iota_c1 = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1).astype(f32)
    tool_r1 = (iota_r1 >= max_nobj).astype(f32) * (iota_r1 < N_real).astype(f32)
    tool_c1 = (iota_c1 >= max_nobj).astype(f32) * (iota_c1 < N_real).astype(f32)
    if valid_col is None:
        valid_col = _stackS([(iota_c1 < N_real).astype(f32)] * S, S)
    if valid_row is None:
        valid_row = _stackS([(iota_r1 < N_real).astype(f32)[:, 0:1]] * S, S)
    # per-sample dynamic validity folds into both sides of the pair test
    pair_ok = valid_col * _stackS([1.0 - tool_r1 * tool_c1] * S, S)  # (SN, Np)
    row_valid = valid_row
    iota_c = _stackS([iota_c1] * S, S)
    BIG = jnp.float32(1e10)
    thresh = jnp.float32(adj_thresh * adj_thresh)
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
        cand = D <= mb
        # first minimal column: min over candidate column indices
        idx = jnp.min(jnp.where(cand, iota_c, float(Np)), axis=1,
                      keepdims=True)
        oh = (iota_c == jnp.broadcast_to(idx, (SN, Np))).astype(cd)
        # mb >= BIG rows (masked pairs) fail mb < thresh since thresh < BIG
        ok2 = (mb < thresh).astype(f32)[:, 0:1]  # (SN, 1)
        mk_ks.append(((ok2 * row_valid) - 1.0) * jnp.float32(3e38))
        oh_ks.append(oh)
        D = jnp.where(jnp.broadcast_to(idx, (SN, Np)) == iota_c, BIG, D)
    ohs = [
        jnp.concatenate([oh_ks[k][s * Np:(s + 1) * Np] for k in range(topk)],
                        axis=0) for s in range(S)
    ]  # per sample (K*Np, Np)
    bias = _stackS(
        [jnp.concatenate([mk_ks[k][s * Np:(s + 1) * Np] for k in range(topk)],
                         axis=0) for s in range(S)], S).astype(cd)
    return ohs, bias


def _weight_list(params, cfg, compute_dtype):
    """Flat kernel-ref weight list (the order of the ``_kernel`` signature)."""
    p = params
    nf = cfg.nf_effect

    def w(x):
        return jnp.asarray(x, compute_dtype)

    rp_w = p["relation_propagator"]["w"]
    return [
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
    dot = _dot
    mlp3 = functools.partial(_mlp3, cd)

    # Node arrays are stacked (S*Np, ·): sample s occupies rows [s*Np, (s+1)*Np).
    # Edge arrays are stacked (S*K*Np, ·): sample s occupies rows
    # [s*KN, (s+1)*KN), inner order (k, i).
    def tileK(x):
        return _tileK(x, S, K, Np)

    # ---- one-hot sender matrices (per sample: (K*Np, Np)) + edge masks ----
    if "noedge" in _ABLATE and edge_build is not None:
        ir = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
        one = [(ic == ((ir + k) % Np)).astype(cd) for k in range(K)]
        ohs = [jnp.concatenate(one, axis=0)] * S
        rel_bias = jnp.zeros((S * KN, 1), cd)
    elif edge_build is None:
        # one compare on the full (S*K*Np, Np) stack; per-sample slices below
        col = jax.lax.broadcasted_iota(jnp.int32, (S * KN, Np), 1)
        oh_all = (nbr_ref[0] == col).astype(cd)
        ohs = [oh_all[s * KN:(s + 1) * KN] for s in range(S)]
        rel_bias = ((mask_ref[0] - 1.0) * jnp.float32(3e38)).astype(cd)
    else:
        ohs, rel_bias = _edges_stacked(last_state_ref[0].astype(f32), S, Np, K,
                                       edge_build, cd)

    def gather_s(x):  # (S*Np, F') -> (S*K*Np, F')
        if "nogather" in _ABLATE:
            return tileK(x)
        return _gather(ohs, x, S, Np, cd)

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
    if "norelmlp" in _ABLATE:
        relation_encode = jnp.broadcast_to(rel_inputs[:, :1], (S * KN, nf)).astype(cd)
    else:
        relation_encode = mlp3(rel_inputs, re0w, re0b, re1w, re1b, re2w, re2b, True)

    # ---- pstep message passing with hoisted linear terms ----
    # the edge-mask bias folds into rel_base as a -inf pre-activation: masked
    # rows come out of the relu as exact zeros, so the per-pstep mask multiply
    # disappears (relu(-3e38 + x) == 0 for any finite bf16 activation x)
    rel_base = (dot(relation_encode, rp_w1[:]) + rp_b[:]).astype(cd) + rel_bias
    part_base = (dot(particle_encode, pp_wa[:]) + pp_b[:]).astype(cd)  # (S*Np, F)

    effect = particle_encode
    for _ in range(0 if "nopstep" in _ABLATE else cfg.pstep):
        rs = dot(effect, rp_w23[:]).astype(cd)  # recv | send projections fused
        recv = rs[:, :nf]                       # (S*Np, F)
        send = gather_s(rs[:, nf:])             # (S*K*Np, F)
        masked = jnp.maximum(rel_base + tileK(recv) + send, 0.0)
        # sum the K slots per sample (rows s*KN + k*Np + i): one 4D reduction
        # over the k axis instead of S*K sublane slice-adds
        agg = jnp.sum(masked.reshape(S, K, Np, nf), axis=1,
                      dtype=f32).reshape(SN, nf)
        effect = jnp.maximum(
            part_base + dot(agg.astype(cd), pp_wb[:]).astype(cd) + effect, 0.0
        ).astype(cd)

    # ---- motion head (padded rows written too; sliced off outside) ----
    motion = mlp3(effect, nr0w, nr0b, nr1w, nr1b, nr2w, nr2b, False).astype(f32)
    clamped = jnp.clip(motion, -cfg.motion_clamp, cfg.motion_clamp)
    out_refs[0][0] = last_state_ref[0].astype(f32) + clamped
    if want_motion:
        out_refs[1][0] = motion


def pack_node_inputs(cfg: GNNConfig, state, action, physics, attrs, p_instance,
                     compute_dtype):
    """ONE packed node tensor ``[p_inputs | state_norm | attrs | g]``
    -> ((B, Np, D) in compute_dtype, Dp).

    Shared by the forward wrapper and the training backward
    (``ops.fused_gnn_train``), which recomputes the forward and therefore
    must see byte-identical packing."""
    N = cfg.n_nodes
    n_p, n_s = cfg.max_nobj, cfg.max_neef
    Np = _round_up(N, 8)
    B = state.shape[0]
    n_his = cfg.n_his

    state_res = state[:, 1:] - state[:, :-1]
    state_norm = jnp.concatenate([state_res, state[:, -1:]], axis=1)
    state_norm_f = jnp.moveaxis(state_norm, 1, 2).reshape(B, N, n_his * 3)

    if physics.ndim == 2 and physics.shape[-1] == cfg.phys_dim:
        phys_p = jnp.broadcast_to(physics[:, None, :], (B, n_p, cfg.phys_dim))
    else:
        phys_p = physics.reshape(B, n_p, cfg.phys_dim)
    phys_full = jnp.concatenate(
        [phys_p, jnp.zeros((B, n_s, cfg.phys_dim), physics.dtype)], axis=1)

    parts = [attrs]
    if cfg.state_dim > 0:
        parts.append(state_norm_f)
    parts.append(phys_full)
    if cfg.action_dim > 0:
        parts.append(action)
    p_inputs = jnp.concatenate(parts, axis=-1)
    Dp = p_inputs.shape[-1]

    g = jnp.concatenate(
        [p_instance, jnp.zeros((B, n_s, cfg.n_instance), p_instance.dtype)],
        axis=1)
    nodes = jnp.pad(
        jnp.concatenate([p_inputs, state_norm_f, attrs, g], axis=-1),
        [(0, 0), (0, Np - N), (0, 0)],
    ).astype(compute_dtype)
    return nodes, Dp


def pack_edge_tables(neighbors, nbr_mask, K, N, Np):
    """neighbors/mask (B, N, >=K) -> flat (B, K*Np, 1) tables in the kernels'
    (k, i) row order; padded rows point at node 0 with mask 0."""
    B = neighbors.shape[0]
    nbr_t = jnp.swapaxes(neighbors[..., :K], -1, -2).astype(jnp.int32)
    mask_t = jnp.swapaxes(nbr_mask[..., :K], -1, -2)
    nbr_flat = jnp.pad(nbr_t, [(0, 0), (0, 0), (0, Np - N)]).reshape(B, K * Np, 1)
    mask_flat = (
        jnp.pad(mask_t, [(0, 0), (0, 0), (0, Np - N)]).reshape(B, K * Np, 1)
        .astype(jnp.float32)
    )
    return nbr_flat, mask_flat


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
    n_p = cfg.max_nobj
    Np = _round_up(N, 8)
    state = graphs["state"]
    B = state.shape[0]
    if build_edges:
        assert adj_radius is not None
        K = int(edge_topk)
    else:
        K_stored = graphs["neighbors"].shape[-1]
        K = min(k_used or K_stored, K_stored)

    S = samples_per_block
    while B % S:  # batch must tile into S-sample blocks
        S //= 2
    nB = B // S

    def blockS(x):
        # (B, Np, F) -> (nB, S*Np, F): stack S samples' node rows per block
        return x.reshape(nB, S * Np, *x.shape[2:])

    # ---- cheap node-level prep in XLA (O(B*N*small)) ----
    nodes, Dp = pack_node_inputs(cfg, state, graphs.get("action"),
                                 graphs["physics_param"], graphs["attrs"],
                                 graphs["p_instance"], compute_dtype)
    last_state_p = jnp.pad(state[:, -1], [(0, 0), (0, Np - N), (0, 0)])

    if build_edges:
        # dummies keep the ref list uniform; never read by the kernel
        nbr_flat = jnp.zeros((B, 1, 1), jnp.int32)
        mask_flat = jnp.zeros((B, 1, 1), jnp.float32)
    else:
        nbr_flat, mask_flat = pack_edge_tables(
            graphs["neighbors"], graphs["nbr_mask"], K, N, Np)

    weights = _weight_list(params, cfg, compute_dtype)

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
        # f32 compute at S=8 needs ~24 MB scoped VMEM (bf16 fits the 16 MB
        # default); raise the limit like the rollout kernel does
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins, *weights)
    pred = outs[0].reshape(B, Np, 3)[:, :n_p]
    if want_motion:
        return pred, outs[1].reshape(B, Np, 3)[:, :n_p]
    return pred, None


def _rollout_kernel(cfg: GNNConfig, compute_dtype, Np, K, S, edge_build,
                    gripper_lift, mean_y, max_repeat,
                    pin_ref, sa_ref, repeat1_ref, valid1_ref,
                    pe0w, pe0b, pe1w, pe1b, pe2w, pe2b,
                    re0w, re0b, re1w, re1b, re2w, re2b,
                    rp_w1, rp_w23, rp_b,
                    pp_wa, pp_wb, pp_b,
                    nr0w, nr0b, nr1w, nr1b, nr2w, nr2b,
                    rec_ref):
    """Whole-chunk MPPI rollout: the full push-substep loop runs INSIDE the
    kernel (per-substep history shift, edge rebuild, GNN forward, eef
    re-sticking all in VMEM).

    Replaces ``max_repeat`` separate kernel launches + XLA glue per chunk
    (reference semantics: src/planning/forward_dynamics.py:156-168). Object
    rows follow the model; eef rows advance by the per-sample action delta
    with y re-stuck to the predicted object min-y; each sample's state is
    recorded at its own integer repeat count.
    """
    f32 = jnp.float32
    cd = compute_dtype
    SN = S * Np
    nf = cfg.nf_effect
    n_his = cfg.n_his
    _, _, max_nobj, N_real = edge_build
    dot = _dot
    mlp3 = functools.partial(_mlp3, cd)

    def tileK(x):
        return _tileK(x, S, K, Np)

    # constant row masks, built wide then lane-sliced (no narrow compares)
    iota_r1 = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0).astype(f32)
    obj_w = _stackS([(iota_r1 < max_nobj).astype(f32)] * S, S)       # (SN, Np)
    eef_w = _stackS([((iota_r1 >= max_nobj).astype(f32) *
                      (iota_r1 < N_real).astype(f32))] * S, S)
    obj1 = obj_w[:, 0:1]                  # (SN, 1) 0/1
    eef3 = eef_w[:, 0:3]                  # (SN, 3) 0/1
    valid = valid1_ref[0]                 # (SN, 1) f32: per-sample validity
    vobj = valid * obj1                   # valid OBJECT rows
    attrs_c = jnp.concatenate([vobj, eef_w[:, 0:1]], axis=1).astype(cd)
    g_c = vobj.astype(cd)                 # p_instance == 1 for valid obj rows
    # per-sample column validity for the edge build (transpose per block)
    valid_colm = _stackS(
        [jnp.broadcast_to(valid[s * Np:(s + 1) * Np].reshape(1, Np), (Np, Np))
         for s in range(S)], S)

    # constant across substeps: particle encoding + its propagator base
    p_inputs = pin_ref[0]                  # (SN, Dp) cd
    particle_encode = mlp3(p_inputs, pe0w, pe0b, pe1w, pe1b, pe2w, pe2b, True)
    part_base = (dot(particle_encode, pp_wa[:]) + pp_b[:]).astype(cd)

    sa = sa_ref[0].astype(f32)             # (SN, 6): [state0 | action]
    state0, action = sa[:, :3], sa[:, 3:]
    repeat1 = repeat1_ref[0]               # (SN, 1) f32 per-sample repeat
    BIGY = jnp.float32(1e10)

    def substep(carry):
        hs, rec, ai = carry               # hs: tuple of n_his (SN, 3) f32
        last = hs[-1]
        ohs, rel_bias = _edges_stacked(last, S, Np, K, edge_build, cd,
                                       valid_row=valid, valid_col=valid_colm)

        def gather_s(x):
            return _gather(ohs, x, S, Np, cd)

        sn = jnp.concatenate(
            [hs[i + 1] - hs[i] for i in range(n_his - 1)] + [last], axis=1
        ).astype(cd)                       # (SN, n_his*3)
        node_g = jnp.concatenate([sn, attrs_c, g_c], axis=1)
        T = tileK(node_g)
        G = gather_s(node_g)
        nh3 = n_his * 3
        rel_inputs = jnp.concatenate(
            [T[:, nh3:nh3 + 2], G[:, nh3:nh3 + 2],
             jnp.abs(T[:, nh3 + 2:] - G[:, nh3 + 2:]),
             T[:, :nh3] - G[:, :nh3]], axis=-1)
        relation_encode = mlp3(rel_inputs, re0w, re0b, re1w, re1b, re2w, re2b, True)
        rel_base = (dot(relation_encode, rp_w1[:]) + rp_b[:]).astype(cd) + rel_bias

        effect = particle_encode
        for _ in range(cfg.pstep):
            rs = dot(effect, rp_w23[:]).astype(cd)
            send = gather_s(rs[:, nf:])
            masked = jnp.maximum(rel_base + tileK(rs[:, :nf]) + send, 0.0)
            agg = jnp.sum(masked.reshape(S, K, Np, nf), axis=1,
                          dtype=f32).reshape(SN, nf)
            effect = jnp.maximum(
                part_base + dot(agg.astype(cd), pp_wb[:]).astype(cd) + effect,
                0.0).astype(cd)

        motion = mlp3(effect, nr0w, nr0b, nr1w, nr1b, nr2w, nr2b, False).astype(f32)
        pred = last + jnp.clip(motion, -cfg.motion_clamp, cfg.motion_clamp)

        # record each sample's state at its own repeat count; |repeat - ai| is
        # an exact 0/1 arithmetic select (Mosaic rejects narrow-lane compares)
        aif = ai.astype(f32)
        eq1 = jnp.maximum(1.0 - jnp.abs(repeat1 - aif), 0.0)  # (SN, 1) 0/1
        eq = jnp.broadcast_to(eq1, (SN, 3))
        rec = rec * (1.0 - eq) + pred * eq

        # eef re-stick: y <- per-sample min (dynamics) or masked mean
        # (dynamics_masked) over predicted valid object rows
        # (forward_dynamics.py:163-168, :359), x/z advance by the delta
        if mean_y:
            yv = pred[:, 1:2] * vobj
            ys = _stackS(
                [jnp.zeros((Np, 1), f32) +
                 jnp.sum(yv[s * Np:(s + 1) * Np]) /
                 jnp.maximum(jnp.sum(vobj[s * Np:(s + 1) * Np]), 1.0)
                 for s in range(S)], S) + jnp.float32(gripper_lift)
        else:
            ycol = pred[:, 1:2] * vobj + (1.0 - vobj) * BIGY     # (SN, 1)
            ys = _stackS(
                [jnp.zeros((Np, 1), f32) + jnp.min(ycol[s * Np:(s + 1) * Np])
                 for s in range(S)], S) + jnp.float32(gripper_lift)
        cand = last + action
        eef_next = jnp.concatenate([cand[:, 0:1], ys, cand[:, 2:3]], axis=1)
        nxt = pred * (1.0 - eef3) + eef_next * eef3
        return hs[1:] + (nxt,), rec, ai + 1

    # this block's own substep bound (not the batch max): a block of short
    # pushes stops early — the MPPI solve sorts samples by repeat so blocks
    # are near-uniform; unsorted physics-optimizer batches benefit the most
    rmax = jnp.minimum(jnp.max(repeat1), jnp.float32(max_repeat)).astype(jnp.int32)

    def cond(carry):
        return carry[2] <= rmax

    hs0 = (state0,) * n_his
    _, rec, _ = jax.lax.while_loop(
        cond, lambda c: substep(c), (hs0, state0, jnp.int32(1)))
    rec_ref[0] = rec


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "interpret", "adj_radius",
                     "edge_topk", "samples_per_block", "max_repeat",
                     "gripper_lift", "mean_y"),
)
def fused_rollout_chunk(params, obj0, kp, delta, repeat, physics_param,
                        cfg: GNNConfig, adj_radius, edge_topk,
                        max_repeat=15, gripper_lift=0.0,
                        compute_dtype=jnp.bfloat16, samples_per_block=8,
                        interpret=False, obj_mask=None, mean_y=False):
    """Run one MPPI chunk's full substep loop in a single kernel launch.

    Args:
      obj0: (max_nobj, 3) or (B, max_nobj, 3) f32 object state (all slots
        valid; 2D is broadcast across samples).
      kp: (B, max_neef, 3) per-sample eef start keypoints.
      delta: (B, max_neef, 3) per-substep eef displacement.
      repeat: (B,) integer substep count per sample.
      physics_param: (phys_dim,) or (B, phys_dim).
      obj_mask: optional (B, max_nobj) bool per-sample object validity (the
        dynamics_masked case, reference forward_dynamics.py:209-399); None
        means every object slot is valid.
      mean_y: re-stick the eef to the masked MEAN object y instead of the
        min (dynamics_masked semantics, forward_dynamics.py:359).

    Returns (B, max_nobj, 3) f32: each sample's object state recorded at its
    own ``repeat``-th substep. Exactly matches running
    ``fused_forward_batch(build_edges=True)`` in the per-substep XLA loop
    (policy "none"; see planning/forward.py dynamics_rollout_batched).
    """
    assert _supports(cfg), "config not supported by the fused kernel"
    # particle inputs are hoisted out of the substep loop as constants, which
    # requires state-independent node features
    assert cfg.state_dim == 0, "fused_rollout_chunk requires state_dim == 0"
    N = cfg.n_nodes
    n_p, n_s = cfg.max_nobj, cfg.max_neef
    Np = _round_up(N, 8)
    B = kp.shape[0]
    K = int(edge_topk)

    S = samples_per_block
    while B % S:
        S //= 2
    nB = B // S

    # state0: obj rows (broadcast if shared), eef rows = kp, pad rows 0
    if obj0.ndim == 2:
        obj0 = jnp.broadcast_to(obj0[None], (B, n_p, 3))
    state0 = jnp.concatenate(
        [obj0, kp, jnp.zeros((B, Np - N, 3), jnp.float32)], axis=1)
    action = jnp.concatenate(
        [jnp.zeros((B, n_p, 3), jnp.float32), delta,
         jnp.zeros((B, Np - N, 3), jnp.float32)], axis=1)
    sa = jnp.concatenate([state0, action], axis=-1)  # one (B, Np, 6) input
    repeat1 = jnp.broadcast_to(
        repeat.astype(jnp.float32)[:, None, None], (B, Np, 1))

    # per-sample validity: object rows from obj_mask, eef rows always valid
    vobj = (obj_mask.astype(jnp.float32) if obj_mask is not None
            else jnp.ones((B, n_p), jnp.float32))
    valid1 = jnp.concatenate(
        [vobj, jnp.ones((B, n_s), jnp.float32),
         jnp.zeros((B, Np - N), jnp.float32)], axis=1)[..., None]

    # packed per-sample constant node inputs [attrs | phys | action]
    attrs = jnp.zeros((B, Np, 2), jnp.float32)
    attrs = attrs.at[:, :n_p, 0].set(vobj).at[:, n_p:N, 1].set(1.0)
    phys = physics_param
    if phys.ndim == 1:
        phys = jnp.broadcast_to(phys[None], (B,) + phys.shape)
    phys_n = jnp.concatenate(
        [jnp.broadcast_to(phys[:, None, :], (B, n_p, cfg.phys_dim)),
         jnp.zeros((B, Np - n_p, cfg.phys_dim), jnp.float32)], axis=1)
    parts = [attrs, phys_n]
    if cfg.action_dim > 0:
        parts.append(action)
    pin = jnp.concatenate(parts, axis=-1).astype(compute_dtype)

    def blockS(x):
        return x.reshape(nB, S * Np, *x.shape[2:])

    ins = [blockS(pin), blockS(sa), blockS(repeat1), blockS(valid1)]

    def block1(shape):
        return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def wspec(arr):
        return pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    weights = _weight_list(params, cfg, compute_dtype)
    in_specs = [block1(x.shape[1:]) for x in ins]
    in_specs += [wspec(x) for x in weights]

    edge_build = (K, float(adj_radius), n_p, N)
    kernel = functools.partial(_rollout_kernel, cfg, compute_dtype, Np, K, S,
                               edge_build, float(gripper_lift), mean_y,
                               int(max_repeat))
    rec = pl.pallas_call(
        kernel,
        grid=(nB,),
        in_specs=in_specs,
        out_specs=block1((S * Np, 3)),
        out_shape=jax.ShapeDtypeStruct((nB, S * Np, 3), jnp.float32),
        # the loop-carried history + edge tensors at S=8 need ~17 MB scoped
        # VMEM; v5e accepts a raised limit (128 MB physical VMEM per core)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins, *weights)
    return rec.reshape(B, Np, 3)[:, :n_p]
