"""Static-shape neighbor-graph construction for particle dynamics on TPU.

Semantically equivalent to the reference's ``construct_edges_from_states`` /
``construct_edges_from_states_batch`` (reference: ``src/dynamics/dataset/graph.py:68-298``)
but redesigned for the XLA compilation model:

- The reference emits a dynamic number of edges as dense one-hot incidence
  matrices ``Rr, Rs (n_rel, N)`` and enforces an edge budget ``max_nR`` with a
  Python retry loop that degrades kNN fraction / topk
  (``src/dynamics/dataset/dataset.py:317-349``). That shape dynamism forces
  recompilation and CPU round-trips.
- Here a graph is a pair of *static* arrays ``(neighbors, mask)`` of shape
  ``(N, K)``: row ``i`` lists the senders of the edges received by node ``i``.
  ``K = topk + max_neef`` is a hard degree bound: the radius∧topk rule admits
  at most ``topk`` senders per receiver, and every tool-connection policy adds
  at most ``max_neef`` (one per end-effector particle). No retry loop, no
  budget overflow, no recompilation; gathers replace ``Rr.bmm`` and a masked
  sum over ``K`` replaces the ``Rr^T.bmm`` scatter-add.

Edge-set equivalence with the dense reference algorithm is covered by
``tests/test_graph.py`` against a numpy oracle.

Node layout convention (matches the reference graph dicts): indices
``[0, max_nobj)`` are (padded) object particles, ``[max_nobj, max_nobj+max_neef)``
are end-effector/tool particles.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

BIG = 1e10

POLICY_NONE = "none"
POLICY_TOOLS_ALL = "tools_all"
POLICY_NON_FIXED = "non_fixed"
POLICY_SURFACE = "surface"


@dataclasses.dataclass(frozen=True)
class EdgeConfig:
    """Static edge-construction parameters (hashable: usable as a jit static arg).

    Mirrors the per-material dataset options (reference:
    ``src/config/dynamics/*.yaml`` ``datasets`` section and
    ``src/dynamics/dataset/dataset.py:40-66``).
    """

    max_nobj: int
    max_neef: int
    topk: int
    policy: str = POLICY_NONE
    # batch-gated tools_all: only connect the tool when it has at least one
    # radius∧topk object neighbor (reference: graph.py:276-286).
    gate_on_contact: bool = False
    # fraction of the bottom y-range treated as fixed particles under the
    # non_fixed policy (reference: graph.py:134).
    fixed_bottom_frac: float = 0.1
    # plane scaling for the surface policy (reference: dataset.py:205-209).
    surface_ratio: float = 1.0
    # pad the slot axis K up to a multiple of this. TPU tiles the two minor
    # dims of every (..., K, F) edge tensor to (8, 128) f32 / (16, 128) bf16;
    # an unaligned K (e.g. 11) silently costs ~1.5-2.4x memory traffic in the
    # message-passing loop. Extra slots are masked and cost nothing real.
    k_multiple: int = 8

    @property
    def n_nodes(self):
        return self.max_nobj + self.max_neef

    @property
    def K(self):
        k = self.topk + self.max_neef
        m = self.k_multiple
        return ((k + m - 1) // m) * m


def _pairwise_sq_dists(states):
    # (N, 3) -> (N, N) squared distances. N is small (<= ~320) so the direct
    # broadcast form is fine; XLA fuses it into one kernel.
    diff = states[:, None, :] - states[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def _topk_neighbors(dis_eff, topk):
    # smallest-k per row via lax.top_k on negated distances.
    neg_vals, idx = jax.lax.top_k(-dis_eff, topk)
    return idx, -neg_vals


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_neighbor_graph(
    states,
    node_mask,
    tool_mask,
    adj_radius,
    cfg: EdgeConfig,
    knn_frac=1.0,
):
    """Build a static-degree neighbor graph from particle states.

    Args:
      states: (N, 3) particle positions, N = max_nobj + max_neef.
      node_mask: (N,) bool, True for valid particles (object or tool).
      tool_mask: (N,) bool, True for valid tool particles.
      adj_radius: scalar connection radius (edge if squared dist < radius**2),
        reference: graph.py:86,101.
      cfg: static EdgeConfig.
      knn_frac: scalar in (0, 1]; fraction of eligible (receiver, tool) pairs
        kept under the non_fixed policy (reference: graph.py:155-169).

    Returns:
      neighbors: (N, K) int32 sender indices (arbitrary value where masked).
      mask: (N, K) bool, True for real edges. Receiver of slot (i, k) is i.

    Semantics (reference: graph.py:68-231):
      - pairwise squared distances; invalid and tool-tool pairs pushed to BIG
      - per-row smallest-topk indices, then the radius test is applied to the
        selected entries (adj = radius ∧ topk)
      - self-edges are included when within radius (the reference's distance
        diagonal is 0 and is never excluded)
      - tool-connection policies add/override edges in dedicated tool slots
    """
    N = cfg.n_nodes
    assert states.shape[0] == N, (states.shape, N)

    dis = _pairwise_sq_dists(states)
    valid_pair = node_mask[:, None] & node_mask[None, :]
    tool_pair = tool_mask[:, None] & tool_mask[None, :]
    dis_eff = jnp.where(valid_pair & ~tool_pair, dis, BIG)

    thresh = adj_radius * adj_radius
    topk_idx, topk_dis = _topk_neighbors(dis_eff, cfg.topk)  # (N, topk)
    topk_mask = (topk_dis < thresh) & (topk_dis < BIG * 0.5)
    topk_mask = topk_mask & node_mask[:, None]

    # sender attributes of the selected topk slots
    topk_sender_is_tool = tool_mask[topk_idx]  # (N, topk)

    # tool slots: sender j is node index max_nobj + j
    tool_ids = cfg.max_nobj + jnp.arange(cfg.max_neef, dtype=jnp.int32)  # (max_neef,)
    tool_valid = tool_mask[tool_ids]  # (max_neef,)
    tool_slot_idx = jnp.broadcast_to(tool_ids[None, :], (N, cfg.max_neef))

    receiver_is_obj = node_mask & ~tool_mask  # (N,)

    if cfg.policy == POLICY_NONE:
        tool_slot_mask = jnp.zeros((N, cfg.max_neef), dtype=bool)
        final_topk_mask = topk_mask

    elif cfg.policy == POLICY_TOOLS_ALL:
        # reference: graph.py:119-123 (single) / graph.py:276-286 (batched, gated)
        if cfg.gate_on_contact:
            # gate: the tool-receiver rows of the radius∧topk adjacency have at
            # least one non-tool sender (reference: graph.py:265,277).
            tool_rows = tool_mask[:, None] & topk_mask & ~topk_sender_is_tool
            gate = jnp.any(tool_rows)
        else:
            gate = jnp.array(True)
        # object receivers get every valid tool sender (when gated)
        tool_slot_mask = (
            receiver_is_obj[:, None] & tool_valid[None, :] & gate
        )
        # tool receivers lose all edges; tool senders leave the topk slots
        # (they are replaced by the all-or-nothing tool slots)
        final_topk_mask = topk_mask & ~tool_mask[:, None] & ~topk_sender_is_tool

    elif cfg.policy == POLICY_NON_FIXED:
        # reference: graph.py:125-173. Connect each tool to all "non-fixed"
        # object particles (y above the bottom fixed_bottom_frac of the object
        # y-range), optionally keeping only the knn_frac nearest eligible
        # (receiver, tool) pairs; only fires when the plain radius∧topk
        # adjacency already links some object receiver to a tool sender.
        check = jnp.any(topk_mask & topk_sender_is_tool & receiver_is_obj[:, None])

        # y bounds over the *padded* object block, matching the reference's
        # max/min over the zero-padded fps array (dataset.py:192-200).
        obj_block_y = states[: cfg.max_nobj, 1]
        max_y = jnp.max(obj_block_y)
        min_y = jnp.min(obj_block_y)
        y_thresh = (max_y - min_y) * cfg.fixed_bottom_frac + min_y
        eligible = receiver_is_obj & (states[:, 1] > y_thresh)  # (N,)

        # kNN fraction: keep the keepK globally nearest (eligible receiver,
        # valid tool) pairs by squared distance (reference: graph.py:155-169).
        pair_ok = eligible[:, None] & tool_valid[None, :]  # (N, max_neef)
        pair_dis = jnp.where(pair_ok, dis[:, tool_ids], jnp.inf)
        n_pairs = jnp.sum(pair_ok)
        keepK = jnp.floor(knn_frac * n_pairs).astype(jnp.int32)
        flat = pair_dis.reshape(-1)
        order = jnp.argsort(flat)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(flat.shape[0], dtype=order.dtype))
        keep = (rank.reshape(N, cfg.max_neef) < keepK) & pair_ok
        apply_knn = (knn_frac < 1.0) & (knn_frac > 0.0)
        tool_slot_mask = jnp.where(apply_knn, keep, pair_ok) & check

        # when fired: eligible-receiver topk slots drop tool senders (replaced
        # by the policy edges, graph.py:153) and tool receivers drop eligible
        # senders (graph.py:152).
        drop_obj_side = eligible[:, None] & topk_sender_is_tool
        drop_tool_side = tool_mask[:, None] & eligible[topk_idx]
        final_topk_mask = topk_mask & ~((drop_obj_side | drop_tool_side) & check)

    elif cfg.policy == POLICY_SURFACE:
        # reference: graph.py:175-221. Attach the tool to object particles on
        # the two bounding planes nearest to the tool-adjacent particles.
        check = jnp.any(topk_mask & topk_sender_is_tool & receiver_is_obj[:, None])

        obj_block = states[: cfg.max_nobj]
        max_y = jnp.max(obj_block[:, 1]) * cfg.surface_ratio
        max_x = jnp.max(obj_block[:, 0]) * cfg.surface_ratio
        max_z = jnp.max(obj_block[:, 2]) * cfg.surface_ratio
        min_x_raw = jnp.min(obj_block[:, 0])
        min_z_raw = jnp.min(obj_block[:, 2])
        min_x = (jnp.max(obj_block[:, 0]) - min_x_raw) * (1.0 - cfg.surface_ratio) + min_x_raw
        min_z = (jnp.max(obj_block[:, 2]) - min_z_raw) * (1.0 - cfg.surface_ratio) + min_z_raw

        # particles adjacent to the tool (receivers of tool-sender topk edges)
        adj_to_tool = jnp.any(topk_mask & topk_sender_is_tool, axis=1) & receiver_is_obj  # (N,)
        w = adj_to_tool.astype(states.dtype)
        # squared-distance mass of the tool-adjacent particles to each plane
        plane_dists = jnp.stack(
            [
                jnp.sum(w * (states[:, 1] - max_y) ** 2),  # max_y
                jnp.sum(w * (states[:, 0] - min_x) ** 2),  # min_x
                jnp.sum(w * (states[:, 0] - max_x) ** 2),  # max_x
                jnp.sum(w * (states[:, 2] - min_z) ** 2),  # min_z
                jnp.sum(w * (states[:, 2] - max_z) ** 2),  # max_z
            ]
        )
        order = jnp.argsort(plane_dists)
        # membership conditions per plane, matching graph.py:47-66
        on_plane = jnp.stack(
            [
                states[:, 1] >= max_y,
                states[:, 0] <= min_x,
                states[:, 0] >= max_x,
                states[:, 2] <= min_z,
                states[:, 2] >= max_z,
            ]
        )  # (5, N)
        eligible = on_plane[order[0]] & on_plane[order[1]] & receiver_is_obj
        tool_slot_mask = eligible[:, None] & tool_valid[None, :] & check

        drop_obj_side = eligible[:, None] & topk_sender_is_tool
        drop_tool_side = tool_mask[:, None] & eligible[topk_idx]
        final_topk_mask = topk_mask & ~((drop_obj_side | drop_tool_side) & check)

    else:
        raise ValueError(f"unknown edge policy: {cfg.policy}")

    neighbors = jnp.concatenate([topk_idx, tool_slot_idx], axis=1).astype(jnp.int32)
    mask = jnp.concatenate([final_topk_mask, tool_slot_mask], axis=1)
    pad = cfg.K - neighbors.shape[1]
    if pad > 0:  # tile-align the slot axis (see k_multiple)
        neighbors = jnp.concatenate([neighbors, jnp.zeros((N, pad), jnp.int32)], axis=1)
        mask = jnp.concatenate([mask, jnp.zeros((N, pad), bool)], axis=1)
    return neighbors, mask


def build_neighbor_graph_batch(states, node_mask, tool_mask, adj_radius, cfg, knn_frac=1.0):
    """Batched edge construction (reference: graph.py:233-298).

    ``states (B, N, 3)``; ``adj_radius`` may be scalar or ``(B,)``.
    """
    adj_radius = jnp.broadcast_to(jnp.asarray(adj_radius), states.shape[:1])
    knn_frac = jnp.broadcast_to(jnp.asarray(knn_frac), states.shape[:1])
    fn = jax.vmap(lambda s, nm, tm, r, k: build_neighbor_graph(s, nm, tm, r, cfg, k))
    return fn(states, node_mask, tool_mask, adj_radius, knn_frac)


def neighbor_gather(x, neighbors):
    """Gather sender features: ``x (..., N, F) -> (..., N, K, F)``.

    Replaces the reference's ``Rs.bmm(x)`` gather (model.py:243-313) with an
    index gather; O(N*K*F) instead of O(E*N*F). Works for any number of
    leading batch dims shared by ``x`` and ``neighbors``.
    """
    # x[..., None, :] -> (..., N, 1, F); idx (..., N, K, 1); gather along the
    # N axis (-3) broadcasts over K and F.
    return jnp.take_along_axis(x[..., :, None, :], neighbors[..., :, :, None], axis=-3)


def neighbor_aggregate(edge_vals, mask):
    """Masked sum over the K slots: ``(..., N, K, F) -> (..., N, F)``.

    Replaces the reference's ``Rr_t.bmm(effect_rel)`` scatter-add
    (model.py:324) — the receiver of slot (i, k) is i, so aggregation is a
    dense reduction.
    """
    return jnp.sum(jnp.where(mask[..., None], edge_vals, 0.0), axis=-2)


def graph_to_edge_set(neighbors, mask):
    """Host-side: materialize the (receiver, sender) edge set for tests/viz."""
    import numpy as np

    neighbors = np.asarray(neighbors)
    mask = np.asarray(mask)
    rec, slot = np.nonzero(mask)
    send = neighbors[rec, slot]
    return set(zip(rec.tolist(), send.tolist()))
