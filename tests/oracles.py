"""Numpy oracles mirroring the reference's dense-graph semantics.

These re-derive (in numpy, from the documented behavior of
``/root/reference/src/dynamics/dataset/graph.py:68-298``) the edge sets the
torch implementation produces, so the static-shape TPU kernels can be tested
for exact edge-set equivalence.
"""

import numpy as np

BIG = 1e10


def dense_edges(
    states,
    adj_radius,
    node_mask,
    tool_mask,
    topk,
    connect_tools_all=False,
    gate_on_contact=False,
    connect_non_fixed=False,
    knn_frac=1.0,
    fixed_bottom_frac=0.1,
    max_nobj=None,
):
    """Return the set of (receiver, sender) edges per the reference algorithm.

    Mirrors graph.py:68-231 (single-sample) and the gating of
    graph.py:276-286 (batch connect_tools_all).
    """
    N = states.shape[0]
    diff = states[:, None, :] - states[None, :, :]
    dis = (diff**2).sum(-1)
    valid = node_mask[:, None] & node_mask[None, :]
    tool_pair = tool_mask[:, None] & tool_mask[None, :]
    dis = np.where(valid, dis, BIG)
    dis = np.where(tool_pair, BIG, dis)

    thresh = adj_radius**2
    adj = (dis < thresh).astype(np.float64)

    k = min(topk, N)
    topk_idx = np.argsort(dis, axis=-1, kind="stable")[:, :k]
    topk_matrix = np.zeros_like(adj)
    np.put_along_axis(topk_matrix, topk_idx, 1.0, axis=-1)
    adj = adj * topk_matrix

    obj_tool_1 = (tool_mask[:, None] & node_mask[None, :]).astype(bool)  # tool receiver
    obj_tool_2 = (node_mask[:, None] & tool_mask[None, :]).astype(bool)  # tool sender

    if connect_tools_all:
        if gate_on_contact:
            # tool receiver, non-tool sender adjacency nonzero (graph.py:265,277)
            pad_mask = tool_mask[:, None] & ~tool_mask[None, :]
            gate = adj[pad_mask].sum() > 0
        else:
            gate = True
        adj[obj_tool_1] = 0
        adj[obj_tool_2] = 1.0 if gate else 0.0
        adj[tool_pair] = 0

    if connect_non_fixed:
        check = adj[obj_tool_2].sum() > 0
        if check:
            assert max_nobj is not None
            obj_y = states[:max_nobj, 1]
            y_thresh = (obj_y.max() - obj_y.min()) * fixed_bottom_frac + obj_y.min()
            elig = node_mask & ~tool_mask & (states[:, 1] > y_thresh)
            surf_1 = tool_mask[:, None] & elig[None, :]  # tool receiver, elig sender
            surf_2 = elig[:, None] & tool_mask[None, :]  # elig receiver, tool sender
            n_pairs = int(surf_2.sum())
            adj[surf_1] = 0
            adj[surf_2] = 1
            if 0.0 < knn_frac < 1.0:
                keepK = int(knn_frac * n_pairs)
                pair_d = dis[surf_2]
                order = np.argsort(pair_d, kind="stable")
                keep = np.zeros(n_pairs)
                keep[order[:keepK]] = 1
                adj[surf_2] = adj[surf_2] * keep
            adj[tool_pair] = 0

    rec, snd = np.nonzero(adj)
    return set(zip(rec.tolist(), snd.tolist()))
