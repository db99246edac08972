#!/usr/bin/env python
"""Measure the fused kernel's device time per substep from a profiler trace.

Run with FUSED_ABLATE set to a comma list of {noedge,nogather,norelmlp,nopstep}
(fresh process per setting — the jit cache doesn't key on env vars). Prints one
line: the mean device duration of the fused kernel and of one whole chunk.
"""
import collections
import glob
import gzip
import json
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.graph import EdgeConfig
from adaptigraph_tpu.planning.forward import DynamicsConfig, dynamics_rollout_batched

GNN = GNNConfig(n_his=4, max_nobj=100, max_neef=1, nf_particle=128,
                nf_relation=128, nf_effect=128, pstep=3)
EDGE = EdgeConfig(max_nobj=100, max_neef=1, topk=10)
DCFG = DynamicsConfig(gnn=GNN, edge=EDGE, n_his=4, push_length=0.1,
                      sim_real_ratio=10.0, max_repeat=15, adj_thresh=0.5)
B = 2000


def mkacts(seed):
    r = np.random.RandomState(seed)
    return jnp.asarray(np.stack(
        [r.uniform(-4.5, 0, B), r.uniform(-2.5, 4.5, B),
         r.uniform(-np.pi, np.pi, B), np.full(B, 15.0)], 1
    ).astype(np.float32))[:, None, :]


def main():
    rng = np.random.RandomState(0)
    params = init_params(jax.random.PRNGKey(0), GNN)
    st0 = jnp.asarray(rng.randn(100, 3).astype(np.float32) * 0.5)
    ph = jnp.asarray([0.5])

    def f(a):
        return dynamics_rollout_batched(params, st0, a, ph, DCFG,
                                        use_fused=True,
                                        dynamic_substeps=False)["state_seqs"]

    jax.block_until_ready(f(mkacts(0)))
    td = tempfile.mkdtemp()
    with jax.profiler.trace(td):
        for i in range(3):
            _ = float(jnp.mean(f(mkacts(i + 1))))

    path = glob.glob(td + "/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(path) as fh:
        ev = json.load(fh)["traceEvents"]
    durs, cnt = collections.defaultdict(float), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "")
            if name.startswith(("fused_forward_batch", "while.")):
                key = name.split(".")[0]
                durs[key] += e["dur"]
                cnt[key] += 1
    abl = os.environ.get("FUSED_ABLATE", "(none)")
    parts = []
    for k in sorted(durs):
        parts.append(f"{k}: {durs[k] / cnt[k] / 1e3:.3f} ms x{cnt[k]}")
    print(f"ABLATE={abl:28s} " + "  ".join(parts))


if __name__ == "__main__":
    main()
