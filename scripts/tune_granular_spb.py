#!/usr/bin/env python
"""Granular fused-kernel block-size sweep (VERDICT r4 weak #5: granular has
sat at 0.99 solves/s, a hair under the 10x bar, for three rounds).

The kernel's per-block edge working set is S * (topk + max_neef) * Np rows;
the spb heuristic budgets with topk only, so granular (topk 20, 5-point
board pusher -> 25 slots) runs at S=8 with ~22.4k rows — above the ~18k-row
VMEM sweet spot the heuristic was calibrated to. This sweep measures the
granular headline solve at S in {8, 4, 2} (plus the rope control at its
default) and prints one JSON line per point; the winner becomes the
default only with this artifact behind it.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptigraph_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()


def main():
    import bench

    rows = []
    for spb in (8, 4, 2):
        os.environ["ADAPTIGRAPH_SPB"] = str(spb)
        st = bench.bench_mppi_granular(n_solves=3, n_rounds=3)
        row = {"stage": "granular_spb", "spb": spb, **st}
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.environ.pop("ADAPTIGRAPH_SPB", None)
    rope_st, _ = bench.bench_mppi(n_solves=3, n_rounds=2)
    print(json.dumps({"stage": "rope_control", **rope_st}), flush=True)
    best = max(rows, key=lambda r: r["median"])
    print(json.dumps({"stage": "granular_spb_best", "spb": best["spb"],
                      "median": best["median"]}), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)  # skip axon-tunnel teardown (see bench.py)
