#!/usr/bin/env python
"""Post-campaign round-5 batch (serialized after campaign_r5 finishes).

1. ep-30 vs ep-50 FULL-BUDGET planning comparison on the A/B seeds: the
   round-4 finding was "fresh-rollout picks ep-30 but ep-50 PLANS better";
   this round's miniplan proxy picked ep-30 with a tiny budget. Settle it
   at the reference budget on this round's checkpoints: rope seeds 0-2
   with --epoch 30, matched against the recorded ep-50 (latest) arms.
2. fresh-set rollouts for rope/granular at the final checkpoint (the
   matrix rows the selector stage only recorded per-epoch).
3. anything the campaign deadline skipped (spb sweep) — guarded by .done
   markers in runs/quality.jsonl consumers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import campaign_r5 as r5

r5.c.T0 = time.time()
r5.DEADLINE_S = float(os.environ.get("CAMPAIGN_DEADLINE_S", 3600))
r5.c.DEADLINE_S = r5.DEADLINE_S
note, left = r5.note, r5.left


def main():
    r5.record({"stage": "start", "round": 5, "batch": "post"})

    # 1. full-budget ep-30 plans on the matched A/B seeds
    for seed in (0, 1, 2):
        if left() < 600:
            break
        r5.plan("rope", seed, f"ep30_seed{seed}",
                extra=["--no_ppo", "--ppo_warmup", "3", "--epoch", "30"],
                timeout=3000)
    # matched ep-50 no-adaptation arms already exist: ab_noppo_seed{0,1,2}

    # 2. fresh-set rollouts at the final checkpoints
    r5.fresh_eval("rope", "rope", "runs/rope", "data/prep/rope_fresh",
                  "rope_fresh_final")
    r5.fresh_eval("granular", "granular", "runs/granular",
                  "data/prep/granular_fresh", "granular_fresh_final")

    # 3. granular spb sweep if the campaign skipped it
    if left() > 1200 and not os.path.exists("runs/logs/granular_spb.log"):
        r5.script("scripts/tune_granular_spb.py", [], "granular_spb",
                  timeout=3600, stall=2400)

    r5.record({"stage": "end", "batch": "post"})
    note("post_campaign_r5 done")


if __name__ == "__main__":
    main()
