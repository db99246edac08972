#!/usr/bin/env python
"""Render the README quality + bench tables FROM the artifacts (VERDICT r3
weak #7 / next #9: the published story must not lag the repo's own records).

Reads runs/quality.jsonl (latest row per stage+material+tag wins),
BENCH_r*.json, and artifacts/r4/*.json; prints markdown to stdout. CPU-only.
"""

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_rows(path):
    """quality.jsonl -> {key: row} keeping the LAST occurrence."""
    rows = {}
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except ValueError:
                continue
            stage = r.get("stage")
            if stage in ("start", "end"):
                continue
            key = (stage, r.get("material"), r.get("seed"), r.get("verify"),
                   r.get("tag"), r.get("epoch"),
                   json.dumps(r.get("budget", {}), sort_keys=True))
            rows[key] = r
    return rows


def fmt(x, nd=4):
    if x is None:
        return "—"
    return f"{x:.{nd}g}" if isinstance(x, float) else str(x)


def main():
    rows = latest_rows(os.path.join(ROOT, "runs", "quality.jsonl"))

    print("## Quality matrix (from runs/quality.jsonl)\n")
    print("| material | train epochs | valid loss | rollout median@last | "
          "rollout push-final median |")
    print("|---|---|---|---|---|")
    mats = ["rope", "granular", "cloth", "multiobj", "rope_robot",
            "bunnybath", "softbody"]
    trains = {k[1]: v for k, v in rows.items() if k[0] == "train"}
    rolls = {k[1]: v for k, v in rows.items() if k[0] == "rollout"}
    for m in mats:
        t, r = trains.get(m, {}), rolls.get(m, {})
        print(f"| {m} | {fmt(t.get('epochs'))} ({t.get('status', '—')}) "
              f"| {fmt(t.get('valid_loss'))} | {fmt(r.get('median_last_step'))} "
              f"| {fmt(r.get('push_final_median'))} |")

    print("\n## Closed-loop plans (from runs/quality.jsonl)\n")
    print("| material | tag | budget | initial err | best | final | "
          "phys estimate | true phys |")
    print("|---|---|---|---|---|---|---|---|")
    plans = [(k, v) for k, v in rows.items()
             if k[0] == "plan" and v.get("best") is not None]
    for k, v in sorted(plans, key=lambda kv: (kv[0][1] or "",
                                              str(kv[1].get("tag") or kv[0][2]))):
        b = v.get("budget", {})
        tag = v.get("tag") or f"seed {v.get('seed')} verify={v.get('verify')}"
        est = v.get("final_phys_estimate")
        truth = v.get("true_phys")
        print(f"| {k[1]} | {tag} | {b.get('n_sample', '—')} "
              f"| {fmt(v.get('initial_error'))} | {fmt(v.get('best'))} "
              f"| {fmt(v.get('final'))} "
              f"| {fmt(est[0]) if est else '—'} "
              f"| {fmt(truth[0]) if truth else '—'} |")

    ab = [(k, v) for k, v in rows.items()
          if k[0] == "plan" and (v.get("tag") or "").startswith("ab_")
          and v.get("final") is not None]
    if ab:
        print("\n## Adaptation A/B (matched seeds + matched warmup pushes; "
              "VERDICT r4 #1)\n")
        print("| material | seed | arm | initial | best | final | "
              "estimate | true | |est-true| |")
        print("|---|---|---|---|---|---|---|---|---|")
        arms = {}
        for k, v in sorted(ab, key=lambda kv: (kv[0][1], str(kv[1]["tag"]))):
            tag = v["tag"]  # ab_<arm>_seed<k>
            arm = tag[3:tag.rindex("_seed")]
            est, truth = v.get("final_phys_estimate"), v.get("true_phys")
            gap = (abs(est[0] - truth[0])
                   if est and truth else None)
            arms.setdefault((k[1], arm), []).append(
                (v["final"], v.get("initial_error")))
            print(f"| {k[1]} | {v.get('seed')} | {arm} "
                  f"| {fmt(v.get('initial_error'))} | {fmt(v.get('best'))} "
                  f"| {fmt(v['final'])} | {fmt(est[0]) if est else '—'} "
                  f"| {fmt(truth[0]) if truth else '—'} | {fmt(gap)} |")
        print("\n| material | arm | mean final | mean Δ vs initial |")
        print("|---|---|---|---|")
        for (mat, arm), vals in sorted(arms.items()):
            finals = [f for f, _ in vals]
            deltas = [f - i for f, i in vals if i is not None]
            import numpy as _np
            print(f"| {mat} | {arm} | {fmt(float(_np.mean(finals)))} "
                  f"| {fmt(float(_np.mean(deltas)) if deltas else None)} |")

    fresh = [(k, v) for k, v in rows.items() if k[0] == "rollout_fresh_eval"]
    if fresh:
        print("\n## Fresh-test-set rollouts (never-trained episodes)\n")
        print("| material | epoch | pushes | median@last | push-final median |")
        print("|---|---|---|---|---|")
        for k, v in sorted(fresh, key=lambda kv: str(kv[0][1])):
            print(f"| {k[1]} | {v.get('epoch') or 'final'} "
                  f"| {fmt(v.get('n_pushes'))} "
                  f"| {fmt(v.get('median_last_step'))} "
                  f"| {fmt(v.get('push_final_median'))} |")

    benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if benches:
        print("\n## Bench history (driver-recorded)\n")
        print("| round | solves/s | spread (min-max) | granular solves/s | "
              "rollout steps/s (B=16) | amortized | train samples/s |")
        print("|---|---|---|---|---|---|---|")
        for b in benches:
            with open(b) as f:
                d = json.load(f)
            p = d.get("parsed", d)
            e = p.get("extra", {})
            sp = e.get("spread", {}).get("solves_per_s", {})
            spread = (f"{fmt(sp.get('min'))}-{fmt(sp.get('max'))}"
                      if sp else "—")
            print(f"| {os.path.basename(b)[7:9]} | {fmt(p.get('value'))} "
                  f"| {spread} | {fmt(e.get('granular_solves_per_s'))} "
                  f"| {fmt(e.get('rollout_steps_per_s'))} "
                  f"| {fmt(e.get('rollout_steps_per_s_amortized'))} "
                  f"| {fmt(e.get('train_samples_per_s'))} |")

    for name in ("fused_shard_rope_tpu", "granular_drift"):
        p = os.path.join(ROOT, "artifacts", "r4", name + ".json")
        if os.path.exists(p):
            with open(p) as f:
                print(f"\n## {name}\n\n```json\n{f.read().strip()}\n```")


if __name__ == "__main__":
    main()
