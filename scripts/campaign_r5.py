#!/usr/bin/env python
"""Round-5 evidence campaign (VERDICT r4 next #1-#9).

Serialized TPU schedule (one client at a time; the tunnel wedges under
overlap — see campaign.py docstring):

  1. train rope/granular/cloth on the fresh 100-episode sets
  2. ADAPTATION A/B (the round's thesis experiment): rope + granular,
     seeds 0-2, matched arms
        ppo     — online physics optimization, 3 warmup excitation pushes
        noppo   — fixed 0.5 parameter (adaptation off)
        oracle  — plan with the scene's TRUE parameter (upper bound)
     every run records true_phys in initial.npz (closed_loop.py)
  3. PPO objective-surface diagnosis per ppo arm (the −0.2 clamp question)
  4. cloth closed loop, 3 seeds, with always-on pred_state logging,
     + per-push model-vs-reality diagnosis rows
  5. checkpoint-selection proxy: fresh-set rollout AND miniplan rankings
     over rope epochs (does the planning proxy pick ep-50?)
  6. data scaling: rope_robot 100 vs 300 episodes, fresh-set eval at the
     FINAL checkpoint each
  7. knob rescue A/Bs: verify-gate at the convergence floor; execute_mean
     at reward_weight 100
  8. granular PPO demo fixture (recorded interactions + known truth)
  9. remaining materials (multiobj/bunnybath/softbody) as time allows

Every stage appends a row to runs/quality.jsonl.
"""

import glob
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import campaign as c  # run/tpu_healthy/wait_for_tpu/epochs_done/record helpers

import numpy as np

DEADLINE_S = float(os.environ.get("CAMPAIGN_DEADLINE_S", 5.5 * 3600))
c.DEADLINE_S = DEADLINE_S
c.T0 = time.time()
note, record, left = c.note, c.record, c.left


def wait_tpu():
    # ADVICE r4: cap the wait by the remaining deadline budget
    return c.wait_for_tpu(max_wait=min(3000, max(left(), 0)))


# Probe economy: tpu_healthy costs 10 s-10 min per call (a fresh axon client
# through the tunnel), and the round-5 A/B is ~30 short plans back-to-back.
# After a CLEAN rc=0 child exit the tunnel is almost always fine — skip the
# probe and only re-probe after a failure/timeout/stall.
_LAST_CLEAN = {"ok": False}


def maybe_wait_tpu():
    if _LAST_CLEAN["ok"]:
        return True
    ok = wait_tpu()
    _LAST_CLEAN["ok"] = ok
    return ok


def train(mat, cfg=None, prep_dir=None, epochs=50, timeout=2400, out=None):
    cfg = cfg or mat
    out = out or os.path.join("runs", mat)
    log = os.path.join("runs", "logs", f"train_{mat}.log")
    for attempt in range(8):
        done, last_valid = c.epochs_done(out)
        if done >= epochs:
            note(f"train {mat}: COMPLETE {done}/{epochs} (valid {last_valid})")
            record({"stage": "train", "material": mat, "epochs": done,
                    "valid_loss": last_valid, "status": "complete"})
            return True
        if left() < 300 or not maybe_wait_tpu():
            record({"stage": "train", "material": mat, "epochs": done,
                    "status": "deadline_or_tpu"})
            return done > 0
        cmd = [sys.executable, "-m", "adaptigraph_tpu", "train",
               "--config", cfg, "--out_dir", out,
               "--epochs", str(epochs - done)]
        if prep_dir:
            cmd += ["--prep_dir", prep_dir]
        if done > 0 or attempt > 0:
            cmd += ["--resume"]
        rc = c.run(cmd, min(timeout, max(left(), 60)), log, stall_timeout=900)
        note(f"train {mat} attempt {attempt}: rc={rc}")
        _LAST_CLEAN["ok"] = rc == 0
        if rc in ("timeout", "stalled"):
            time.sleep(120)
    done, last_valid = c.epochs_done(out)
    record({"stage": "train", "material": mat, "epochs": done,
            "valid_loss": last_valid,
            "status": "complete" if done >= epochs else "incomplete"})
    return done > 0


def wait_prep(path, max_wait=5400):
    t = time.time()
    while time.time() - t < max_wait and left() > 600:
        if os.path.isdir(path) and len(os.listdir(path)) >= 3:
            return True
        note(f"waiting for {path} (gen_r5 still running)")
        time.sleep(90)
    return os.path.isdir(path) and len(os.listdir(path)) >= 3


def plan(mat, seed, tag, extra=(), ckpt_dir=None, n_sample=20000, chunk=2000,
         timeout=4200, stall=2700, plan_cfg=None):
    ckpt_dir = ckpt_dir or os.path.join("runs", mat)
    save_dir = os.path.join("runs", mat, tag)
    log = os.path.join("runs", "logs", f"plan_{mat}_{tag}.log")
    if not os.path.exists(os.path.join(ckpt_dir, "checkpoints", "latest.npz")):
        note(f"plan {mat} {tag}: no checkpoint, skipping")
        return
    if os.path.exists(os.path.join(save_dir, ".done")):
        note(f"plan {mat} {tag}: already complete, skipping")
        return
    cmd = [sys.executable, "-m", "adaptigraph_tpu", "plan",
           "--config", plan_cfg or mat, "--ckpt_dir", ckpt_dir,
           "--save_dir", save_dir, "--seed", str(seed),
           "--n_sample", str(n_sample), "--n_sample_chunk", str(chunk),
           *extra]
    if glob.glob(os.path.join(save_dir, "step_*.npz")):
        cmd += ["--resume"]
    if not maybe_wait_tpu():
        return
    rc = c.run(cmd, min(timeout, max(left(), 60)), log, stall_timeout=stall)
    _LAST_CLEAN["ok"] = rc == 0
    errs, initial, phys, truth = [], None, None, None
    if os.path.isdir(save_dir):
        for f in sorted(glob.glob(os.path.join(save_dir, "step_*.npz"))):
            errs.append(float(np.load(f)["error"]))
        ifile = os.path.join(save_dir, "initial.npz")
        if os.path.exists(ifile):
            d = np.load(ifile)
            initial = float(d["error"])
            if "true_phys" in d.files:
                truth = [float(x) for x in np.atleast_1d(d["true_phys"])]
        pfiles = [f for f in sorted(glob.glob(
            os.path.join(save_dir, "ppo_*.npz")))
            if os.path.basename(f)[4:-4].isdigit()]
        if pfiles:
            pfiles.sort(key=lambda f: int(os.path.basename(f)[4:-4]))
            phys = [float(x) for x in
                    np.atleast_1d(np.load(pfiles[-1])["physics_param"])]
    record({"stage": "plan", "material": mat, "seed": seed, "tag": tag,
            "rc": str(rc), "initial_error": initial, "errors": errs,
            "best": min(errs) if errs else None,
            "final": errs[-1] if errs else None,
            "final_phys_estimate": phys, "true_phys": truth,
            "arm_extra": list(extra),
            "budget": {"n_sample": n_sample, "chunk": chunk}})
    if rc == 0 and errs:
        with open(os.path.join(save_dir, ".done"), "w") as f:
            f.write("1")
    note(f"plan {mat} {tag}: rc={rc} initial={initial} final="
         f"{errs[-1] if errs else None} phys={phys} truth={truth}")


def script(name, argv, tag, timeout=2400, stall=1500, need_tpu=True):
    log = os.path.join("runs", "logs", f"{tag}.log")
    if need_tpu and not maybe_wait_tpu():
        return None
    rc = c.run([sys.executable, name, *argv],
               min(timeout, max(left(), 60)), log, stall_timeout=stall)
    if need_tpu:
        _LAST_CLEAN["ok"] = rc == 0
    rows = []
    try:
        with open(log) as f:
            rows = [json.loads(x) for x in f if x.strip().startswith("{")]
    except ValueError:
        pass
    record({"stage": tag, "rc": str(rc),
            "summary": rows[-1] if rows else None})
    note(f"{tag}: rc={rc} rows={len(rows)}")
    return rows


def rollout(mat, cfg=None, prep_dir=None, out=None, tag=None):
    cfg = cfg or mat
    out = out or os.path.join("runs", mat)
    roll = os.path.join(out, "rollout")
    if os.path.exists(os.path.join(roll, "summary.json")):
        return
    log = os.path.join("runs", "logs", f"rollout_{tag or mat}.log")
    cmd = [sys.executable, "-m", "adaptigraph_tpu", "rollout",
           "--config", cfg, "--out_dir", out]
    if prep_dir:
        cmd += ["--prep_dir", prep_dir]
    if not maybe_wait_tpu():
        return
    rc = c.run(cmd, min(2400, max(left(), 60)), log, stall_timeout=900)
    _LAST_CLEAN["ok"] = rc == 0
    stats = {}
    sfile = os.path.join(roll, "summary.json")
    if os.path.exists(sfile):
        with open(sfile) as f:
            stats = json.load(f)
    record({"stage": "rollout", "material": tag or mat, "rc": str(rc), **stats})
    note(f"rollout {tag or mat}: rc={rc} stats={stats}")


def fresh_eval(mat, cfg, ckpt_out, fresh_prep, tag, epoch=None):
    """100-push fresh-set evaluation at a specific checkpoint."""
    if not os.path.isdir(fresh_prep):
        note(f"fresh_eval {tag}: no {fresh_prep}")
        return
    log = os.path.join("runs", "logs", f"fresh_{tag}.log")
    cmd = [sys.executable, "-m", "adaptigraph_tpu", "rollout",
           "--config", cfg, "--out_dir", ckpt_out, "--prep_dir", fresh_prep,
           "--all_episodes"]
    if epoch is not None:
        cmd += ["--epoch", str(epoch)]
    if not maybe_wait_tpu():
        return
    rc = c.run(cmd, min(2400, max(left(), 60)), log, stall_timeout=900)
    _LAST_CLEAN["ok"] = rc == 0
    stats = {}
    sfile = os.path.join(ckpt_out, "rollout", "summary.json")
    if os.path.exists(sfile):
        with open(sfile) as f:
            stats = json.load(f)
    record({"stage": "rollout_fresh_eval", "material": tag, "rc": str(rc),
            "epoch": epoch, **stats})
    note(f"fresh_eval {tag}: rc={rc} stats={stats}")


AB_ARMS = [
    # every arm executes the SAME 3 excitation pushes (matched post-warmup
    # start state); only the ppo arm records + fits them
    ("ppo", ["--ppo_warmup", "3"]),
    ("noppo", ["--no_ppo", "--ppo_warmup", "3"]),
    ("oracle", ["--oracle", "--ppo_warmup", "3"]),
]


def main():
    os.makedirs("runs/logs", exist_ok=True)
    record({"stage": "start", "round": 5, "deadline_s": DEADLINE_S})

    # ---- 1. flagship trains (cloth moved after the A/Bs: its datagen is
    # the slow pole, ~95 s/episode, and must not stall the thesis
    # experiment) --------------------------------------------------------
    for mat in ("rope", "granular"):
        if left() < 900:
            break
        if wait_prep(os.path.join("data", "prep", mat)):
            if train(mat):
                rollout(mat)

    # ---- 2. adaptation A/B -------------------------------------------------
    for mat in ("rope", "granular"):
        for seed in (0, 1, 2):
            for arm, extra in AB_ARMS:
                if left() < 1200:
                    note("deadline: stopping A/B")
                    break
                plan(mat, seed, f"ab_{arm}_seed{seed}", extra=extra,
                     timeout=5400 if (seed == 0 and arm == "ppo") else 3600)

    # ---- 3. PPO objective diagnosis ---------------------------------------
    for mat in ("rope", "granular"):
        for seed in (0, 1, 2):
            sd = os.path.join("runs", mat, f"ab_ppo_seed{seed}")
            if left() < 600 or not os.path.isdir(sd):
                continue
            script("scripts/diag_ppo_objective.py",
                   ["--config", mat, "--ckpt_dir", os.path.join("runs", mat),
                    "--save_dir", sd,
                    "--out", f"artifacts/r5/ppo_objective_{mat}_s{seed}.npz"],
                   f"ppo_objective_{mat}_s{seed}", timeout=1800)

    # ---- 4. checkpoint-selection proxy ------------------------------------
    if left() > 1800 and os.path.isdir("runs/rope/checkpoints"):
        script("scripts/select_checkpoint.py",
               ["--config", "rope", "--out_dir", "runs/rope",
                "--prep_dir", "data/prep/rope_fresh",
                "--epochs", "10", "20", "30", "40", "50"],
               "select_rope_rollout", timeout=2400)
        script("scripts/select_checkpoint.py",
               ["--config", "rope", "--out_dir", "runs/rope",
                "--proxy", "miniplan", "--plan_config", "rope",
                "--seeds", "21", "22", "23",
                "--epochs", "10", "30", "50"],
               "select_rope_miniplan", timeout=3600, stall=2400)

    # ---- 5. data scaling (rope_robot 100 vs 300) --------------------------
    if left() > 1800 and wait_prep("data/prep/rope_robot", max_wait=600):
        if train("rope_robot", cfg="rope", prep_dir="data/prep/rope_robot"):
            fresh_eval("rope_robot", "rope", "runs/rope_robot",
                       "data/prep/rope_robot_fresh", "rope_robot_100")
    if left() > 1800 and wait_prep("data/prep/rope_robot300", max_wait=1200):
        if train("rope_robot300", cfg="rope",
                 prep_dir="data/prep/rope_robot300"):
            fresh_eval("rope_robot300", "rope", "runs/rope_robot300",
                       "data/prep/rope_robot_fresh", "rope_robot_300")

    # ---- 7. knob rescue A/Bs ----------------------------------------------
    if left() > 1500:
        # verify gate AT THE FLOOR: 20 actions so the loop reaches its
        # plateau, gate on vs off, PPO off to isolate the gate
        for gate in (["--verify"], []):
            tag = "floor_gate" if gate else "floor_nogate"
            plan("rope", 7, tag, extra=[*gate, "--no_ppo",
                                        "--n_actions", "20"],
                 n_sample=4000, timeout=3600)
    if left() > 1500:
        # execute_mean at a flat softmax (reward_weight 100)
        for em in (["--execute_mean"], []):
            tag = "rw100_mean" if em else "rw100_argmax"
            plan("rope", 8, tag, extra=[*em, "--no_ppo",
                                        "--reward_weight", "100"],
                 n_sample=4000, timeout=3600)

    # ---- 8. granular PPO demo fixture -------------------------------------
    if left() > 900 and os.path.isdir("runs/granular/checkpoints"):
        script("scripts/make_granular_fixture.py", [],
               "granular_fixture", timeout=2400)

    # ---- 9. cloth train + closed loop + diagnosis (datagen's slow pole;
    # prep typically lands ~2.5 h in) ---------------------------------------
    if left() > 1800 and wait_prep("data/prep/cloth", max_wait=3600):
        if train("cloth", timeout=2700):
            rollout("cloth")
            for seed in (0, 1, 2):
                if left() < 1200:
                    break
                plan("cloth", seed, f"ab_seed{seed}",
                     extra=["--ppo_warmup", "3"],
                     timeout=4800 if seed == 0 else 3000)
                sd = os.path.join("runs", "cloth", f"ab_seed{seed}")
                if os.path.isdir(sd):
                    script("scripts/diag_plan_steps.py", ["--save_dir", sd],
                           f"diag_cloth_seed{seed}", timeout=600,
                           need_tpu=False)

    # ---- 10. remaining materials ------------------------------------------
    for mat, epochs in (("multiobj", 50), ("bunnybath", 50), ("softbody", 12)):
        if left() < 1500:
            record({"stage": "train", "material": mat, "status": "skipped"})
            continue
        if wait_prep(os.path.join("data", "prep", mat), max_wait=900):
            if train(mat, epochs=epochs,
                     timeout=3300 if mat == "softbody" else 2700):
                rollout(mat)

    # ---- 11. granular fused-kernel block-size sweep (perf headroom;
    # last — Mosaic compiles of new block shapes can run long) --------------
    if left() > 1500:
        script("scripts/tune_granular_spb.py", [], "granular_spb",
               timeout=3600, stall=2400)

    record({"stage": "end"})
    note("campaign_r5 done")


if __name__ == "__main__":
    main()
