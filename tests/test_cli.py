"""CLI smoke tests: the subcommand pipeline wiring (datagen -> preprocess ->
train -> rollout; demo-ppo) with tiny budgets, mirroring the reference's
entry-point scripts."""

import dataclasses
import os

import numpy as np
import pytest

import adaptigraph_tpu.cli as cli
from adaptigraph_tpu.utils.config import load_dynamics_config


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory, monkeypatch_module=None):
    root = tmp_path_factory.mktemp("cli")
    data_dir = str(root / "sim")
    prep_dir = str(root / "prep")
    cli.main(["datagen", "--material", "rope", "--data_dir", data_dir,
              "--n_episodes", "2", "--n_pushes", "2", "--seed", "0"])
    cli.main(["preprocess", "--config", "rope", "--data_dir", data_dir,
              "--prep_dir", prep_dir])
    return root, data_dir, prep_dir


def test_datagen_preprocess(tiny_run):
    root, data_dir, prep_dir = tiny_run
    assert os.path.isdir(os.path.join(data_dir, "000000"))
    assert os.path.exists(os.path.join(prep_dir, "episodes", "000000.npz"))
    assert os.path.exists(os.path.join(prep_dir, "physics.npz"))


def test_train_rollout_cli(tiny_run):
    root, data_dir, prep_dir = tiny_run
    out_dir = str(root / "run")
    cli.main(["train", "--config", "rope", "--prep_dir", prep_dir,
              "--out_dir", out_dir, "--epochs", "1", "--iters", "3",
              "--batch_size", "4"])
    assert os.path.exists(os.path.join(out_dir, "checkpoints", "latest.npz"))
    cli.main(["rollout", "--config", "rope", "--prep_dir", prep_dir,
              "--out_dir", out_dir])
    assert os.path.exists(os.path.join(out_dir, "rollout", "rollout_errors.npz"))


def test_demo_ppo_cli(tmp_path, capsys):
    """Record tiny fixtures with a known param and replay them through the
    demo-ppo subcommand (reference demo_granular_1 contract)."""
    import jax

    from adaptigraph_tpu.planning.physics_optimizer import PhysicsParamOnlineOptimizer
    from adaptigraph_tpu.utils.config import load_planning_config
    from adaptigraph_tpu.planning.forward import dynamics_masked

    task = load_planning_config("rope")
    tcfg, _ = cli._task_objects(task)
    # shrink the model for speed
    gnn = dataclasses.replace(tcfg.dcfg.gnn, nf_particle=16, nf_relation=16,
                              nf_effect=16, pstep=2, max_nobj=20)
    edge = dataclasses.replace(tcfg.dcfg.edge, max_nobj=20, topk=5)
    dcfg = dataclasses.replace(tcfg.dcfg, gnn=gnn, edge=edge, max_repeat=3)

    from adaptigraph_tpu.models.gnn import init_params
    params = init_params(jax.random.PRNGKey(0), gnn)
    ppo = PhysicsParamOnlineOptimizer(dcfg, params, phys_dim=1,
                                      save_dir=str(tmp_path))
    rng = np.random.RandomState(0)
    for i in range(2):
        n = 15
        st = rng.randn(n, 3).astype(np.float32) * 0.3
        act = np.array([-1.0, 0.0, 0.0, 2.0], np.float32)
        sp = np.zeros((20, 3), np.float32)
        sp[:n] = st
        m = np.zeros(20, bool)
        m[:n] = True
        real = dynamics_masked(params, sp[None], m[None], act[None],
                               np.asarray([[0.3]], np.float32), dcfg)[0]
        ppo.add_interaction(act, st, np.asarray(real)[:n], np.asarray(real)[:n])

    ppo2 = PhysicsParamOnlineOptimizer(dcfg, params, phys_dim=1)
    ppo2.load_interactions(str(tmp_path))
    est, err, err0 = ppo2.optimize(iterations=10)
    assert err <= err0 + 1e-9


def test_filter_cli(tiny_run, tmp_path, capsys):
    """filter subcommand writes a json consumable by preprocess
    --filter_file (reference: filter_sim_data.py -> read_in_filter_file)."""
    import json

    root, data_dir, prep_dir = tiny_run
    out = str(tmp_path / "filter.json")
    cli.main(["filter", "--data_dir", data_dir, "--out", out])
    assert os.path.exists(out)
    with open(out) as f:
        json.load(f)  # valid json
    # preprocess accepts the filter file (possibly empty)
    prep2 = str(tmp_path / "prep2")
    cli.main(["preprocess", "--config", "rope", "--data_dir", data_dir,
              "--prep_dir", prep2, "--filter_file", out])
    assert os.path.exists(os.path.join(prep2, "episodes", "000000.npz"))


def test_plan_cli_box_target(tmp_path, capsys):
    """plan subcommand with the granular box target from the yaml
    (reference: plan.py:147-155 target_type box) — smoke budgets, random
    init, XLA forward path on the CPU backend."""
    cli.main(["plan", "--config", "granular", "--n_actions", "1",
              "--n_sample", "8", "--n_sample_chunk", "8", "--no_ppo",
              "--save_dir", str(tmp_path), "--seed", "0"])
    out = capsys.readouterr().out
    assert "plan done" in out
    assert os.path.exists(tmp_path / "step_000.npz")


def test_perception_goal_to_plan_handoff(tmp_path, capsys):
    """The operator workflow: capture a goal with the perception CLI, then
    plan toward it (reference: perception.py construct_goal_from_perception
    -> plan.py target pcd)."""
    goal = str(tmp_path / "goal.npz")
    cli.main(["perception", "--construct_goal", "--material", "rope",
              "--seed", "3", "--out", goal])
    assert os.path.exists(goal)
    cli.main(["plan", "--config", "rope", "--target", goal, "--n_actions", "1",
              "--n_sample", "8", "--no_ppo", "--seed", "3",
              "--save_dir", str(tmp_path / "plan")])
    out = capsys.readouterr().out
    assert "plan done" in out


def test_datagen_config_box(tmp_path):
    cli.main(["datagen", "--config", "box", "--data_dir", str(tmp_path),
              "--n_episodes", "2"])
    assert os.path.exists(tmp_path / "000000.npz")
    assert os.path.exists(tmp_path / "000001.npz")


def test_config_validation():
    from adaptigraph_tpu.utils.config import load_dynamics_config, load_planning_config
    from adaptigraph_tpu.utils.validate import ConfigError, validate_dynamics_config

    # all shipped configs must validate
    for name in ("rope", "granular", "cloth", "softbody", "bunnybath",
                 "multiobj"):
        load_dynamics_config(name)
    for name in ("rope", "granular", "cloth"):
        load_planning_config(name)
    # a broken config must fail with a pointed message
    cfg = load_dynamics_config("rope")
    del cfg["model_config"]["pstep"]
    with pytest.raises(ConfigError, match="pstep"):
        validate_dynamics_config(cfg)


def test_metrics_logger(tmp_path):
    from adaptigraph_tpu.utils.metrics import MetricsLogger, read_metrics

    m = MetricsLogger(str(tmp_path))
    m.log("train", step=1, loss=0.5)
    m.log("valid", step=1, loss=0.4, err=0.1)
    m.close()
    recs = read_metrics(str(tmp_path / "metrics.jsonl"))
    assert len(recs) == 2
    assert recs[0]["tag"] == "train" and recs[0]["loss"] == 0.5
    assert recs[1]["err"] == 0.1


def test_perception_cli(tmp_path):
    """Goal capture + calibration check (reference: perception.py:428-444
    main with --calibrate / --construct_goal)."""
    out = tmp_path / "goal.npz"
    cli.main(["perception", "--construct_goal", "--material", "rope",
              "--out", str(out)])
    import numpy as np

    goal = np.load(out)["goal"]
    assert goal.ndim == 2 and goal.shape[1] == 3 and len(goal) > 10
    cli.main(["perception", "--calibrate", "--material", "rope"])


def test_main_survives_ambient_axon_env_in_process(tmp_path):
    """Guard for the round-4 silent false success: with the shipped
    JAX_PLATFORMS=axon env var set, an IN-PROCESS cli.main() call must
    return normally (the os._exit(0) teardown workaround is reserved for
    console_main, the real process entry point). Runs in a subprocess so
    the env var can be set without conftest interference."""
    import subprocess
    import sys

    code = (
        "import os; os.environ['JAX_PLATFORMS'] = 'axon'\n"
        "import adaptigraph_tpu.cli as cli\n"
        f"cli.main(['datagen', '--material', 'box', '--data_dir', {str(tmp_path)!r},"
        " '--n_episodes', '1'])\n"
        "print('SURVIVED-IN-PROCESS')\n"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert p.returncode == 0, p.stderr
    assert "SURVIVED-IN-PROCESS" in p.stdout, (p.stdout, p.stderr)
