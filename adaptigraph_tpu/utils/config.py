"""YAML config loading.

Mirrors the reference's plain-YAML config families (reference:
``src/sim/utils.py:5`` ``load_yaml`` and ``src/planning/plan.py:73-81``):
a dynamics config with ``dataset_config/train_config/model_config/
rollout_config/material_config`` sections and a planning ``task_config``
that points at a dynamics config.
"""

import os
import yaml


def load_yaml(path):
    with open(path, "r") as f:
        return yaml.safe_load(f)


def config_dir():
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def load_dynamics_config(name_or_path, validate=True):
    """Load a dynamics config by material name (e.g. 'rope') or explicit path."""
    if os.path.exists(name_or_path):
        cfg = load_yaml(name_or_path)
    else:
        cfg = load_yaml(os.path.join(config_dir(), "dynamics", f"{name_or_path}.yaml"))
    if validate:
        from adaptigraph_tpu.utils.validate import validate_dynamics_config

        validate_dynamics_config(cfg)
    return cfg


def load_planning_config(name_or_path):
    """Load a planning task config by material name or explicit path.

    Resolves the nested dynamics config pointer (reference:
    ``src/planning/plan.py:74-81``).
    """
    if os.path.exists(name_or_path):
        task = load_yaml(name_or_path)["task_config"]
    else:
        task = load_yaml(os.path.join(config_dir(), "planning", f"{name_or_path}.yaml"))["task_config"]
    dyn_path = task["config"]
    if not os.path.exists(dyn_path):
        dyn_path = os.path.join(config_dir(), "dynamics", os.path.basename(dyn_path))
    task["_dynamics_config"] = load_dynamics_config(dyn_path)
    from adaptigraph_tpu.utils.validate import validate_planning_config

    validate_planning_config(task)
    return task
