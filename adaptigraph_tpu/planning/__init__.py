from adaptigraph_tpu.planning.actions import (
    decode_action,
    angle_normalize,
    clip_actions,
    sample_action_seq,
    sample_action_seq_correlated,
    optimize_action_mppi,
)
from adaptigraph_tpu.planning.planner import Planner, PlannerConfig
from adaptigraph_tpu.planning.forward import DynamicsConfig, dynamics_rollout, dynamics_masked
