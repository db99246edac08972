"""Perception + real-robot I/O tier (reference: src/planning/perception.py,
src/planning/real_world/*).

Hardware-dependent pieces (RealSense cameras, xArm6, GroundingDINO+SAM) are
gated behind optional imports / injectable callables; the geometric and IPC
cores are fully testable, and ``SimRealEnv`` provides a sim-backed stand-in
with the same observation interface so the closed planning loop runs
end-to-end without hardware (the reference's biggest testability gap,
SURVEY.md §7.9).
"""

from adaptigraph_tpu.realworld.pointcloud import (
    depth_to_points,
    fuse_views,
    crop_bbox,
    voxel_downsample,
    remove_statistical_outliers,
    z_percentile_filter,
)
from adaptigraph_tpu.realworld.perception import (
    PerceptionModule,
    construct_graph,
    get_state_cur,
)
from adaptigraph_tpu.realworld.cameras import VirtualCamera, make_multiview_cameras
from adaptigraph_tpu.realworld.env import SimRealEnv
from adaptigraph_tpu.realworld.shm import ShmQueue, ShmRingBuffer
from adaptigraph_tpu.realworld.accumulate import (
    TimestampActionAccumulator,
    TimestampObsAccumulator,
    accumulate_timestamp_idxs,
    align_to_global_idxs,
)
