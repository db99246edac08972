from adaptigraph_tpu.ops.graph import (
    EdgeConfig,
    build_neighbor_graph,
    graph_to_edge_set,
    neighbor_gather,
    neighbor_aggregate,
)
from adaptigraph_tpu.ops.fps import fps_numpy, fps_rad_numpy, fps_downsample, fps_jax
from adaptigraph_tpu.ops.costs import (
    chamfer,
    masked_chamfer,
    box_loss,
    rope_penalty,
    cloth_penalty,
    granular_penalty,
)
