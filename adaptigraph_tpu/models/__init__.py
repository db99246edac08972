from adaptigraph_tpu.models.gnn import (
    GNNConfig,
    init_params,
    forward,
    forward_batch,
    count_params,
    model_config_from_yaml,
)
