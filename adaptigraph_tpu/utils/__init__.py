from adaptigraph_tpu.utils.config import load_yaml
from adaptigraph_tpu.utils.seed import set_seed
