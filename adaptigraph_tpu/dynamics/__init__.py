from adaptigraph_tpu.dynamics.graphs import GraphSpec, assemble_sample, collate
from adaptigraph_tpu.dynamics.dataset import DynDataset, BatchLoader
