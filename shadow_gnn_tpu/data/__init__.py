from shadow_gnn_tpu.data.graph import RawGraph, DeviceGraph
from shadow_gnn_tpu.data.synthetic import make_random_graph, make_synthetic_dataset
from shadow_gnn_tpu.data.loader import load_data
from shadow_gnn_tpu.data.format import (
    save_shadow_format,
    load_adj,
    to_undirected_csr,
    write_bin_csr,
)
