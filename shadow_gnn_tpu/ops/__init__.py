from shadow_gnn_tpu.ops.normalize import (
    dropedge_mask, adj_norm_sym, adj_norm_rw, adj_gin_rescale, adj_gat_drop,
    prepare_adj,
)
from shadow_gnn_tpu.ops.segment import (
    masked_mean_pool, masked_max_pool, masked_sum_pool, masked_sort_pool,
)
from shadow_gnn_tpu.ops.spmm import spmm_csr, spmm_edges
