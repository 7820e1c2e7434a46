from shadow_gnn_tpu.sampling.ppr import (
    ppr_push_host,
    ppr_topk_tables,
    ppr_power_device,
    write_ppr_cache,
    read_ppr_cache,
    ppr_cache_paths,
)
from shadow_gnn_tpu.sampling.batch import SubgraphBatch, SamplerConfig
from shadow_gnn_tpu.sampling.samplers import sample_subgraphs, build_sampler
