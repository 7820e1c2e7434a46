from shadow_gnn_tpu.nn.layers import (
    GCNConv, SAGEConv, GINConv, GATConv, GATScatterConv, MLPLayer,
    NAME2LAYER,
)
from shadow_gnn_tpu.nn.respool import ResPool, EnsembleAggregator
from shadow_gnn_tpu.nn.model import DeepGNN, ModelConfig
