from shadow_gnn_tpu.train.metrics import Metrics, METRICS
from shadow_gnn_tpu.train.config import parse_config, DEFAULT_ARCH, DEFAULT_PARAMS
from shadow_gnn_tpu.train.logger import Logger
from shadow_gnn_tpu.train.pipeline import Trainer
