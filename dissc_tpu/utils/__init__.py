"""Utility namespace: seeding, logging, profiling, checkpoints.

Stable re-export surface over the implementation modules.
"""
from dissc_tpu.core.seed import seed_everything
from dissc_tpu.train.checkpoints import (
    load_checkpoint,
    save_checkpoint,
    scan_checkpoint,
)
from dissc_tpu.train.logging import MetricLogger, init_loggers, log_metrics
from dissc_tpu.utils.cache import enable_compilation_cache
from dissc_tpu.utils.profiling import RTFMeter, trace_if_enabled
