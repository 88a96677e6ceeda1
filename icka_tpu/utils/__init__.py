from icka_tpu.utils.metric_logger import SmoothedValue, MetricLogger
from icka_tpu.utils.misc import set_seed, mkdir

__all__ = ["SmoothedValue", "MetricLogger", "set_seed", "mkdir"]
