from icka_tpu.train.optimizer import make_optimizer, linear_warmup_schedule

__all__ = ["make_optimizer", "linear_warmup_schedule"]
