from adm_tpu.train.state import TrainState, EmaConfig
from adm_tpu.train.lr import warmup_poly_schedule

__all__ = ["TrainState", "EmaConfig", "warmup_poly_schedule"]
