from adm_tpu.metrics.fid import compute_fid, feature_stats, frechet_distance
from adm_tpu.metrics.isc import inception_score
from adm_tpu.metrics.kid import kernel_inception_distance

__all__ = [
    "compute_fid",
    "feature_stats",
    "frechet_distance",
    "inception_score",
    "kernel_inception_distance",
]
