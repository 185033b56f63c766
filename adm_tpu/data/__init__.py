from adm_tpu.data.cifar10 import CIFAR10
from adm_tpu.data.synthetic import SyntheticImages
from adm_tpu.data.loader import batch_iterator

__all__ = ["CIFAR10", "SyntheticImages", "batch_iterator"]
