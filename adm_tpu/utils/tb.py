"""TensorBoard scalar logging — observability parity with the reference's
SummaryWriter usage (train_uncond_dpm.py:300-303, train_vae.py:287-297).

Soft dependency: uses torch.utils.tensorboard when importable (the
tensorboard package is host-side only), otherwise degrades to a no-op with
one warning. The CSV log (train/trainer.py) is always written regardless.
"""

from __future__ import annotations

import logging

log = logging.getLogger("adm_tpu")


class ScalarWriter:
    """add_scalar/flush/close subset of SummaryWriter; no-op if unavailable."""

    def __init__(self, logdir: str | None):
        self._w = None
        if not logdir:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir=logdir)
        except Exception as e:  # noqa: BLE001 - any import/env failure
            log.warning("tensorboard unavailable (%s); scalar logging off", e)

    def add_scalar(self, tag: str, value, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), int(step))

    def add_scalars(self, scalars: dict, step: int):
        for k, v in scalars.items():
            self.add_scalar(k, v, step)

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()
