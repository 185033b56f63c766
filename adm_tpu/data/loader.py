"""Infinite shuffled batch iterator (host side).

Replaces the reference's DataLoader+cycle (train_uncond_dpm.py:87,167).
Per-process sharding for multi-host runs: pass process_index/process_count —
each host iterates a disjoint shard and builds its slice of the global batch
(jax.make_array_from_process_local_data upstream).
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
    process_index: int = 0,
    process_count: int = 1,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    n = len(dataset)
    idx_all = np.arange(n)[process_index::process_count]
    rng = np.random.RandomState(seed + process_index)
    local_bs = batch_size // process_count
    assert local_bs > 0, "batch_size must be >= process_count"
    while True:
        order = rng.permutation(idx_all) if shuffle else idx_all
        for start in range(0, len(order) - (local_bs - 1 if drop_last else 0), local_bs):
            sel = order[start : start + local_bs]
            if drop_last and len(sel) < local_bs:
                break
            items = [dataset[int(i)] for i in sel]
            yield {
                k: np.stack([it[k] for it in items]).astype(np.float32)
                if np.asarray(items[0][k]).dtype != np.int32
                else np.stack([it[k] for it in items])
                for k in items[0]
            }
