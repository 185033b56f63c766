"""Infinite shuffled batch iterator (host side) with threaded decode and
background prefetch.

Replaces the reference's DataLoader(num_workers=N)+cycle
(train_uncond_dpm.py:87,167; workers at train_uncond_dpm.py:87). The
reference parallelizes with fork-based worker processes; here decode
parallelism uses a thread pool (PIL/numpy release the GIL during JPEG/PNG
decode and resize — threads avoid fork+pickle costs and play nice with a
live TPU client), and `prefetch_iterator` overlaps the NEXT batch's host
work with the current device step.

Per-process sharding for multi-host runs: pass process_index/process_count —
each host iterates a disjoint shard and builds its slice of the global batch
(jax.make_array_from_process_local_data upstream).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def _collate(items) -> Dict[str, np.ndarray]:
    """Stack numeric fields; keep string/object fields (img_name, ori_size
    tuples from the test datasets) as plain lists — the torch default_collate
    behavior. shard_batch drops non-array leaves before the jitted step."""
    out = {}
    for k in items[0]:
        first = np.asarray(items[0][k])
        if first.dtype.kind in ("U", "S", "O"):
            out[k] = [it[k] for it in items]
        elif first.dtype == np.int32:
            out[k] = np.stack([it[k] for it in items])
        else:
            out[k] = np.stack([it[k] for it in items]).astype(np.float32)
    return out


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
    process_index: int = 0,
    process_count: int = 1,
    drop_last: bool = True,
    num_workers: int = 0,
    loop: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """loop=True (training) cycles shuffled epochs forever; loop=False
    yields ONE pass and stops (eval CLIs)."""
    n = len(dataset)
    idx_all = np.arange(n)[process_index::process_count]
    rng = np.random.RandomState(seed + process_index)
    local_bs = batch_size // process_count
    assert local_bs > 0, "batch_size must be >= process_count"
    if drop_last and len(idx_all) < local_bs:
        # without this guard the while-True loop below would re-permute
        # forever and never yield — a silent hang instead of an error
        raise ValueError(
            f"per-process shard has {len(idx_all)} samples < local batch "
            f"{local_bs} (dataset {n}, processes {process_count}); shrink "
            "batch_size or use drop_last=False"
        )
    pool = ThreadPoolExecutor(num_workers) if num_workers > 0 else None

    def load(sel):
        if pool is not None:
            return list(pool.map(lambda i: dataset[int(i)], sel))
        return [dataset[int(i)] for i in sel]

    # finally: shut the pool down when the iterator is exhausted (loop=False
    # eval CLIs) or garbage-collected mid-epoch — otherwise every call leaks
    # `num_workers` threads for the process lifetime
    try:
        while True:
            order = rng.permutation(idx_all) if shuffle else idx_all
            for start in range(0, len(order) - (local_bs - 1 if drop_last else 0), local_bs):
                sel = order[start : start + local_bs]
                if drop_last and len(sel) < local_bs:
                    break
                yield _collate(load(sel))
            if not loop:
                return
    finally:
        if pool is not None:
            pool.shutdown(wait=False)


def prefetch_iterator(it: Iterator, depth: int = 2) -> Iterator:
    """Run `it` in a daemon thread, keeping up to `depth` items ready.

    Host-side analogue of the reference DataLoader's worker prefetch: the
    next batch's disk reads/decodes overlap the current device step.
    Exceptions in the producer re-raise at the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END, _ERR = object(), object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            q.put((_ERR, e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
