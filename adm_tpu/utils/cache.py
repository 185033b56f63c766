"""Persistent XLA compilation cache.

Verified working through the axon remote-compile backend: a 126 s compile
replays in ~1.4 s from a fresh process. Enabled by every CLI and bench —
full-model train-step compiles on the tunneled chip otherwise cost
5-15 minutes each.

The default cache dir lives INSIDE the repo (results/xla_cache) and is
git-committed by the supervision loops: a VM restore re-materialises the
repo from git, so committed cache entries survive while anything under
~/.cache is wiped. That wipe is exactly what turned the round-4 driver
bench into a cold 15-35 min compile and an rc=124 timeout (BENCH_r04).
Cache files are content-addressed by key, so re-commits of unchanged
programs cost git nothing.
"""

from __future__ import annotations

import os
from pathlib import Path

REPO_CACHE = Path(__file__).resolve().parents[2] / "results" / "xla_cache"


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("ADM_TPU_COMPILE_CACHE", str(REPO_CACHE))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
