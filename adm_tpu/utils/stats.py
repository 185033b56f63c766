"""Training statistics: moment accumulation + windowed Collector.

Functional equivalent of NVIDIA torch_utils/training_stats.py:70-246: each
report accumulates [n, sum(x), sum(x^2)] per name; Collector materializes
windowed mean/std. Cross-device reduction happens automatically when the
reported values come out of the pjit step (metrics are already replicated
means); for per-shard values use `psum_moments` inside the step.
"""

from __future__ import annotations

import collections
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def moments(x: Array) -> Array:
    """[n, sum, sum of squares] of a tensor — jit-friendly report payload."""
    x = x.astype(jnp.float32).reshape(-1)
    return jnp.stack([jnp.float32(x.size), jnp.sum(x), jnp.sum(x * x)])


def psum_moments(x: Array, axis_name: str = "data") -> Array:
    """Cross-device reduced moments (replaces training_stats._sync allreduce,
    torch_utils/training_stats.py:248+)."""
    return jax.lax.psum(moments(x), axis_name)


class Collector:
    """Windowed mean/std per stat name (torch_utils/training_stats.py:127-246)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        import re

        self._regex = re.compile(regex)
        self._keep = keep_previous
        self._moments: Dict[str, np.ndarray] = collections.defaultdict(
            lambda: np.zeros(3, np.float64)
        )
        self._cumulative: Dict[str, np.ndarray] = collections.defaultdict(
            lambda: np.zeros(3, np.float64)
        )

    def report(self, name: str, value) -> None:
        if not self._regex.match(name):
            return
        value = np.asarray(jax.device_get(value), np.float64).reshape(-1)
        m = np.array([value.size, value.sum(), (value**2).sum()])
        self._cumulative[name] += m

    def report_moments(self, name: str, m) -> None:
        if self._regex.match(name):
            self._cumulative[name] += np.asarray(jax.device_get(m), np.float64)

    def update(self) -> None:
        """Snapshot the window: deltas since last update become current."""
        for name, cum in self._cumulative.items():
            prev = self._moments.get(f"_prev_{name}", np.zeros(3))
            delta = cum - prev
            if delta[0] > 0 or not self._keep:
                self._moments[name] = delta
            self._moments[f"_prev_{name}"] = cum.copy()

    def names(self):
        return [n for n in self._moments if not n.startswith("_prev_")]

    def mean(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] < 2:
            return float("nan")
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean**2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            n: {"mean": self.mean(n), "std": self.std(n)} for n in self.names()
        }


def print_module_summary(params, max_rows: Optional[int] = 40) -> str:
    """Parameter table (torch_utils/misc.py:211+ equivalent)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rows = []
    total = 0
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        rows.append((name, tuple(leaf.shape), leaf.size))
        total += leaf.size
    rows.sort(key=lambda r: -r[2])
    lines = [f"{'name':<60} {'shape':<20} {'params':>12}"]
    for name, shape, size in rows[:max_rows]:
        lines.append(f"{name[:60]:<60} {str(shape):<20} {size:>12,}")
    if max_rows and len(rows) > max_rows:
        lines.append(f"... {len(rows) - max_rows} more rows")
    lines.append(f"{'TOTAL':<60} {'':<20} {total:>12,}")
    return "\n".join(lines)
