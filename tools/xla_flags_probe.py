"""A/B XLA compiler options on the flagship train step (VERDICT r4 #6).

Round 4 left scheduler/flag tuning unexplored. This probe compiles the
EXACT driver-bench train step (bench.build_programs) under a small set of
TPU compiler options (per-jit compiler_options, so the committed cache
and other programs are untouched) and measures the fenced steady-step
rate for each. Appends one JSON line per variant to PERF_r5.jsonl.

Run on a quiet chip (the launcher wraps quiet_chip):
  python tools/quiet_chip.py python tools/xla_flags_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

BATCH = 128
STEPS = 20

VARIANTS = [
    ("baseline", None),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": 32768}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": 65536}),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": False}),
    ("aggressive_fusion",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": True}),
]


def main() -> int:
    # Throwaway cache: per-option compiles are keyed by compile options, so
    # each variant would add a ~56 MB blob to the GIT-COMMITTED default
    # cache (results/xla_cache) that the supervision loops sweep in forever
    # (code-review r5). Probe artifacts don't need persistence.
    import os

    os.environ.setdefault("ADM_TPU_COMPILE_CACHE", "/tmp/xla_flags_probe_cache")

    import jax

    import bench

    out = REPO / "PERF_r5.jsonl"
    jitted, state, batch, key, _sample, n_chips = bench.build_programs()
    # re-derive the plain step_fn call with options via jit of the same fn
    # is not possible from the returned wrapper; instead recompile the
    # wrapped fn with options through .lower().compile(options).
    lowered = jitted.lower(state, batch, key)

    results = []
    # the step donates its state input, so ONE state threads through every
    # variant (each call consumes the previous call's output — never reuse
    # the original `state` binding after the first execution)
    st = state
    st_valid = True
    for name, opts in VARIANTS:
        row = {"probe": "xla_flags", "variant": name, "options": opts,
               "batch": BATCH, "steps": STEPS}
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(
                compiler_options=opts) if opts else lowered.compile()
            row["compile_secs"] = round(time.perf_counter() - t0, 1)
            if not st_valid:
                raise RuntimeError(
                    "state buffers were donated into a failed earlier "
                    "variant — cannot execute (compile time recorded)")
            st_valid = False        # donated the moment we call
            st, m = compiled(st, batch, key)   # warmup/execute once
            _ = float(m["loss"])
            t0 = time.perf_counter()
            for _i in range(STEPS):
                st, m = compiled(st, batch, key)
            _ = float(m["loss"])               # fence (axon: host transfer)
            dt = time.perf_counter() - t0
            row["imgs_per_sec"] = round(BATCH * STEPS / dt, 2)
            row["step_ms"] = round(dt / STEPS * 1e3, 2)
            st_valid = True                    # loop completed; st is live
        except Exception as e:  # noqa: BLE001 — record and continue
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(row), flush=True)
        results.append(row)
        with out.open("a") as f:
            f.write(json.dumps(row) + "\n")
    ok = [r for r in results if "imgs_per_sec" in r]
    if ok:
        best = max(ok, key=lambda r: r["imgs_per_sec"])
        print(f"# best: {best['variant']} {best['imgs_per_sec']} img/s",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
