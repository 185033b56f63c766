"""Evaluate the quality-trend acceptance gate (BASELINE.md, VERDICT r3
item 3c): at the end of the 100k-step flagship run, state pass/fail on the
calibrated anchor scale and record the supporting evidence.

Gate: proxy-FID <= 0.05 (<= 6% of the anchor range above the held-out
floor) with visibly crisp shape grids by step 100k. Inputs: the newest
protocol-scale pass (results/long_run/fid_eval.json), the milestone trend
(quality_trend.json), the anchors (anchors.json), and the sampler
discretization bound (sample_steps_probe.json).

Usage: python tools/gate_verdict.py   (no chip needed — reads JSONs)
Writes results/long_run/gate_verdict.json and prints it.
"""

from __future__ import annotations

import json
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "results/long_run"
GATE = 0.05


def main():
    def load(name, default=None):
        p = OUT / name
        return json.loads(p.read_text()) if p.exists() else default

    trend = load("quality_trend.json", [])
    anchors = load("anchors.json", {})
    fid_eval = load("fid_eval.json", {})
    probe = load("sample_steps_probe.json", {})

    last = trend[-1] if trend else {}
    best = min((m for m in trend if "proxy_fid" in m),
               key=lambda m: m["proxy_fid"], default={})
    protocol = fid_eval.get("proxy_fid", fid_eval.get("fid"))
    # a protocol pass only speaks for the gate if it was computed AT the
    # trend's final step — an fid_eval.json left over from an earlier
    # milestone (e.g. the mid-round queue pass) must not be judged as if
    # it were the end-of-run number (code-review r4 finding). The step is
    # taken from the eval itself, else from the trend row sharing its
    # milestone (eval_fid writes step=null when the device read fails —
    # the documented tunnel RPC-drop mode; no hardcoded milestone
    # spacing). Unresolvable => conservatively stale, judge the trend.
    protocol_step = fid_eval.get("step")
    if protocol_step is None and fid_eval.get("milestone") is not None:
        protocol_step = next(
            (m.get("step") for m in trend
             if m.get("milestone") == fid_eval["milestone"]), None,
        )
    protocol_stale = bool(
        protocol is not None
        and (protocol_step is None or protocol_step != last.get("step"))
    )
    final = (protocol if protocol is not None and not protocol_stale
             else last.get("proxy_fid"))

    noise = anchors.get("noise_anchor", anchors.get("anchor_noise"))
    heldout = anchors.get("heldout_anchor", anchors.get("anchor_heldout"))
    span = (noise - heldout) if (noise is not None and heldout is not None) \
        else None

    verdict = {
        "gate": GATE,
        "final_step": last.get("step"),
        "final_trend_proxy_fid": last.get("proxy_fid"),
        "best_trend": best,
        "protocol_pass_proxy_fid": protocol,
        "protocol_pass_step": protocol_step if protocol is not None else None,
        "protocol_pass_stale": protocol_stale,
        "value_judged": final,
        "anchor_noise": noise,
        "anchor_heldout": heldout,
        "frac_of_anchor_span": (round((final - (heldout or 0.0)) / span, 4)
                                if (final is not None and span) else None),
        "discretization_bound_det10_minus_det25": (
            round(probe["det10"]["proxy_fid"] - probe["det25"]["proxy_fid"], 4)
            if probe.get("det10") and probe.get("det25") else None
        ),
        # the matched-NFE sampler upgrade (order=2 at det10's budget):
        # how much of the judged value the Heun sampler recovers for free
        "heun5_at_matched_nfe_proxy_fid": (
            probe["heun5"]["proxy_fid"] if probe.get("heun5") else None
        ),
        "passed": bool(final is not None and final <= GATE),
    }
    (OUT / "gate_verdict.json").write_text(json.dumps(verdict, indent=1))
    print(json.dumps(verdict, indent=1))


if __name__ == "__main__":
    main()
