"""Evaluate the quality-trend acceptance gate (BASELINE.md "Acceptance
gate"): state pass/fail on the calibrated anchor scale and record the
supporting evidence.

Gate (recalibrated round 5, VERDICT r4 weak #2 + next #3): the original
bar (0.05 absolute proxy-FID ~ 6% of span) failed the REFERENCE's own
converged trajectory — the lockstep twin run of the reference torch loop
plateaus at 0.0765 on anchors {0.0006, 0.4842} = 0.157 of ITS span at the
SAME 10-step sampler + '192' proxy metric (BASELINE.md twin-quality
table; tools/twin_quality.py, sampling_timesteps=10 like the flagship
protocol). A gate the reference cannot pass measures the metric's floor,
not the framework. Recalibrated bar, derived from measured floors:

    frac_of_anchor_span <= 0.157 (reference-converged floor, matched
                                  protocol)
                         + 0.020 (the twin harness's own pinned
                                  trajectory tolerance, 2% of span)
                         = 0.177

Inputs: the newest protocol-scale pass (results/long_run/fid_eval.json),
the milestone trend (quality_trend.json), the anchors (anchors.json), and
the sampler discretization bound (sample_steps_probe.json).

Usage: python tools/gate_verdict.py   (no chip needed — reads JSONs)
Writes results/long_run/gate_verdict.json and prints it.
"""

from __future__ import annotations

import json
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "results/long_run"
GATE_FRAC = 0.177          # of the anchor span; derivation in docstring
LEGACY_GATE_ABS = 0.05     # the round-3 bar, kept for the record


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

    # compare UNROUNDED (a 0.17703 must fail a 0.177 gate); round only
    # the recorded field
    frac_exact = ((final - (heldout or 0.0)) / span
                  if (final is not None and span) else None)
    frac = round(frac_exact, 4) if frac_exact is not None else None
    verdict = {
        "gate_frac_of_span": GATE_FRAC,
        "gate_derivation": (
            "reference-converged twin floor 0.157 of span at matched "
            "10-step protocol + 0.020 twin tolerance (BASELINE.md)"),
        "legacy_gate_abs": LEGACY_GATE_ABS,
        "final_step": last.get("step"),
        "final_trend_proxy_fid": last.get("proxy_fid"),
        "best_trend": best,
        "protocol_pass_proxy_fid": protocol,
        "protocol_pass_step": protocol_step if protocol is not None else None,
        "protocol_pass_stale": protocol_stale,
        "value_judged": final,
        "anchor_noise": noise,
        "anchor_heldout": heldout,
        "frac_of_anchor_span": frac,
        "discretization_bound_det10_minus_det25": (
            round(probe["det10"]["proxy_fid"] - probe["det25"]["proxy_fid"], 4)
            if probe.get("det10") and probe.get("det25") else None
        ),
        # the matched-NFE sampler upgrade (order=2 at det10's budget):
        # how much of the judged value the Heun sampler recovers for free
        "heun5_at_matched_nfe_proxy_fid": (
            probe["heun5"]["proxy_fid"] if probe.get("heun5") else None
        ),
        "passed": bool(frac_exact is not None and frac_exact <= GATE_FRAC),
        "passed_legacy_abs": bool(final is not None
                                  and final <= LEGACY_GATE_ABS),
    }
    (OUT / "gate_verdict.json").write_text(json.dumps(verdict, indent=1))
    print(json.dumps(verdict, indent=1))


if __name__ == "__main__":
    main()
