"""Quality-axis twin: does the REFERENCE show the same sample-quality
trajectory as adm_tpu at matched steps? (VERDICT r3 items 1+3 follow-up.)

The flagship long run's proxy-FID has plateaued ~0.13-0.14 on the
[heldout ~0, noise 0.835] anchor scale with noise-dominated grids at ~58k
steps. tools/twin_train.py proves the training LOOPS match step-for-step
(loss 1.7e-4 rel over 200 steps); this harness extends the twin to the
QUALITY axis the acceptance gate actually measures:

  * train both frameworks lockstep on the same shapes stream (identical
    converted init, one shared Philox (t, noise) stream — exactly
    tools/twin_train.py's protocol, same reference call sites:
    train_uncond_dpm.py:251-310, ddm/ema.py:132-156);
  * at matched milestones, EMA-sample BOTH sides from IDENTICAL unit init
    noise (reference ddm/ddm_const_2.py sample() -> sample_fn_d:339-390,
    torch.randn injected; ours via sample(init_noise=...));
  * score BOTH sample sets with the same fixed random-init Inception '192'
    proxy-FID against the same shapes reference set, next to noise/heldout
    anchors at this resolution.

If the two proxy-FID trajectories track (and the grids look alike), the
long-run plateau is a property of the RECIPE at this scale — shared with
the reference — not an adm_tpu defect.

Run (CPU only): python tools/twin_quality.py [steps=2000] [--batch 16]
Writes results/twin/twin_quality.json + per-milestone grids.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "tests"))

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass

import jax.numpy as jnp
import numpy as np

import twin_train as tw

SCORE_BS = 64


def sample_torch_ema(dd, ema_net, unit_noise_nchw: np.ndarray) -> np.ndarray:
    """Reference EMA sampling: dd.sample() routed through the EMA net with
    the init draw injected (sample_fn_d's only randomness is one
    torch.randn, ddm/ddm_const_2.py:352)."""
    import torch

    prev_model, prev_training = dd.model, dd.model.training
    dd.model = ema_net.eval()
    orig_randn = torch.randn
    inj = torch.from_numpy(unit_noise_nchw)

    def _randn(*shape, **kw):
        assert tuple(shape[0] if isinstance(shape[0], (tuple, list))
                     else shape) == tuple(inj.shape), "unexpected randn shape"
        return inj.to(kw.get("dtype", torch.float32))

    torch.randn = _randn
    try:
        with torch.no_grad():
            img = dd.sample(batch_size=unit_noise_nchw.shape[0])
    finally:
        torch.randn = orig_randn
        dd.model = prev_model
        dd.model.train(prev_training)
    return np.asarray(img.to(torch.float32)).transpose(0, 2, 3, 1)  # NHWC [0,1]


def run_quality(steps: int = 2000, batch: int = 16,
                out_dir: str = "results/twin", n_sample: int = 256,
                n_ref: int = 2048, log=print) -> dict:
    N_SAMPLE, N_REF = n_sample, n_ref
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # LR horizon = run length on both sides (the reference always sets
    # sched_total = train_num_steps; beyond it the poly lambda is undefined)
    tw.SCHED_TOTAL = steps

    import torch

    from adm_tpu.data.synthetic import ShapesDataset
    from adm_tpu.metrics.fid import compute_fid
    from adm_tpu.metrics.metric import (
        extract_features,
        fid_feature_key,
        load_inception_params,
    )
    from adm_tpu.utils.image import save_image_grid

    dd, tnet, topt, tsched, tema = tw.build_torch_side(steps)
    model, state, jstep, schedule = tw.build_jax_side(tnet)

    data = ShapesDataset(image_size=(tw.RES, tw.RES))
    stream = np.random.Generator(np.random.Philox(1234))
    sample_stream = np.random.Generator(np.random.Philox(99))  # disjoint
    eps = 1e-4
    key = jax.random.PRNGKey(7)

    # ---- proxy-FID scaffolding (same '192' routing as the long run) ----
    inc = load_inception_params("random")
    feat = fid_feature_key("random")

    def score(u8: np.ndarray, ref) -> float:
        f = extract_features(u8, inc, (feat,), SCORE_BS)[feat]
        return float(compute_fid(jnp.asarray(f), ref))

    def to_u8(img01: np.ndarray) -> np.ndarray:
        return (img01 * 255).clip(0, 255).astype(np.uint8)

    # reference set + anchors (train-stream-disjoint index ranges)
    ref_u8 = to_u8(np.stack(
        [(data[500_000 + i]["image"] + 1) / 2 for i in range(N_REF)]
    ))
    ref_feats = jnp.asarray(
        extract_features(ref_u8, inc, (feat,), SCORE_BS)[feat]
    )
    held_u8 = to_u8(np.stack(
        [(data[700_000 + i]["image"] + 1) / 2 for i in range(N_SAMPLE)]
    ))
    noise_u8 = np.random.RandomState(3).randint(
        0, 256, held_u8.shape, dtype=np.uint8
    )
    report = {
        "config": dict(steps=steps, batch=batch, res=tw.RES,
                       n_sample=N_SAMPLE, n_ref=N_REF, feature=feat),
        "anchor_heldout": round(score(held_u8, ref_feats), 4),
        "anchor_noise": round(score(noise_u8, ref_feats), 4),
        "milestones": [],
    }
    log(f"[twinq] anchors: heldout={report['anchor_heldout']} "
        f"noise={report['anchor_noise']}")

    milestones = sorted({steps // 8, steps // 4, steps // 2,
                         3 * steps // 4, steps})

    def evaluate(step_no: int):
        noise = sample_stream.standard_normal(
            (N_SAMPLE, 3, tw.RES, tw.RES), dtype=np.float32
        )
        img_t = sample_torch_ema(dd, tema.ema_model, noise)
        img_j = np.asarray(model.sample(
            state.ema_params, jax.random.PRNGKey(0),
            batch_size=N_SAMPLE, unnormalize=True,
            init_noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
        ))
        row = {
            "step": step_no,
            "proxy_fid_torch": round(score(to_u8(img_t), ref_feats), 4),
            "proxy_fid_jax": round(score(to_u8(img_j), ref_feats), 4),
            "sample_mean_abs_diff": round(
                float(np.mean(np.abs(img_t - img_j))), 6
            ),
        }
        report["milestones"].append(row)
        grid = np.concatenate([img_t[:8], img_j[:8]])  # top torch, bottom jax
        save_image_grid(np.clip(grid, 0, 1),
                        str(out / f"twinq-{step_no}.png"), nrow=8)
        (out / "twin_quality.json").write_text(json.dumps(report, indent=1))
        log(f"[twinq] step {step_no}: torch={row['proxy_fid_torch']} "
            f"jax={row['proxy_fid_jax']} "
            f"pix_diff={row['sample_mean_abs_diff']}")

    t0 = time.time()
    for it in range(steps):
        imgs = np.stack(
            [data[it * batch + i]["image"] for i in range(batch)]
        )
        t_np = stream.random(batch, dtype=np.float32) * (1 - eps) + eps
        noise_np = stream.standard_normal(
            (batch, 3, tw.RES, tw.RES), dtype=np.float32
        )

        xt = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        orig_randn_like = torch.randn_like
        torch.randn_like = lambda x, **kw: torch.from_numpy(noise_np)
        try:
            tloss, _ = dd.p_losses(xt, torch.from_numpy(t_np))
        finally:
            torch.randn_like = orig_randn_like
        tloss.backward()
        torch.nn.utils.clip_grad_norm_(
            filter(lambda p: p.requires_grad, tnet.parameters()), 1.0
        )
        topt.step()
        topt.zero_grad()
        tsched.step()
        tema.update()

        state, metrics = jstep(
            state, {"image": jnp.asarray(imgs)}, key,
            jnp.asarray(t_np), jnp.asarray(noise_np.transpose(0, 2, 3, 1)),
        )

        if (it + 1) % 100 == 0:
            lt, lj = float(tloss), float(metrics["loss"])
            log(f"[twinq] step {it + 1}/{steps} loss t={lt:.2f} "
                f"j={lj:.2f} rel={abs(lj - lt) / max(abs(lt), 1e-12):.2e} "
                f"({(time.time() - t0) / (it + 1):.2f} s/step)")
        if (it + 1) in milestones:
            evaluate(it + 1)

    report["wall_seconds"] = round(time.time() - t0, 1)
    trj = [m["proxy_fid_torch"] for m in report["milestones"]]
    jrj = [m["proxy_fid_jax"] for m in report["milestones"]]
    span = report["anchor_noise"] - report["anchor_heldout"]
    report["max_traj_gap_frac_of_anchor_span"] = round(
        max(abs(a - b) for a, b in zip(trj, jrj)) / span, 4
    )
    (out / "twin_quality.json").write_text(json.dumps(report, indent=1))
    log(json.dumps({k: report[k] for k in (
        "anchor_heldout", "anchor_noise",
        "max_traj_gap_frac_of_anchor_span", "wall_seconds")},))
    log(f"[twinq] report -> {out / 'twin_quality.json'}")
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", type=int, nargs="?", default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="results/twin")
    ap.add_argument("--n-sample", type=int, default=256)
    ap.add_argument("--n-ref", type=int, default=2048)
    a = ap.parse_args()
    run_quality(a.steps, a.batch, a.out, a.n_sample, a.n_ref)


if __name__ == "__main__":
    main()
