"""Long-run 'does it learn' harness (VERDICT round-1 item 10, round-2 item 1).

Trains the FULL cifar flagship (192ch two-decoder EDMPrecond, const
process, weighting_loss, dropout 0.1, EMA) for many thousand steps on
the procedural ShapesDataset (no real data is mounted in this environment;
shapes are a distribution whose learning is visible in samples), writing:

  results/long_run/training_log.csv     loss curve
  results/long_run/samples-*.png        milestone EMA sample grids
  results/long_run/quality_trend.json   milestone -> proxy-FID trend
  results/long_run/summary.json         first/last loss, throughput
  results/long_run/heartbeat            liveness marker (tools/watchdog.py)
  results/long_run/run.pid              REAL python pid (not the setsid parent)

Proxy-FID (VERDICT r2 item 1a): Fréchet distance over a FIXED random-init
InceptionV3's pool features — a valid RELATIVE quality metric across
milestones of the same run; becomes a real FID the moment
ADM_TPU_INCEPTION_WEIGHTS points at the 2015-12-05 weights. Reference
protocol: 50k samples vs train set, 10 steps, EMA weights
(train_uncond_dpm.py:363-365, configs/cifar10/...yaml:67-74) — the milestone
trend uses ADM_TPU_PROXY_FID_N samples (default 2048) for cadence; run
tools/eval_fid.py for the protocol-scale 50k pass.

Run:  python tools/train_long.py [steps] [resume_milestone]
(resume_milestone N restores results/long_run/model-N and continues to
`steps` — exercises the production checkpoint-resume path on-chip)

Unattended operation: `python tools/watchdog.py <steps>` wraps this script
with stall detection + auto-resume.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PROXY_FID_N = int(os.environ.get("ADM_TPU_PROXY_FID_N", "2048"))
SAMPLE_BS = 128


def _ref_features(out: Path, data, inc_params, feat: str):
    """Fixed reference-set inception features, computed once and cached."""
    from adm_tpu.metrics.metric import extract_features

    cache = out / f"ref_feats_{feat}_{PROXY_FID_N}.npy"
    if cache.exists():
        return np.load(cache)
    imgs = np.stack([
        ((data[i]["image"] + 1) * 127.5).clip(0, 255).astype(np.uint8)
        for i in range(PROXY_FID_N)
    ])
    feats = extract_features(imgs, inc_params, (feat,), batch_size=SAMPLE_BS)
    np.save(cache, feats[feat])
    return feats[feat]


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    resume = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.data import ShapesDataset, batch_iterator
    from adm_tpu.train.state import EmaConfig
    from adm_tpu.train.trainer import Trainer
    from adm_tpu.utils.image import save_image_grid

    out = Path("results/long_run")
    out.mkdir(parents=True, exist_ok=True)
    (out / "run.pid").write_text(str(os.getpid()))

    net, res = _flagship()
    model = DDPM(
        net=net, process_name="const", image_size=(res, res), channels=3,
        weighting_loss=True, sampling_timesteps=10,
    )
    data = ShapesDataset(image_size=(res, res))
    it = batch_iterator(data, batch_size=128, seed=0)

    # ---- proxy-FID scoring (fails soft: the run must never die from eval)
    proxy_state = {}

    def _proxy_fid(trainer) -> float | None:
        try:
            from adm_tpu.metrics.fid import compute_fid
            from adm_tpu.metrics.metric import (
                extract_features,
                fid_feature_key,
                load_inception_params,
            )

            if "inc" not in proxy_state:
                wp = os.environ.get("ADM_TPU_INCEPTION_WEIGHTS", "random")
                proxy_state["inc"] = load_inception_params(wp)
                # '192' in proxy mode: deep random features collapse
                # (metric.fid_feature_key)
                proxy_state["feat"] = fid_feature_key(wp)
                proxy_state["ref"] = _ref_features(
                    out, data, proxy_state["inc"], proxy_state["feat"]
                )
                proxy_state["sampler"] = jax.jit(
                    lambda p, k: model.sample(
                        p, k, batch_size=SAMPLE_BS, unnormalize=True
                    )
                )
            frames = []
            for i in range(PROXY_FID_N // SAMPLE_BS):
                imgs = proxy_state["sampler"](
                    trainer.state.ema_params, jax.random.PRNGKey(1000 + i)
                )
                frames.append(
                    (np.asarray(imgs) * 255).clip(0, 255).astype(np.uint8)
                )
            feat = proxy_state["feat"]
            feats = extract_features(
                np.concatenate(frames), proxy_state["inc"], (feat,),
                batch_size=SAMPLE_BS,
            )
            return float(compute_fid(
                jnp.asarray(feats[feat]), jnp.asarray(proxy_state["ref"])
            ))
        except Exception as e:  # noqa: BLE001 — eval must not kill training
            print(f"[long_run] proxy-FID failed: {e}", flush=True)
            return None

    trend_path = out / "quality_trend.json"
    trend = json.loads(trend_path.read_text()) if trend_path.exists() else []

    def write_summary(trainer, t_launch, start_step, *, live: bool):
        """Rewrite summary.json NOW (VERDICT r3 weak #6: the old end-of-run
        write left it 14k steps stale whenever the watchdog relaunched)."""
        try:
            rows = [
                line.split(",")
                for line in (out / "training_log.csv")
                .read_text().strip().splitlines()[1:]
            ]
            losses = [float(r[1]) for r in rows]
            cur = int(rows[-1][0]) if rows else start_step
            dt = time.time() - t_launch
            summary = {
                "steps": cur,
                "live": live,
                "resumed_from_step": start_step,
                "wall_seconds": round(dt, 1),
                "imgs_per_sec": round((cur - start_step) * 128 / max(dt, 1e-9), 1),
                # steady_imgs_per_sec: compile + milestone time excluded
                **getattr(trainer, "last_run_stats", {}),
                "first_logged_loss": losses[0] if losses else None,
                "last_logged_loss": losses[-1] if losses else None,
                "min_loss": min(losses) if losses else None,
                "loss_drop_ratio": round(
                    losses[-1] / max(losses[0], 1e-9), 4
                ) if losses else None,
                "proxy_fid_trend": trend[-5:],
            }
            (out / "summary.json").write_text(json.dumps(summary, indent=1))
            return summary
        except Exception as e:  # noqa: BLE001 — bookkeeping never kills a run
            print(f"[long_run] summary write failed: {e}", flush=True)
            return None

    run_clock = {"t0": time.time(), "start": 0}

    def sample_fn(trainer, milestone):
        imgs = np.asarray(
            trainer._sample(trainer.state.ema_params, jax.random.PRNGKey(42))
        )
        path = str(out / f"samples-{milestone}.png")
        save_image_grid(np.clip(imgs, 0, 1), path, nrow=4)
        print(f"[long_run] wrote {path}", flush=True)
        if isinstance(milestone, int) and milestone > 0:
            fid = _proxy_fid(trainer)
            if fid is not None:
                trend.append({
                    "milestone": milestone,
                    "step": int(milestone) * trainer.save_and_sample_every,
                    "proxy_fid": round(fid, 4),
                })
                trend_path.write_text(json.dumps(trend, indent=1))
                print(f"[long_run] milestone {milestone} proxy_fid={fid:.3f}",
                      flush=True)
        # retention: keep the 2 newest orbax milestones (3 GB each)
        import re
        import shutil

        dirs = sorted(
            (d for d in out.iterdir()
             if d.is_dir() and re.fullmatch(r"model-\d+", d.name)),
            key=lambda d: int(d.name.split("-")[1]),
        )
        for d in dirs[:-2]:
            shutil.rmtree(d, ignore_errors=True)
        write_summary(trainer, run_clock["t0"], run_clock["start"], live=True)

    # FIXED schedule horizon, independent of this segment's `steps` target:
    # otherwise every resumed extension re-stretches the poly decay and the
    # lr jumps back up mid-run (observed at the 24k->48k resume)
    sched_total = int(os.environ.get("ADM_TPU_SCHED_TOTAL", "100000"))
    trainer = Trainer(
        model,
        it,
        train_num_steps=sched_total,
        train_lr=1e-4,
        warmup_steps=500,
        gradient_accumulate_every=1,
        save_and_sample_every=2000,
        # orbax writes are D2H-tunnel-bound (~160 s each, 85% of milestone
        # overhead); every 2nd milestone recovers ~11% sustained throughput
        # for up to 4000 steps of resume granularity on a stall
        ckpt_every_milestones=int(os.environ.get("ADM_TPU_CKPT_EVERY_MS", "2")),
        log_freq=200,
        results_folder=str(out),
        ema_cfg=EmaConfig(update_after_step=1000, update_every=8),
        sample_batch_size=16,
        resume_milestone=resume,
    )
    # actual restored step (ADVICE r2: don't hardcode milestone spacing)
    start_step = int(trainer.state.step)
    # warm-up eval at the current state: compiles the sampler + inception
    # programs UP FRONT (inside the watchdog's launch grace window, so
    # in-train milestones never block the heartbeat on a cold compile) and
    # records a baseline trend point for this launch. NO heartbeat is
    # written until warmup completes: the first heartbeat of a launch ends
    # the watchdog's grace window, and a cold compile after that would be
    # judged by the (shorter) steady timeout -> kill-loop on a healthy run.
    _ = np.asarray(
        trainer._sample(trainer.state.ema_params, jax.random.PRNGKey(42))
    )  # warm the b16 milestone-grid sampler inside the grace window too
    fid0 = _proxy_fid(trainer)
    if fid0 is not None:
        trend.append({"milestone": f"launch@{start_step}",
                      "step": start_step, "proxy_fid": round(fid0, 4)})
        trend_path.write_text(json.dumps(trend, indent=1))
        print(f"[long_run] launch step {start_step} proxy_fid={fid0:.3f}",
              flush=True)
    run_clock["t0"] = time.time()
    run_clock["start"] = start_step
    if not resume:
        sample_fn(trainer, 0)  # pre-training grid: pure noise baseline
    trainer.train(num_steps=steps, sample_fn=sample_fn)
    summary = write_summary(trainer, run_clock["t0"], start_step, live=False)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
