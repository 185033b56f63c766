"""Encoder-propagation sampling: quality cost on a TRAINED tiny model (CPU).

Trains the twin-harness tiny flagship (16x16, 2-level EDMPrecond, const2,
tools/twin_train.py config — JAX side only, native init) on procedural
shapes, then samples the EMA from IDENTICAL init noise with
encoder_reuse in {1, 2, 5, 10} and scores proxy-FID ('192' features,
same routing as the long run) against a train-disjoint reference set
with noise/held-out anchors. k=1 is the exact reference sampler, so the
table reads as "quality cost of reusing the encoder" on the calibrated
anchor scale — the CPU counterpart of tools/sample_reuse_probe.py
(which measures the on-chip speedup at a real milestone).

The trained-tiny-model + anchor-scorer scaffold is shared with
tools/heun_quality_cpu.py (the order=2 sampler study) via
build_and_train / make_scorer.

Usage: python tools/reuse_quality_cpu.py [steps=1000]
Writes results/twin/reuse_quality.json + grids.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import jax
import jax.numpy as jnp
import numpy as np

import twin_train as tw

N_SAMPLE = 256
N_REF = 2048
SCORE_BS = 64
BATCH = 16


def build_and_train(steps: int):
    """Train the twin-config tiny flagship on procedural shapes (CPU).

    The trained EMA is cached under results/twin/ so the studies sharing
    this scaffold (this one and tools/heun_quality_cpu.py) pay the
    ~28-min CPU training once, not per run. Returns
    (model, state, data, train_wall_s) — train_wall_s is 0.0 on a cache
    hit."""
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.data.synthetic import ShapesDataset
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step

    net = EDMPrecond(
        img_resolution=tw.RES, img_channels=3, sigma_data=1.0,
        variant="const", n_decoders=2,
        model_kwargs=dict(
            model_channels=32, channel_mult=(1, 2), channel_mult_emb=2,
            num_blocks=1, attn_resolutions=(8,), dropout=0.0,
        ),
    )
    model = DDPM(
        net=net, process_name="const2", image_size=(tw.RES, tw.RES),
        channels=3, weighting_loss=True, eps=1e-4,
    )
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(
        tw.LR, total_steps=steps, warmup_steps=tw.WARMUP, min_lr=tw.MIN_LR,
        weight_decay=tw.WD,
    )
    state = TrainState.create(params, optimizer.init(params))
    data = ShapesDataset(image_size=(tw.RES, tw.RES))

    cache_f = REPO / "results/twin" / f"tinyflagship_ema_{steps}.npz"
    leaves, treedef = jax.tree_util.tree_flatten(state.ema_params)
    if cache_f.exists():
        z = np.load(cache_f)
        cached = [z[f"l{i}"] for i in range(int(z["n_leaves"]))]
        if len(cached) == len(leaves) and all(
            c.shape == tuple(l.shape) for c, l in zip(cached, leaves)
        ):
            ema = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(c) for c in cached]
            )
            print(f"[tinytrain] reusing cached EMA {cache_f}", flush=True)
            return model, state.replace(ema_params=ema), data, 0.0
        print(f"[tinytrain] cache {cache_f} shape-mismatched; retraining",
              flush=True)

    ema_cfg = EmaConfig(beta=tw.EMA_BETA, update_after_step=tw.EMA_AFTER,
                        update_every=tw.EMA_EVERY)
    step_fn = jax.jit(make_train_step(model, optimizer, ema_cfg))

    key = jax.random.PRNGKey(11)
    t0 = time.time()
    for it in range(steps):
        imgs = np.stack([data[it * BATCH + i]["image"] for i in range(BATCH)])
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, {"image": jnp.asarray(imgs)}, sub)
        if (it + 1) % 200 == 0:
            print(f"[tinytrain] step {it + 1}/{steps} "
                  f"loss={float(metrics['loss']):.2f} "
                  f"({(time.time() - t0) / (it + 1):.2f} s/step)", flush=True)
    cache_f.parent.mkdir(parents=True, exist_ok=True)
    trained = jax.tree_util.tree_leaves(state.ema_params)
    np.savez(cache_f, n_leaves=len(trained),
             **{f"l{i}": np.asarray(l) for i, l in enumerate(trained)})
    return model, state, data, round(time.time() - t0, 1)


def to_u8(img01):
    return (img01 * 255).clip(0, 255).astype(np.uint8)


def make_scorer(data):
    """Proxy-FID scorer on the calibrated anchor scale (same '192'
    routing as the long run). Returns (score, anchors) where
    score(u8_images) -> float and anchors = {heldout, noise}."""
    from adm_tpu.metrics.fid import compute_fid
    from adm_tpu.metrics.metric import (
        extract_features,
        fid_feature_key,
        load_inception_params,
    )

    inc = load_inception_params("random")
    feat = fid_feature_key("random")

    ref_u8 = to_u8(np.stack(
        [(data[500_000 + i]["image"] + 1) / 2 for i in range(N_REF)]
    ))
    ref_feats = jnp.asarray(
        extract_features(ref_u8, inc, (feat,), SCORE_BS)[feat]
    )

    def score(u8):
        f = extract_features(u8, inc, (feat,), SCORE_BS)[feat]
        return float(compute_fid(jnp.asarray(f), ref_feats))

    held_u8 = to_u8(np.stack(
        [(data[700_000 + i]["image"] + 1) / 2 for i in range(N_SAMPLE)]
    ))
    noise_u8 = np.random.RandomState(3).randint(
        0, 256, held_u8.shape, dtype=np.uint8
    )
    anchors = {
        "anchor_heldout": round(score(held_u8), 4),
        "anchor_noise": round(score(noise_u8), 4),
        "feature": feat,
    }
    return score, anchors


def shared_init_noise():
    """The framework-neutral Philox stream used by every sampler study."""
    return jnp.asarray(np.random.Generator(np.random.Philox(99))
                       .standard_normal(
                           (N_SAMPLE, tw.RES, tw.RES, 3), dtype=np.float32))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = Path("results/twin")
    out.mkdir(parents=True, exist_ok=True)
    from adm_tpu.utils.image import save_image_grid

    model, state, data, train_wall = build_and_train(steps)
    score, anchors = make_scorer(data)
    report = {
        "config": dict(steps=steps, batch=BATCH, res=tw.RES,
                       n_sample=N_SAMPLE, n_ref=N_REF,
                       feature=anchors["feature"]),
        "train_wall_s": train_wall,
        "anchor_heldout": anchors["anchor_heldout"],
        "anchor_noise": anchors["anchor_noise"],
        "variants": {},
    }
    init_noise = shared_init_noise()
    base_img = None
    for k in (1, 2, 5, 10):
        t1 = time.time()
        img = np.asarray(model.sample(
            state.ema_params, jax.random.PRNGKey(0), batch_size=N_SAMPLE,
            unnormalize=True, init_noise=init_noise, encoder_reuse=k,
        ))
        wall = time.time() - t1
        if base_img is None:
            base_img = img
        report["variants"][f"reuse{k}"] = {
            "proxy_fid": round(score(to_u8(img)), 4),
            "pix_diff_vs_exact": round(
                float(np.mean(np.abs(img - base_img))), 5
            ),
            "cpu_wall_s": round(wall, 1),
        }
        save_image_grid(np.clip(img[:16], 0, 1),
                        str(out / f"reuseq-k{k}.png"), nrow=4)
        print(f"[reuseq] k={k}: {report['variants'][f'reuse{k}']}",
              flush=True)
        (out / "reuse_quality.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
