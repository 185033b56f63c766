"""Shared CLI wiring for the four diffusion training entry points.

The reference duplicates ~350 lines per script (SURVEY.md section 2.5);
here each CLI is a thin flavor flag over one implementation.
"""

from __future__ import annotations

import dataclasses
import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

from adm_tpu.data.loader import batch_iterator, prefetch_iterator
from adm_tpu.train.state import EmaConfig
from adm_tpu.train.trainer import Trainer
from adm_tpu.utils.config import build_dataset, build_model, load_conf
from adm_tpu.utils.image import save_image_grid

log = logging.getLogger("adm_tpu")


def load_first_stage(cfg):
    """Build the frozen first-stage VAE and restore its params.

    `model.first_stage` section mirrors the reference's auto_encoder config
    (train_cond_ldm.py:42-47); the PL `target:/params:` form nests it as
    first_stage_config (normalize_model_cfg flattens both). Params restore
    from an adm_tpu VAE milestone (orbax) via first_stage.ckpt_path.
    """
    from adm_tpu.cli.train_vae import build_vae
    from adm_tpu.utils.config import normalize_model_cfg
    from adm_tpu.vae.autoencoder import FirstStage

    _, mcfg = normalize_model_cfg(cfg["model"])
    fs_cfg = mcfg["first_stage"]
    module = build_vae(fs_cfg)
    fs = FirstStage(module)
    h, w = mcfg["image_size"]
    fs_params = fs.init(
        jax.random.PRNGKey(0), (h, w), fs_cfg["ddconfig"]["in_channels"]
    )
    ckpt = fs_cfg.get("ckpt_path")
    if ckpt:
        import os

        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(ckpt))
        # accept either a raw VAEState dict or a params tree
        if isinstance(restored, dict) and "ae_params" in restored:
            fs_params = {"params": restored["ae_params"]["ae"]}
        else:
            fs_params = restored
        log.info("restored first stage from %s", ckpt)
    else:
        log.warning("first stage initialized RANDOMLY (no ckpt_path)")
    return fs, fs_params


def restore_train_state(model, ckpt_path=None, *, required: bool = False):
    """Build a TrainState skeleton (jitted init — eager init is hundreds of
    slow tunneled dispatches on the axon backend) and restore an orbax
    milestone into it. Shared by the sample/export CLIs."""
    import os

    import orbax.checkpoint as ocp

    from adm_tpu.train.state import TrainState
    from adm_tpu.train.trainer import make_optimizer

    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(1e-4, total_steps=1)
    state = TrainState.create(
        params, optimizer.init(params),
        scale_factor=float(getattr(model, "scale_factor", 1.0)),
    )
    if ckpt_path and os.path.exists(str(ckpt_path)):
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(os.path.abspath(str(ckpt_path)), state)
        log.info("restored %s (step %d)", ckpt_path, int(state.step))
    elif required:
        raise FileNotFoundError(f"checkpoint not found: {ckpt_path}")
    else:
        log.warning("no checkpoint restored (ckpt_path=%s)", ckpt_path)
    return state


def with_restored_scale(model, state):
    """Rebuild an LDM over the checkpoint's calibrated scale_factor.

    Sampling/decoding divides by model.scale_factor (core/diffusion.py), so
    every restore_train_state caller must adopt the persisted value — the
    torch reference gets this for free via the state_dict buffer
    (train_uncond_ldm.py:206-207)."""
    sf = float(state.scale_factor)
    model_sf = float(getattr(model, "scale_factor", 1.0))
    if getattr(model, "scale_by_std", False) and sf != model_sf:
        if sf == 1.0:
            # ADVICE r3: checkpoints from before scale_factor persistence
            # always stored the TrainState.create default 1.0 — adopting it
            # over a calibrated model value would silently break decode
            # scaling for legacy scale_by_std checkpoints. 1.0 is exactly
            # the unset default (a real calibration of 1.0 to float equality
            # is measure-zero), so keep the model's value.
            log.warning(
                "### checkpoint scale_factor=1.0 looks legacy-unset; "
                "keeping model scale_factor=%.6f", model_sf,
            )
            return model
        model = dataclasses.replace(model, scale_factor=sf)
        log.info("### using checkpoint scale_factor=%.6f", sf)
    return model


def _pretrained_transform(model_cfg):
    """model.pretrained: [{file, scope}] -> init-params graft callable
    (utils/weights.py), or None when the config has no grafts."""
    specs = model_cfg.get("pretrained")
    if not specs:
        return None
    from adm_tpu.utils.weights import apply_pretrained

    return lambda params: apply_pretrained(params, specs)


def run_training(args, *, conditional: bool, latent: bool):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    # rbg PRNG measured ~9% faster than threefry on v5e, but the axon
    # compile service intermittently crashes on rbg programs — default to
    # the reliable threefry; opt in with ADM_TPU_PRNG=rbg.
    import os

    jax.config.update(
        "jax_default_prng_impl", os.environ.get("ADM_TPU_PRNG", "threefry2x32")
    )
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if os.environ.get("ADM_TPU_MULTIHOST"):
        # multi-host DCN: coordinator/num_processes from the standard env
        # (replaces the reference's torch_utils/distributed.py:14-41 init)
        jax.distributed.initialize()
    cfg = load_conf(args.cfg)
    model_cfg, data_cfg, train_cfg = cfg["model"], cfg["data"], cfg["trainer"]

    fs = fs_params = None
    if latent:
        fs, fs_params = load_first_stage(cfg)

    model = build_model(model_cfg, first_stage=fs)
    if data_cfg.get("data_type") == "web":
        # LAION-style tar shards (reference train_cond_ldm.py:58-63)
        from adm_tpu.data.webdata import WebdatasetReader, web_batch_iterator

        reader = WebdatasetReader(
            data_cfg["urls"],
            image_size=tuple(data_cfg.get("image_size", model.image_size)),
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        data_iter = web_batch_iterator(reader, data_cfg["batch_size"])
    else:
        dataset = build_dataset(data_cfg)
        data_iter = batch_iterator(
            dataset,
            data_cfg["batch_size"],
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            # reference DataLoader(num_workers=N) (train_uncond_dpm.py:87);
            # threads here — PIL/numpy release the GIL during decode
            num_workers=int(data_cfg.get("num_workers", 0)),
        )
        data_iter = prefetch_iterator(data_iter)

    first_batch = next(data_iter)
    resume_milestone = int(train_cfg.get("resume_milestone", 0))
    # default_scale: keep the configured scale_factor instead of calibrating
    # (reference ddm/ddm_const_2.py:477-489). On RESUME, skip calibration —
    # the orbax-restored TrainState.scale_factor is the original run's value
    # and wins (reference train_uncond_ldm.py:206-207)
    if (
        latent
        and model.scale_by_std
        and not model.scale_by_softsign
        and not model_cfg.get("default_scale", False)
        and not resume_milestone
    ):
        sf = model.calibrate_scale_factor(
            fs_params, jnp.asarray(first_batch["image"]), jax.random.PRNGKey(0)
        )
        model = dataclasses.replace(model, scale_factor=float(sf))
        log.info("### USING STD-RESCALING: scale_factor=%.6f", float(sf))

    trainer = Trainer(
        model,
        data_iter,
        train_num_steps=args.num_steps or int(train_cfg["train_num_steps"]),
        train_lr=float(train_cfg["lr"]),
        min_lr=float(train_cfg.get("min_lr", 5e-6)),
        # the CONDITIONAL reference trainers have no warmup phase at all
        # (train_cond_dpm.py:183 / train_cond_ldm.py:150 — plain poly
        # lambda) and default weight_decay to 1e-2 (:98 / :72); the uncond
        # trainers warm up (default 5000) with wd 1e-4
        # (train_uncond_dpm.py:97,169-182)
        warmup_steps=0 if conditional else int(
            train_cfg.get("warmup_iter", 5000)
        ),
        weight_decay=float(
            train_cfg.get("weight_decay", 1e-2 if conditional else 1e-4)
        ),
        gradient_accumulate_every=int(train_cfg.get("gradient_accumulate_every", 1)),
        save_and_sample_every=int(train_cfg.get("save_and_sample_every", 10000)),
        log_freq=int(train_cfg.get("log_freq", 500)),
        results_folder=train_cfg["results_folder"],
        ema_cfg=EmaConfig(
            update_after_step=int(train_cfg.get("ema_update_after_step", 10000)),
            update_every=int(train_cfg.get("ema_update_every", 8)),
        ),
        resume_milestone=resume_milestone,
        fs_params=fs_params,
        sample_batch_size=min(int(data_cfg["batch_size"]), 64),
        # ZeRO-3-style param/opt/EMA sharding over 'data' (parallel/fsdp.py)
        fsdp=bool(train_cfg.get("fsdp", False)),
        # model.pretrained: [{file, scope}] — graft converted npz subtrees
        # (backbones/CLIP) into the init params (utils/weights.py)
        params_transform=_pretrained_transform(model_cfg),
    )
    # on LDM resume the Trainer swaps in the restored scale_factor — keep the
    # milestone samplers below consistent with it
    model = trainer.model

    sample_cond = None
    if conditional:
        n = min(int(data_cfg["batch_size"]), 16)
        sample_cond = jnp.asarray(first_batch["cond"][:n])

    # jitted milestone samplers — eager model.sample would dispatch the
    # whole denoise loop op-by-op over the tunneled backend; params/fs ride
    # as ARGUMENTS (closures embed them as HLO constants -> axon 413)
    _jit_cond = jax.jit(
        lambda p, fs, k, c: model.sample(
            p, k, cond=c, **(dict(fs_params=fs) if latent else {})
        )
    )

    def _jit_uncond_for(bs):
        return jax.jit(
            lambda p, fs, k: model.sample(
                p, k, batch_size=bs,
                **(dict(fs_params=fs) if latent else {}),
            )
        )

    _jit_uncond_cache = {}

    def sample_fn(tr: Trainer, milestone):
        key = jax.random.PRNGKey(int(tr.state.step))
        if sample_cond is not None:
            imgs = _jit_cond(tr.state.ema_params, fs_params, key, sample_cond)
        else:
            bs = tr.sample_batch_size
            if bs not in _jit_uncond_cache:
                _jit_uncond_cache[bs] = _jit_uncond_for(bs)
            imgs = _jit_uncond_cache[bs](tr.state.ema_params, fs_params, key)
        n_img = imgs.shape[0]
        nrow = 2 ** int(math.floor(math.log2(max(math.sqrt(n_img), 1))))
        path = str(tr.results_folder / f"sample-{milestone}.png")
        save_image_grid(np.asarray(imgs), path, nrow=max(nrow, 1))
        log.info("wrote %s", path)
        # in-train FID (reference test_in_train + sample_test,
        # train_uncond_dpm.py:331-365), on-device instead of the fidelity CLI
        sampler_cfg = cfg.get("sampler", {})
        if sampler_cfg.get("test_in_train") and sampler_cfg.get("target_path"):
            _fid_milestone(tr, milestone, model, sampler_cfg, fs_params, latent)

    def _fid_milestone(tr, milestone, model, sampler_cfg, fs_params, latent):
        import json
        import os

        try:
            from adm_tpu.metrics.metric import calculate_metrics

            n = int(sampler_cfg.get("sample_num", 1000))
            bs = int(sampler_cfg.get("batch_size", 64))
            if bs not in _jit_uncond_cache:
                _jit_uncond_cache[bs] = _jit_uncond_for(bs)
            frames = []
            # ceil batches, trimmed to exactly sample_num (reference
            # train_uncond_dpm.py:331-365 scores the configured count)
            for i in range(math.ceil(n / bs)):
                imgs = _jit_uncond_cache[bs](
                    tr.state.ema_params, fs_params, jax.random.PRNGKey(i)
                )
                frames.append(
                    (np.asarray(imgs) * 255).clip(0, 255).astype(np.uint8)
                )
            res = calculate_metrics(
                np.concatenate(frames)[:n], sampler_cfg["target_path"],
                fid=True,
            )
            log.info("milestone %s FID: %.4f", milestone,
                     res["frechet_inception_distance"])
            with open(tr.results_folder / f"result_{milestone}.json", "w") as f:
                json.dump(res, f)
        except FileNotFoundError as e:
            log.warning("in-train FID skipped: %s", e)

    if train_cfg.get("test_before", False):
        sample_fn(trainer, f"init-{model_cfg.get('sampling_timesteps', 10)}")
    trainer.train(sample_fn=sample_fn)
