"""VAE (AutoencoderKL) GAN trainer — functional port of train_vae.py.

The reference alternates two optimizers using the grad-accum index as
optimizer_idx (train_vae.py:243-271). Here both phases run inside ONE jitted
step: phase A updates encoder/decoder/quant convs + the learned logvar with
rec+LPIPS+KL+adaptive-weight hinge-G loss; phase B updates the PatchGAN
discriminator on the stop-gradiented reconstruction.

Deviation (documented): the reference re-encodes the batch for the
discriminator phase (a second posterior sample, encoder_decoder.py:978-997);
we reuse phase A's reconstruction with stop_gradient — one VAE forward per
step instead of two, same training signal up to sample noise.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from adm_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from adm_tpu.train.lr import warmup_poly_schedule
from adm_tpu.train.state import EmaConfig, ema_decay
from adm_tpu.vae.autoencoder import AutoencoderKL, apply_conv_out
from adm_tpu.vae.losses import (
    NLayerDiscriminator,
    VAELossConfig,
    discriminator_loss,
    generator_loss,
)

log = logging.getLogger("adm_tpu")


@flax.struct.dataclass
class VAEState:
    step: jnp.ndarray
    ae_params: Any  # {'ae': ..., 'logvar': scalar}
    disc_params: Any
    opt_ae: Any
    opt_disc: Any
    ema_params: Any  # shadow of ae_params


def make_vae_train_step(
    module: AutoencoderKL,
    disc: NLayerDiscriminator,
    opt_ae,
    opt_disc,
    loss_cfg: VAELossConfig,
    ema_cfg: EmaConfig,
    perceptual_fn: Optional[Callable] = None,
):
    def step_fn(state: VAEState, batch: Dict[str, jnp.ndarray], rng):
        x = batch["image"]
        key = jax.random.fold_in(rng, state.step)
        k_post, _ = jax.random.split(key)

        # ---- phase A: autoencoder ------------------------------------
        def ae_loss_fn(ae_params):
            variables = {"params": ae_params["ae"]}
            posterior = module.apply(variables, x, method=AutoencoderKL.encode)
            z = posterior.sample(k_post)
            h_pre = module.apply(variables, z, method=AutoencoderKL.decode_pre)
            last_w = ae_params["ae"]["decoder"]["conv_out"]

            def disc_apply(img):
                return disc.apply({"params": state.disc_params}, img)

            loss, logs = generator_loss(
                loss_cfg,
                x,
                h_pre,
                last_w,
                apply_conv_out,
                posterior,
                ae_params["logvar"],
                disc_apply,
                state.step,
                perceptual_fn,
            )
            recon = apply_conv_out(last_w, h_pre)
            return loss, (logs, recon)

        (ae_loss, (logs, recon)), ae_grads = jax.value_and_grad(
            ae_loss_fn, has_aux=True
        )(state.ae_params)
        ae_updates, new_opt_ae = opt_ae.update(
            ae_grads, state.opt_ae, state.ae_params
        )
        new_ae_params = optax.apply_updates(state.ae_params, ae_updates)

        # ---- phase B: discriminator ----------------------------------
        def disc_loss_fn(disc_params):
            def disc_apply(img):
                return disc.apply({"params": disc_params}, img)

            return discriminator_loss(
                loss_cfg, x, jax.lax.stop_gradient(recon), disc_apply, state.step
            )

        (d_loss, d_logs), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc_params)
        d_updates, new_opt_disc = opt_disc.update(
            d_grads, state.opt_disc, state.disc_params
        )
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- EMA on the AE -------------------------------------------
        new_step = state.step + 1
        decay = ema_decay(new_step, ema_cfg)
        eff = jnp.where((new_step % ema_cfg.update_every) == 0, decay, 1.0)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * eff + p * (1.0 - eff), state.ema_params, new_ae_params
        )

        new_state = VAEState(
            step=new_step,
            ae_params=new_ae_params,
            disc_params=new_disc_params,
            opt_ae=new_opt_ae,
            opt_disc=new_opt_disc,
            ema_params=new_ema,
        )
        metrics = dict(logs)
        metrics.update(d_logs)
        metrics["loss"] = ae_loss
        return new_state, metrics

    return step_fn


class VAETrainer:
    def __init__(
        self,
        module: AutoencoderKL,
        data_iter: Iterator[Dict[str, np.ndarray]],
        *,
        image_size=(256, 256),
        in_channels: int = 3,
        loss_cfg: Optional[VAELossConfig] = None,
        train_num_steps: int = 100_000,
        train_lr: float = 1e-4,
        min_lr: float = 5e-6,
        warmup_steps: int = 5000,
        weight_decay: float = 1e-4,
        log_freq: int = 100,
        save_and_sample_every: int = 10_000,
        results_folder: str = "./results_vae",
        ema_cfg: Optional[EmaConfig] = None,
        mesh=None,
        seed: int = 0,
        perceptual_fn: Optional[Callable] = None,
    ):
        self.module = module
        self.data_iter = data_iter
        self.train_num_steps = train_num_steps
        self.log_freq = log_freq
        self.save_and_sample_every = save_and_sample_every
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh if mesh is not None else make_mesh()
        # GAN diagnostics to TensorBoard (reference train_vae.py:287-297)
        from adm_tpu.utils.tb import ScalarWriter

        self.tb = ScalarWriter(
            str(self.results_folder / "tb") if jax.process_index() == 0 else None
        )
        loss_cfg = loss_cfg or VAELossConfig()

        disc = NLayerDiscriminator(n_layers=loss_cfg.disc_num_layers)
        k_ae, k_disc, self.train_key = jax.random.split(jax.random.PRNGKey(seed), 3)
        h, w = image_size
        x0 = jnp.zeros((1, h, w, in_channels), jnp.float32)
        ae_vars = jax.jit(module.init)(k_ae, x0, jax.random.PRNGKey(0))
        disc_vars = jax.jit(disc.init)(k_disc, x0)
        ae_params = {
            "ae": ae_vars["params"],
            "logvar": jnp.asarray(loss_cfg.logvar_init, jnp.float32),
        }

        sched = warmup_poly_schedule(train_lr, train_num_steps, warmup_steps, min_lr)
        self.opt_ae = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(sched, weight_decay=weight_decay),
        )
        self.opt_disc = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(sched, weight_decay=weight_decay),
        )
        self.state = VAEState(
            step=jnp.zeros((), jnp.int32),
            ae_params=ae_params,
            disc_params=disc_vars["params"],
            opt_ae=self.opt_ae.init(ae_params),
            opt_disc=self.opt_disc.init(disc_vars["params"]),
            ema_params=jax.tree_util.tree_map(jnp.copy, ae_params),
        )
        ema_cfg = ema_cfg or EmaConfig(update_after_step=0, update_every=1)
        step_fn = make_vae_train_step(
            module, disc, self.opt_ae, self.opt_disc, loss_cfg, ema_cfg, perceptual_fn
        )
        rep = replicated_sharding(self.mesh)
        dat = data_sharding(self.mesh)
        self.state = jax.device_put(self.state, rep)
        self._step = jax.jit(
            step_fn,
            in_shardings=(rep, dat, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        self._recon = jax.jit(
            lambda p, x, k: module.apply({"params": p["ae"]}, x, k)[0]
        )

    def save(self, milestone: int):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                str((self.results_folder / f"model-{milestone}").absolute()),
                self.state,
                force=True,
            )

    def load(self, milestone: int):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            self.state = ckptr.restore(
                str((self.results_folder / f"model-{milestone}").absolute()),
                self.state,
            )

    def train(self, num_steps: Optional[int] = None, recon_fn=None):
        total = num_steps or self.train_num_steps
        t0, seen = time.time(), 0
        # host-side step mirror (see train/trainer.py): int(state.step)
        # every iteration would block on the async step output
        step = int(self.state.step)
        while step < total:
            batch = next(self.data_iter)
            seen += next(iter(batch.values())).shape[0]
            batch = shard_batch(self.mesh, batch)
            self.state, metrics = self._step(self.state, batch, self.train_key)
            step += 1
            if step % self.log_freq == 0 or step == total:
                m = {k: float(v) for k, v in metrics.items()}
                log.info(
                    "vae step %d/%d loss=%.4f rec=%.4f kl=%.1f d=%.4f imgs/sec=%.1f",
                    step, total, m["loss"], m.get("train/rec_loss", 0),
                    m.get("train/kl_loss", 0), m.get("train/disc_loss", 0),
                    seen / max(time.time() - t0, 1e-9),
                )
                self.tb.add_scalars(m, step)
                self.tb.flush()
            if self.save_and_sample_every and step % self.save_and_sample_every == 0:
                self.save(step // self.save_and_sample_every)
                if recon_fn is not None:
                    recon_fn(self, step // self.save_and_sample_every)
        return self.state
