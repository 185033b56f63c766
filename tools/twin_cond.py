"""Twin-training dynamics parity for the CONDITIONAL family.

Extends tools/twin_train.py (uncond const2 flagship) to the image-space
conditional pairing the reference ships for saliency
(configs/saliency/DUTS_ddm_const_dpm_114.yaml): `ddm.ddm_const.DDPM`
(the √t const fork) driving the TWO-DECODER `unet/cond_unet.py` Unet,
trained with the conditional trainer's exact recipe — AdamW(wd 1e-2,
train_cond_dpm.py:98,181), NO-warmup poly LR (:183), clip 1.0 (:294),
`ddm/ema.py` EMA — lockstep against the PRODUCTION adm_tpu step
(CondUnet(n_decoders=2, backbone_norm='batch_stats') + const process +
make_train_step(inject=True)) from converted-identical init on the same
procedural saliency pairs with ONE shared (t, noise) stream.

What this composes that the per-piece suites don't: the cond forward in
TRAIN mode (backbone + RelationNet BatchNorm batch statistics), the √t
fork's weighted l2+l1 loss, the no-warmup schedule, wd 1e-2, and the
frozen Fourier-W buffer (requires_grad=False in the reference,
cond_unet_sd.py:396-405 — `with_frozen_buffers` on our side).

Reference quirks handled here, not bugs in this harness:
  * ddm_const.DDPM line 171 comments out `self.use_l1 = use_l1` while
    p_losses line 345 still reads it — the attribute is set manually.
  * the default loss_main ('ldm.models.autoencoder_retrain...') is not
    shipped; cfg['loss_main'] selects the commented-in-code default
    ddm.loss.MSE_Loss (same math).
  * BasicAttetnionLayer MLP dropout (0.1) is disabled on the torch side:
    dropout RNG cannot be shared across frameworks (same policy as
    twin_train; our CondUnet is dropout-free by design).

Usage: python tools/twin_cond.py [steps=100] [--batch 8]
Writes results/twin/twin_cond_report.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "tools"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from twin_train import tree_rel_diff  # noqa: E402

RES = 32
DIM = 16
MULTS = (1, 2, 4, 4)
WINDOWS = ((4, 4), (2, 2), (1, 1), (1, 1))
LR = 1e-4
WD = 1e-2          # train_cond_dpm.py:98 default
MIN_LR = 5e-6
SCHED_TOTAL = 1000
EMA_BETA = 0.9996  # train_cond_dpm.py:189
EMA_AFTER = 10
EMA_EVERY = 4
EPS = 1e-4


def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def build_torch_side(steps: int, unet_kwargs: dict):
    import _torchvision_stub as tvs

    tvs.install()
    import torch

    fv = _stub("fvcore")
    fv.__path__ = []
    _stub("fvcore.common")
    _stub("fvcore.common.config", CfgNode=dict)
    _stub("pytorch_lightning", LightningModule=torch.nn.Module)
    # ddm_const.py module-scope imports absent from this environment —
    # only instantiate_from_config is actually reached on our path
    ldm = _stub("ldm")
    ldm.__path__ = []
    _stub("ldm.modules")
    _stub("ldm.modules.distributions")
    _stub("ldm.modules.distributions.distributions",
          DiagonalGaussianDistribution=object)
    _stub("ldm.modules.ema", LitEma=object)
    _stub("ldm.util", instantiate_from_config=None)  # patched below
    _stub("cldm")
    _stub("cldm.loss", compute_layer_weights=lambda *a, **k: None,
          SegmentationLoss=object)
    _stub("nuScenesSegDataset", nuScenesSegDataset=object)
    _stub("tools", )
    _stub("tools.training_log_analysis", parse_csv_and_plot=lambda *a: None)
    from twin_train import _setup_reference  # ADM pkg alias + /root/reference

    _setup_reference()

    import unet.cond_unet as ref_unet_mod
    from unet.resnet import resnet101 as _r101

    ref_unet_mod.resnet101 = lambda weights=None, **k: _r101(
        weights=None, **k)

    torch.manual_seed(0)
    tnet = ref_unet_mod.Unet(**unet_kwargs)
    tnet.train()
    for m in tnet.modules():  # disable the attention-MLP dropout only
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    import ldm.util as ldm_util

    ldm_util.instantiate_from_config = lambda cfg: tnet
    import ddm.ddm_const as ref_mod

    dd = ref_mod.DDPM(
        {"class_name": "unet.cond_unet.Unet"},  # consumed by the stub above
        image_size=[RES, RES],
        sampling_timesteps=10,
        loss_type="l2",
        start_dist="normal",
        use_ema=False,
        eps=EPS,
        weighting_loss=True,
        loss_main={"class_name": "ddm.loss.MSE_Loss"},
    )
    dd.use_l1 = True  # reference line 171 comments the assignment out
    # perceptual_weight/perceptual_loss are likewise commented out (:173-175)
    # but read at :355-358, where loss_vlb must be a TENSOR to survive
    # `.sum()` — a zero perceptual stub contributes exactly 0 on both sides
    dd.perceptual_weight = 1.0
    dd.perceptual_loss = lambda a, b: torch.zeros(a.shape[0], 1, 1, 1)
    dd.train()

    # exactly train_cond_dpm.py:181-184 — no warmup
    opt = torch.optim.AdamW(
        filter(lambda p: p.requires_grad, tnet.parameters()),
        lr=LR, weight_decay=WD,
    )
    lr_lambda = lambda it: max((1 - it / SCHED_TOTAL) ** 0.96, MIN_LR / LR)  # noqa: E731
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lr_lambda)
    from ddm.ema import EMA as RefEMA

    ema = RefEMA(tnet, beta=EMA_BETA, update_after_step=EMA_AFTER,
                 update_every=EMA_EVERY)
    return dd, tnet, opt, sched, ema


def torch_variables_as_jax(tnet):
    from adm_tpu.utils.torch_convert import convert_cond_unet_sd

    sd = {k: v.detach() for k, v in tnet.state_dict().items()}
    return jax.tree_util.tree_map(
        jnp.asarray,
        convert_cond_unet_sd(sd, MULTS, cond_net="resnet",
                             bn_mode="batch_stats", n_decoders=2),
    )


def build_jax_side(tnet):
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.nn.cond_unet import CondUnet
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import (
        make_optimizer,
        make_train_step,
        with_frozen_buffers,
    )

    net = CondUnet(
        dim=DIM, dim_mults=MULTS, channels=1, cond_in_dim=3,
        window_sizes1=WINDOWS, window_sizes2=WINDOWS,
        resnet_block_groups=8, cond_net="resnet",
        backbone_norm="batch_stats", n_decoders=2,
    )
    model = DDPM(
        net=net, process_name="const", image_size=(RES, RES), channels=1,
        weighting_loss=True, use_l1=True, eps=EPS,
    )
    variables = torch_variables_as_jax(tnet)
    optimizer, schedule = make_optimizer(
        LR, total_steps=SCHED_TOTAL, warmup_steps=0, min_lr=MIN_LR,
        weight_decay=WD,
    )
    optimizer = with_frozen_buffers(optimizer)
    state = TrainState.create(variables, optimizer.init(variables))
    ema_cfg = EmaConfig(beta=EMA_BETA, update_after_step=EMA_AFTER,
                        update_every=EMA_EVERY)
    step = jax.jit(make_train_step(model, optimizer, ema_cfg, inject=True))
    return model, state, step, schedule


def run_twin_cond(steps: int = 100, batch: int = 8, compare_every: int = 25,
                  out_dir: str = "results/twin", log=print) -> dict:
    global SCHED_TOTAL
    SCHED_TOTAL = max(steps, 4)

    import torch

    unet_kwargs = dict(
        dim=DIM, dim_mults=MULTS, channels=1, cond_in_dim=3,
        window_sizes1=[list(w) for w in WINDOWS],
        window_sizes2=[list(w) for w in WINDOWS],
        resnet_block_groups=8, cond_net="resnet",
    )
    dd, tnet, topt, tsched, tema = build_torch_side(steps, unet_kwargs)
    model, state, jstep, schedule = build_jax_side(tnet)

    from adm_tpu.data.synthetic import ShapesPairedDataset

    data = ShapesPairedDataset(image_size=(RES, RES), task="saliency")
    stream = np.random.RandomState(1234)
    key = jax.random.PRNGKey(0)  # consumed only by dead branches

    report = {
        "config": dict(steps=steps, batch=batch, res=RES, lr=LR, wd=WD,
                       sched_total=SCHED_TOTAL, warmup=0,
                       ema=[EMA_BETA, EMA_AFTER, EMA_EVERY],
                       family="cond const(sqrt t) 2-decoder resnet"),
        "losses_torch": [], "losses_jax": [], "loss_rel_diff": [],
        "lr_torch": [], "lr_jax": [], "param_trace": [],
    }
    t0 = time.time()
    for it in range(steps):
        pairs = [data[it * batch + i] for i in range(batch)]
        imgs = np.stack([p["image"] for p in pairs])   # (b,RES,RES,1) [-1,1]
        conds = np.stack([p["cond"] for p in pairs])   # (b,RES,RES,3)
        t_np = stream.random(batch).astype(np.float32) * (1 - EPS) + EPS
        noise_np = stream.standard_normal(
            (batch, 1, RES, RES)).astype(np.float32)

        xt = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ct = torch.from_numpy(conds.transpose(0, 3, 1, 2))
        tt = torch.from_numpy(t_np)
        nt = torch.from_numpy(noise_np)
        orig_randn_like = torch.randn_like
        torch.randn_like = lambda x, **kw: nt
        try:
            tloss, _ = dd.p_losses(xt, tt, ct)
        finally:
            torch.randn_like = orig_randn_like
        tloss.backward()
        torch.nn.utils.clip_grad_norm_(
            filter(lambda p: p.requires_grad, tnet.parameters()), 1.0
        )
        lr_t = topt.param_groups[0]["lr"]
        topt.step()
        topt.zero_grad()
        tsched.step()
        tema.update()

        jbatch = {"image": jnp.asarray(imgs), "cond": jnp.asarray(conds)}
        jt = jnp.asarray(t_np)
        jn = jnp.asarray(noise_np.transpose(0, 2, 3, 1))
        lr_j = float(schedule(int(state.step)))
        state, metrics = jstep(state, jbatch, key, jt, jn)

        lt, lj = float(tloss), float(metrics["loss"])
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        report["losses_torch"].append(lt)
        report["losses_jax"].append(lj)
        report["loss_rel_diff"].append(rel)
        report["lr_torch"].append(lr_t)
        report["lr_jax"].append(lr_j)

        if (it + 1) % compare_every == 0 or it + 1 == steps:
            p_rel, p_max = tree_rel_diff(
                state.params, torch_variables_as_jax(tnet))
            e_rel, e_max = tree_rel_diff(
                state.ema_params, torch_variables_as_jax(tema.ema_model))
            report["param_trace"].append(dict(
                step=it + 1, param_rel=p_rel, param_max=p_max,
                ema_rel=e_rel, ema_max=e_max,
            ))
            log(f"[twin_cond] step {it + 1}/{steps} loss t={lt:.4f} "
                f"j={lj:.4f} rel={rel:.2e} | params rel={p_rel:.2e} "
                f"| ema rel={e_rel:.2e} "
                f"({(time.time() - t0) / (it + 1):.2f} s/step)")

    report["max_loss_rel_diff"] = max(report["loss_rel_diff"])
    report["max_lr_rel_diff"] = max(
        abs(a - b) / max(abs(a), 1e-12)
        for a, b in zip(report["lr_torch"], report["lr_jax"])
    )
    report["final"] = report["param_trace"][-1]
    report["wall_seconds"] = round(time.time() - t0, 1)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "twin_cond_report.json").write_text(json.dumps(report, indent=1))
    log(json.dumps({k: report[k] for k in (
        "max_loss_rel_diff", "max_lr_rel_diff", "final", "wall_seconds")}))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", type=int, nargs="?", default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="results/twin")
    a = ap.parse_args()
    run_twin_cond(a.steps, a.batch, out_dir=a.out)


if __name__ == "__main__":
    main()
