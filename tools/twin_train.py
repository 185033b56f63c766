"""Twin-training dynamics parity harness (VERDICT r3 item 1 — the last
untested correctness axis).

Trains the SAME tiny model in BOTH frameworks from IDENTICAL initial
weights, on the SAME data batches, with ONE shared (t, noise) stream:

  reference side: the actual torch code imported from /root/reference —
    ddm.ddm_const_2.DDPM + unet.uncond_unet.EDMPrecond, stepped exactly as
    train_uncond_dpm.py does (AdamW train_uncond_dpm.py:179-180,
    WarmUpLrScheduler :169-182, clip_grad_norm 1.0 :297, opt/sched order
    :301-305, ddm/ema.py EMA :186-189 updated post-step :308-310);
  adm_tpu side: the PRODUCTION jitted train step (train.trainer.
    make_train_step(inject=True) — same grad, clip, AdamW, LR schedule and
    in-step EMA as every real run), on CPU, fp32.

Every piece already has its own parity test (forward 1e-6, sampler 2e-3,
EMA decay schedule, LR lambda); this composes them: if the loss curves and
parameter trajectories track step-for-step, the TRAINING LOOPS are
equivalent.

Deviations forced by the environment (documented, both sides identical):
  * perceptual LPIPS is a zero stub (VGG16 weights are env-absent; the
    reference's loss_vlb term is exactly 0 on both sides);
  * use_augment=False / dropout=0 (their RNG streams cannot be shared
    across frameworks; both have separate elementwise parity tests);
  * the torch t/noise draws are injected from a neutral numpy Philox
    stream (SURVEY section 7's framework-neutral bridge) by calling
    p_losses(x, t) with torch.randn_like patched for the call.

Run (CPU only, no chip needed):
  python tools/twin_train.py [steps] [--batch 16] [--out results/twin]
Writes <out>/twin_report.json; BASELINE.md documents the tolerances.
"""

from __future__ import annotations

import argparse
import json
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import jax

# CPU: the harness must not touch (or wait on) the tunneled TPU, and the
# torch side is CPU fp32 — same platform, same arithmetic.
try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass  # backend already initialized (pytest conftest forces CPU anyway)

import jax.numpy as jnp
import numpy as np

REF = "/root/reference"

# tiny twin config — small enough for ~1 s/step torch CPU, big enough to
# exercise every block type (conv, attention, embeddings, both decoders)
RES = 16
TINY = dict(
    model_channels=32,
    channel_mult=[1, 2],
    channel_mult_emb=2,
    num_blocks=1,
    attn_resolutions=[8],
    dropout=0.0,  # dropout RNG cannot be shared across frameworks
)
LR = 1e-4
WD = 1e-4
MIN_LR = 5e-6
WARMUP = 20
SCHED_TOTAL = 1000  # LR-schedule horizon (reference train_num_steps)
EMA_BETA = 0.9996
EMA_AFTER = 10
EMA_EVERY = 4


def _setup_reference():
    """Import the reference torch stack (read-only, CPU)."""
    import _torchvision_stub

    _torchvision_stub.install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # ddm/augment.py does `from ADM.torch_utils import persistence`: the
    # reference assumes its checkout is importable as package 'ADM'
    if "ADM" not in sys.modules:
        pkg = types.ModuleType("ADM")
        pkg.__path__ = [REF]
        sys.modules["ADM"] = pkg


class _ZeroLPIPS:
    """Env-blocked VGG16 -> a zero perceptual stub; loss_vlb == 0 on both
    sides (keeps the reference's `loss_vlb.sum()` a tensor, which a plain
    perceptual_weight=0 would crash on — ddm/ddm_const_2.py:248-251)."""

    def __call__(self, *a, **k):  # instantiated via LPIPS()
        return self

    def eval(self):
        return self


def build_torch_side(steps: int):
    import torch

    _setup_reference()
    import ddm.ddm_const_2 as ref_mod
    from ddm.ema import EMA as RefEMA
    from unet.uncond_unet import EDMPrecond as TorchEDM

    class _Zero(torch.nn.Module):
        def forward(self, a, b):
            return torch.zeros(a.shape[0], 1, 1, 1)

    ref_mod.LPIPS = lambda: _Zero()  # before DDPM() instantiates it

    torch.manual_seed(0)
    net = TorchEDM(
        img_resolution=RES, img_channels=3, sigma_data=1.0, **TINY
    )
    net.train()
    dd = ref_mod.DDPM(
        net,
        image_size=[RES, RES],
        sampling_timesteps=10,
        perceptual_weight=1.0,  # the zero stub makes the term exactly 0
        cfg=dict(eps=1e-4, weighting_loss=True),
    )
    # exactly train_uncond_dpm.py:169-182
    opt = torch.optim.AdamW(
        filter(lambda p: p.requires_grad, net.parameters()),
        lr=LR, weight_decay=WD,
    )

    def warmup_lr(it):
        if it <= WARMUP:
            return (it + 1) / WARMUP
        return max((1 - (it - WARMUP) / SCHED_TOTAL) ** 0.96, MIN_LR / LR)

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=warmup_lr)
    ema = RefEMA(
        net, beta=EMA_BETA, update_after_step=EMA_AFTER,
        update_every=EMA_EVERY,
    )
    return dd, net, opt, sched, ema


def build_jax_side(torch_net):
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step
    from adm_tpu.utils.torch_convert import convert_dhariwal_edm

    net = EDMPrecond(
        img_resolution=RES, img_channels=3, sigma_data=1.0,
        variant="const", n_decoders=2,
        model_kwargs=dict(
            model_channels=32, channel_mult=(1, 2), channel_mult_emb=2,
            num_blocks=1, attn_resolutions=(8,), dropout=0.0,
        ),
    )
    model = DDPM(
        net=net, process_name="const2", image_size=(RES, RES), channels=3,
        weighting_loss=True, eps=1e-4,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_dhariwal_edm(torch_net.state_dict())
    )
    optimizer, schedule = make_optimizer(
        LR, total_steps=SCHED_TOTAL, warmup_steps=WARMUP, min_lr=MIN_LR,
        weight_decay=WD,
    )
    state = TrainState.create(params, optimizer.init(params))
    ema_cfg = EmaConfig(
        beta=EMA_BETA, update_after_step=EMA_AFTER, update_every=EMA_EVERY
    )
    step = jax.jit(make_train_step(model, optimizer, ema_cfg, inject=True))
    return model, state, step, schedule


def tree_rel_diff(ours, theirs):
    """(relative Frobenius diff, max abs diff) across the whole tree."""
    la, lb = jax.tree_util.tree_leaves(ours), jax.tree_util.tree_leaves(theirs)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(la, lb))
    den = sum(float(jnp.sum(b**2)) for b in lb)
    mx = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(la, lb))
    return (num / max(den, 1e-30)) ** 0.5, mx


def torch_params_as_jax(torch_net):
    from adm_tpu.utils.torch_convert import convert_dhariwal_edm

    return jax.tree_util.tree_map(
        jnp.asarray, convert_dhariwal_edm(torch_net.state_dict())
    )


def run_twin(steps: int = 200, batch: int = 16, compare_every: int = 25,
             out_dir: str = "results/twin", log=print):
    import torch

    from adm_tpu.data.synthetic import ShapesDataset

    dd, tnet, topt, tsched, tema = build_torch_side(steps)
    model, state, jstep, schedule = build_jax_side(tnet)

    # identical-init sanity: the converted tree IS the jax init
    init_rel, init_max = tree_rel_diff(state.params, torch_params_as_jax(tnet))
    assert init_max == 0.0, f"init conversion not exact: {init_max}"

    data = ShapesDataset(image_size=(RES, RES))
    stream = np.random.Generator(np.random.Philox(1234))
    eps = 1e-4
    key = jax.random.PRNGKey(7)  # only feeds (unused) dropout/aug keys

    report = {
        "config": dict(steps=steps, batch=batch, res=RES, lr=LR, wd=WD,
                       warmup=WARMUP, sched_total=SCHED_TOTAL,
                       ema=[EMA_BETA, EMA_AFTER, EMA_EVERY]),
        "losses_torch": [], "losses_jax": [], "loss_rel_diff": [],
        "lr_torch": [], "lr_jax": [], "param_trace": [],
    }

    for it in range(steps):
        imgs = np.stack(
            [data[it * batch + i]["image"] for i in range(batch)]
        )  # NHWC float32 in [-1, 1]
        t_np = (stream.random(batch, dtype=np.float32) * (1 - eps) + eps)
        noise_np = stream.standard_normal(
            (batch, 3, RES, RES), dtype=np.float32
        )

        # ---- torch: the reference loop verbatim (grad accum 1) ----
        xt = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        tt = torch.from_numpy(t_np)
        nt = torch.from_numpy(noise_np)
        orig_randn_like = torch.randn_like
        torch.randn_like = lambda x, **kw: nt
        try:
            tloss, _ = dd.p_losses(xt, tt)
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

        # ---- jax: the production step with the same (t, noise) ----
        jbatch = {"image": jnp.asarray(imgs)}
        jt = jnp.asarray(t_np)
        jn = jnp.asarray(noise_np.transpose(0, 2, 3, 1))  # NHWC
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
                state.params, torch_params_as_jax(tnet)
            )
            e_rel, e_max = tree_rel_diff(
                state.ema_params, torch_params_as_jax(tema.ema_model)
            )
            report["param_trace"].append(dict(
                step=it + 1, param_rel=p_rel, param_max=p_max,
                ema_rel=e_rel, ema_max=e_max,
            ))
            log(f"[twin] step {it + 1}/{steps} loss t={lt:.4f} j={lj:.4f} "
                f"rel={rel:.2e} | params rel={p_rel:.2e} max={p_max:.2e} "
                f"| ema rel={e_rel:.2e}")

    report["max_loss_rel_diff"] = max(report["loss_rel_diff"])
    report["max_lr_rel_diff"] = max(
        abs(a - b) / max(b, 1e-12)
        for a, b in zip(report["lr_jax"], report["lr_torch"])
    )
    final = report["param_trace"][-1]
    report["final"] = final
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "twin_report.json").write_text(json.dumps(report, indent=1))
    log(f"[twin] report -> {out / 'twin_report.json'}")
    log(json.dumps({
        "steps": steps,
        "max_loss_rel_diff": report["max_loss_rel_diff"],
        "max_lr_rel_diff": report["max_lr_rel_diff"],
        **final,
    }))
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", type=int, nargs="?", default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--compare-every", type=int, default=25)
    ap.add_argument("--out", default="results/twin")
    a = ap.parse_args()
    run_twin(a.steps, a.batch, a.compare_every, a.out)
