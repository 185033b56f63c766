"""TPU perf probe: fenced, end-to-end measurements of the flagship step and
its constituent costs, written progressively to PERF_r3.jsonl (round-3 probes; PERF_r2.jsonl is the round-2 record).

Usage:  python tools/perf_probe.py [exp ...]
Experiments: conv_mfu gn_chain attn step_base step_hw step_nodrop fwd_only

All timings are fenced with a scalar host transfer (block_until_ready is
unreliable over the tunneled axon backend — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

# NOTE: do NOT use PYTHONPATH for this — the env var breaks the axon TPU
# plugin's registration (empirically: 'axon' vanishes from known backends).
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

OUT = Path(__file__).resolve().parent.parent / "PERF_r3.jsonl"
PEAK_BF16 = 197e12  # v5e


def emit(**kw):
    kw["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(fn, *args, reps=3):
    """fn must return an array; chain-independent reps, fenced each."""
    y = fn(*args)
    fence(y)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*args)
    fence(y)
    return (time.perf_counter() - t0) / reps


# ---------------------------------------------------------------------------
def conv_mfu():
    """XLA conv3x3 MFU at the flagship's hot shapes, amortized via scan."""
    for (b, h, w, cin, cout) in [
        (128, 32, 32, 192, 192),
        (128, 16, 16, 384, 384),
        (128, 8, 8, 384, 384),
        (128, 32, 32, 192, 256),  # lane-padded variant
        (128, 32, 32, 256, 256),
    ]:
        x = jnp.ones((b, h, w, cin), jnp.bfloat16)
        k = jnp.ones((3, 3, cin, cout), jnp.bfloat16) * 0.01
        n = 40

        @jax.jit
        def run(x, k):
            def body(y, _):
                z = jax.lax.conv_general_dilated(
                    y, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                # keep channel count stable for chaining
                return z[..., :cin] * jnp.bfloat16(0.5), ()

            y, _ = jax.lax.scan(body, x, None, length=n)
            return y

        dt = timed(run, x, k)
        per_conv = dt / n
        flops = 2 * b * h * w * cin * cout * 9
        emit(exp="conv_mfu", shape=f"{b}x{h}x{w}x{cin}->{cout}",
             ms=round(per_conv * 1e3, 3), mfu=round(flops / per_conv / PEAK_BF16, 3))


def gn_chain():
    """GN->SiLU->conv chain vs conv alone: measures normalization overhead."""
    from adm_tpu.nn.blocks import GroupNorm

    b, h, w, c = 128, 32, 32, 192
    x = jnp.ones((b, h, w, c), jnp.bfloat16)
    k = jnp.ones((3, 3, c, c), jnp.bfloat16) * 0.01
    gn = GroupNorm(dtype=jnp.bfloat16)
    gp = gn.init(jax.random.PRNGKey(0), x)
    n = 40

    @jax.jit
    def run(x, k, gp):
        def body(y, _):
            z = jax.nn.silu(gn.apply(gp, y))
            z = jax.lax.conv_general_dilated(
                z, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return z * jnp.bfloat16(0.5), ()

        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    dt = timed(run, x, k, gp) / n
    flops = 2 * b * h * w * c * c * 9
    emit(exp="gn_chain", shape=f"{b}x{h}x{w}x{c}",
         ms=round(dt * 1e3, 3), mfu=round(flops / dt / PEAK_BF16, 3))


def attn():
    """fp32-softmax attention cost at the flagship's attention shapes."""
    for (b, heads, seq, d) in [(128, 6, 256, 64), (128, 6, 64, 64)]:
        q = jnp.ones((b, seq, heads, d), jnp.bfloat16) * 0.1
        n = 20

        @jax.jit
        def run(q):
            def body(y, _):
                q32 = y.astype(jnp.float32)
                logits = jnp.einsum("bqhd,bkhd->bhqk", q32, q32 / 8.0)
                w_att = jax.nn.softmax(logits, axis=-1)
                a = jnp.einsum("bhqk,bkhd->bqhd", w_att, q32)
                return a.astype(jnp.bfloat16), ()

            y, _ = jax.lax.scan(body, q, None, length=n)
            return y

        dt = timed(run, q) / n
        emit(exp="attn", shape=f"b{b}h{heads}s{seq}d{d}", ms=round(dt * 1e3, 3))


def conv_pallas():
    """K-packed Pallas conv3x3 vs XLA at the flagship's hot shapes (fwd
    and fwd+bwd), scan-amortized and fenced."""
    from adm_tpu.nn.pallas.conv3x3 import conv3x3_same

    for (b, h, w, cin, cout) in [
        (128, 32, 32, 192, 192),
        (128, 16, 16, 384, 384),
        (128, 8, 8, 384, 384),
    ]:
        x = jnp.ones((b, h, w, cin), jnp.bfloat16) * 0.1
        k = jnp.ones((3, 3, cin, cout), jnp.bfloat16) * 0.01
        n = 40
        flops = 2 * b * h * w * cin * cout * 9

        def xla_conv(y, kk):
            return jax.lax.conv_general_dilated(
                y, kk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        for name, conv in (("pallas", conv3x3_same), ("xla", xla_conv)):

            @jax.jit
            def run_fwd(x, k, conv=conv):
                def body(y, _):
                    z = conv(y, k)
                    return z[..., :cin] * jnp.bfloat16(0.5), ()

                y, _ = jax.lax.scan(body, x, None, length=n)
                return y

            dt = timed(run_fwd, x, k) / n
            emit(exp="conv_pallas", variant=f"{name}_fwd",
                 shape=f"{b}x{h}x{w}x{cin}->{cout}",
                 ms=round(dt * 1e3, 3), mfu=round(flops / dt / PEAK_BF16, 3))

            @jax.jit
            def run_bwd(x, k, conv=conv):
                def body(y, _):
                    def f(yv, kv):
                        return jnp.sum(conv(yv, kv).astype(jnp.float32) ** 2)

                    dy, dk = jax.grad(f, argnums=(0, 1))(y, k)
                    return (dy + dk.sum() * 0).astype(jnp.bfloat16), ()

                y, _ = jax.lax.scan(body, x, None, length=n)
                return y

            dt = timed(run_bwd, x, k) / n
            emit(exp="conv_pallas", variant=f"{name}_fwd+bwd",
                 shape=f"{b}x{h}x{w}x{cin}->{cout}",
                 ms=round(dt * 1e3, 3),
                 mfu=round(3 * flops / dt / PEAK_BF16, 3))


def attn_pallas():
    """Pallas VMEM-resident attention vs the XLA einsum path."""
    from adm_tpu.nn.pallas.attention import small_seq_attention

    for (b, heads, seq, d) in [(128, 6, 256, 64), (128, 6, 64, 64)]:
        q = jnp.ones((b, heads, seq, d), jnp.bfloat16) * 0.1
        n = 20

        @jax.jit
        def run(q):
            def body(y, _):
                a = small_seq_attention(y, y, y, 0.125)
                return a, ()

            y, _ = jax.lax.scan(body, q, None, length=n)
            return y

        dt = timed(run, q) / n
        emit(exp="attn_pallas", shape=f"b{b}h{heads}s{seq}d{d}",
             ms=round(dt * 1e3, 3))


# ---------------------------------------------------------------------------
def _make_step(hw_dropout: bool, dropout: float = 0.1,
               pallas_attention: bool = False, model_channels: int = 192,
               channel_mult=(1, 2, 2, 2)):
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step

    kwargs = dict(model_channels=model_channels, channel_mult=channel_mult,
                  num_blocks=3,
                  attn_resolutions=(16, 8), dropout=dropout, augment_dim=9,
                  use_hw_dropout=hw_dropout,
                  use_pallas_attention=pallas_attention)
    net = EDMPrecond(img_resolution=32, img_channels=3, sigma_data=1.0,
                     variant="const", n_decoders=2, dtype=jnp.bfloat16,
                     model_kwargs=kwargs)
    model = DDPM(net=net, process_name="const", image_size=(32, 32), channels=3,
                 weighting_loss=True, sampling_timesteps=10)
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(1e-4, total_steps=800_000)
    state = TrainState.create(params, optimizer.init(params))
    step_fn = make_train_step(model, optimizer, EmaConfig(), grad_accum=1)
    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return model, state, jitted


def _time_step(state, jitted, batch, key, steps=20):
    state, m = jitted(state, batch, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = jitted(state, batch, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    return dt, state


def step_variant(name: str, hw: bool, dropout: float = 0.1,
                 pallas_attention: bool = False, model_channels: int = 192,
                 channel_mult=(1, 2, 2, 2)):
    batch = {"image": jnp.zeros((128, 32, 32, 3), jnp.float32)}
    key = jax.random.PRNGKey(1)
    model, state, jitted = _make_step(hw, dropout, pallas_attention,
                                      model_channels, channel_mult)
    dt, state = _time_step(state, jitted, batch, key)
    emit(exp=name, ms=round(dt * 1e3, 1), imgs_per_sec=round(128 / dt, 1))


def grads_only():
    """value_and_grad WITHOUT optimizer/EMA: the difference vs the full
    step is the non-matmul tail (clip + AdamW + EMA lerp) as a line item
    (VERDICT r2 item 4)."""
    model, state, _ = _make_step(True, pallas_attention=True)
    batch = {"image": jnp.zeros((128, 32, 32, 3), jnp.float32)}

    @jax.jit
    def vg(params, batch, key):
        def loss_fn(p):
            return model.training_step(p, batch, key)[0]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        import optax
        return loss + optax.global_norm(grads)

    _ = float(vg(state.params, batch, jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    for i in range(10):
        _ = float(vg(state.params, batch, jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / 10
    emit(exp="grads_only", ms=round(dt * 1e3, 1),
         imgs_per_sec=round(128 / dt, 1))


def fwd_only():
    from adm_tpu.core.diffusion import DDPM  # noqa: F401

    model, state, _ = _make_step(True)
    batch = {"image": jnp.zeros((128, 32, 32, 3), jnp.float32)}

    @jax.jit
    def fwd(params, batch, key):
        loss, _ = model.training_step(params, batch, key)
        return loss

    _ = float(fwd(state.params, batch, jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    for i in range(10):
        _ = float(fwd(state.params, batch, jax.random.PRNGKey(i)))
    dt = (time.perf_counter() - t0) / 10
    emit(exp="fwd_only", ms=round(dt * 1e3, 1))


EXPS = {
    "conv_mfu": conv_mfu,
    "conv_pallas": conv_pallas,
    "gn_chain": gn_chain,
    "attn": attn,
    "attn_pallas": attn_pallas,
    "step_base": lambda: step_variant("step_base", hw=False),
    "step_hw": lambda: step_variant("step_hw", hw=True),
    "step_nodrop": lambda: step_variant("step_nodrop", hw=False, dropout=0.0),
    "step_attn": lambda: step_variant("step_attn", hw=True,
                                      pallas_attention=True),
    # channel padding to lane multiples (VERDICT r2 item 4): 192 -> 256 at
    # the 32x32 level via model_channels=128, mult (2,3,3,3) => channels
    # (256, 384, 384, 384), every conv 128-lane-aligned. NON-parity (wider
    # model, ~1.5x level-1 FLOPs); wins only if the 59->79% MFU gap pays
    # for the extra work end-to-end.
    "step_pad256": lambda: step_variant("step_pad256", hw=True,
                                        pallas_attention=True,
                                        model_channels=128,
                                        channel_mult=(2, 3, 3, 3)),
    "grads_only": grads_only,
    "fwd_only": fwd_only,
}


def main():
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    names = sys.argv[1:] or list(EXPS)
    emit(exp="_start", device=str(jax.devices()), names=names)
    for n in names:
        try:
            EXPS[n]()
        except Exception as e:  # keep probing even if one variant fails
            emit(exp=n, error=repr(e)[:500])


if __name__ == "__main__":
    main()
