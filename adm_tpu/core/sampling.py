"""Few-step samplers as `lax.scan` loops (jit-once, no Python step loop).

Mirrors the reference's two sampler families:
  deterministic  `sample_fn_d` (ddm/ddm_const_2.py:338-389): analytic
                 invert-and-renoise over a linear time grid; DDM's 10-step
                 headline path.
  stochastic     `sample_fn_s` (ddm/ddm_const_2.py:288-336): posterior
                 mean + sigma*eps steps with mid-loop drift correction.

The reference runs these loops in float64 on GPU; on TPU we run float32
(fp64 is emulated/slow) — sampler tests pin the numerics instead.

`model_fn(x, t) -> (drift, noise)` is any callable (typically a jitted
EDMPrecond apply with bound params); x is NHWC, t is (B,).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
ModelFn = Callable[[Array, Array], Tuple[Array, Array]]


def unnormalize_to_zero_to_one(x: Array) -> Array:
    return (x + 1.0) * 0.5


def sample_deterministic(
    process,
    model_fn: ModelFn,
    shape: Tuple[int, ...],
    key: Array,
    n_steps: int = 10,
    *,
    clip_x_start: bool = True,
    scale_input: float = 1.0,
    unnormalize: bool = True,
    final_clip: bool = True,
    init_noise: Optional[Array] = None,
    encoder_reuse: int = 1,
    encode_fn: Optional[Callable] = None,
    decode_fn: Optional[Callable] = None,
    order: int = 1,
) -> Array:
    """Deterministic few-step sampler (reference `sample_fn_d`).

    shape is NHWC. Starts from N(0, t0^2) noise and scans over consecutive
    (t_cur, t_next) pairs of `process.t_steps(n_steps)`.

    `init_noise` (unit std) overrides the PRNG draw — the sampler's ONLY
    randomness — enabling bit-matched samples against other frameworks
    (the seed-parity protocol in BASELINE.md).

    `encoder_reuse=k > 1` enables encoder propagation ("Faster Diffusion",
    arXiv 2312.09608, PAPERS.md): the UNet encoder runs only every k-th
    step; in between, the decoders run over the cached (bottleneck, skips)
    with the time embedding recomputed for the current step. Requires
    `encode_fn(x, t) -> cache` and `decode_fn(x, t, cache) -> (drift,
    noise)` (see DDPM.sample). k=1 is bit-identical to the plain path.

    `order=2` (opt-in, beyond reference) upgrades each step to Heun: take
    the reference step, re-evaluate the model at the landing point
    (x_euler, t_next), and redo the step from x_t with the AVERAGED
    (drift, noise) estimates. The reference step integrates the process
    ODE exactly under FROZEN coefficients (for const2 the trajectory
    x(t) = x0 + (C+eps)t is a straight line, so the step IS explicit
    Euler), hence its error is the drift of the model's estimates along
    the path — exactly what the endpoint average cancels to 2nd order.
    Costs 2 model evals per step (the correction at the final t_next=0 is
    computed-and-discarded to keep the scan uniform; its eval time is
    clamped to process.eps because the preconditioner divides by t).
    With encoder_reuse the correction eval reuses the step's encoder
    cache, so it only pays a decoder. order=1 is the reference sampler,
    bit-identical.
    """
    if order not in (1, 2):
        raise ValueError(f"order must be 1 (reference) or 2 (Heun), got {order}")
    t_steps = process.t_steps(n_steps)
    noise0 = (
        init_noise
        if init_noise is not None
        else jax.random.normal(key, shape, jnp.float32)
    )
    x = noise0 * t_steps[0]
    batch = shape[0]
    clip = scale_input if clip_x_start else None

    if encoder_reuse > 1:
        if encode_fn is None or decode_fn is None:
            raise ValueError(
                "encoder_reuse > 1 needs encode_fn and decode_fn"
            )
        cache0 = encode_fn(x, jnp.full((batch,), t_steps[0], jnp.float32))

        def body(carry, inp):
            x, cache = carry
            i, t_cur, t_next = inp
            tb = jnp.full((batch,), t_cur, jnp.float32)
            cache = jax.lax.cond(
                (i % encoder_reuse == 0) & (i > 0),
                lambda op: encode_fn(op[0], op[1]),
                lambda op: op[2],
                (x, tb, cache),
            )
            drift, noise = decode_fn(x, tb, cache)
            x_next = process.deterministic_step(
                x, drift, noise, t_cur, t_next, clip=clip
            )
            if order == 2:
                # Heun correction decodes over the SAME encoder cache —
                # the correction point is one step along the trajectory,
                # exactly the regime encoder propagation is neutral in
                tnb = jnp.full(
                    (batch,), jnp.maximum(t_next, process.eps), jnp.float32
                )
                drift2, noise2 = decode_fn(x_next, tnb, cache)
                x_heun = process.deterministic_step(
                    x, (drift + drift2) * 0.5, (noise + noise2) * 0.5,
                    t_cur, t_next, clip=clip,
                )
                x_next = jnp.where(t_next > 0, x_heun, x_next)
            return (x_next, cache), None

        idx = jnp.arange(n_steps, dtype=jnp.int32)
        triples = (idx, t_steps[:-1], t_steps[1:])
        (x, _), _ = jax.lax.scan(body, (x, cache0), triples)
    else:
        def body(x, ts):
            t_cur, t_next = ts
            tb = jnp.full((batch,), t_cur, jnp.float32)
            drift, noise = model_fn(x, tb)
            x_next = process.deterministic_step(
                x, drift, noise, t_cur, t_next, clip=clip
            )
            if order == 2:
                tnb = jnp.full(
                    (batch,), jnp.maximum(t_next, process.eps), jnp.float32
                )
                drift2, noise2 = model_fn(x_next, tnb)
                x_heun = process.deterministic_step(
                    x, (drift + drift2) * 0.5, (noise + noise2) * 0.5,
                    t_cur, t_next, clip=clip,
                )
                x_next = jnp.where(t_next > 0, x_heun, x_next)
            return x_next, None

        pairs = jnp.stack([t_steps[:-1], t_steps[1:]], axis=-1)
        x, _ = jax.lax.scan(body, x, pairs)

    if final_clip:
        x = jnp.clip(x, -scale_input, scale_input)
    if scale_input != 1.0:
        x = x / scale_input
    if unnormalize:
        x = unnormalize_to_zero_to_one(x)
    return x


def sample_stochastic(
    process,
    model_fn: ModelFn,
    shape: Tuple[int, ...],
    key: Array,
    n_steps: int = 10,
    *,
    denoise: bool = True,
    clip_x_start: bool = True,
    scale_input: float = 1.0,
    unnormalize: bool = True,
    start_scale: Optional[float] = None,
    step_grid: str = "uniform",
    correct_fn: Optional[Callable] = None,
    final_clip: bool | float = True,
    init_noise: Optional[Array] = None,
    noise_seq: Optional[Array] = None,
    encoder_reuse: int = 1,
    encode_fn: Optional[Callable] = None,
    decode_fn: Optional[Callable] = None,
) -> Array:
    """Stochastic sampler (reference `sample_fn_s`).

    `encoder_reuse=k > 1`: encoder propagation, same contract as
    sample_deterministic (encode_fn/decode_fn required; k=1 unchanged).

    step_grid='uniform': s = 1/n each; with `denoise` the final step splits
    into (1/n - eps, eps) (LDM variant, ddm/ddm_const_2.py:641-646).
    step_grid='quadratic': steps are the diffs of the sigma^2-linear grid
    sigma_max^2 -> sigma_min^2 (+0) (image-space variant — const
    ddm_const.py:384-388, const2 ddm_const_2.py:292-298, res
    ddm_res.py:359-364).
    The drift is corrected each step via `process.stochastic_correct`
    (override with `correct_fn(drift, x, noise, t)` — the LDM variant's
    correction differs, ddm_const_2.py:667-676), and the very last step uses
    s = remaining time so the walk lands at t=0.

    final_clip: True clamps the result at +-scale_input (image-space,
    ddm_const.py:415-417); False skips (LDM std path leaves latents
    unclamped); a float clamps at +-that value (LDM softsign clamps at
    +-0.987654321, ddm_const_2.py:679-680).
    """
    if step_grid == "quadratic":
        idx = jnp.arange(n_steps, dtype=jnp.float32)
        grid = process.sigma_max**2 + idx / (n_steps - 1) * (
            process.sigma_min**2 - process.sigma_max**2
        )
        grid = jnp.concatenate([grid, jnp.zeros((1,), jnp.float32)])
        s_steps = -jnp.diff(grid)
    else:
        step = 1.0 / n_steps
        s_list = [step] * n_steps
        if denoise:
            s_list = s_list[:-1] + [step - process.eps, process.eps]
        s_steps = jnp.asarray(s_list, jnp.float32)
    n_total = s_steps.shape[0]
    batch = shape[0]
    clip = scale_input if clip_x_start else None

    # `init_noise` / `noise_seq` (unit std) override the PRNG draws — the
    # sampler's only randomness — enabling bit-matched runs against the
    # reference torch loop (tests/test_sample_parity.py)
    key, init_key = jax.random.split(key)
    scale0 = process.sigma_max if start_scale is None else start_scale
    noise0 = (
        init_noise
        if init_noise is not None
        else jax.random.normal(init_key, shape, jnp.float32)
    )
    x = noise0 * scale0
    cur_time = jnp.ones((batch,), jnp.float32)

    reuse = encoder_reuse > 1
    if reuse and (encode_fn is None or decode_fn is None):
        raise ValueError("encoder_reuse > 1 needs encode_fn and decode_fn")

    def body(carry, inputs):
        if reuse:
            x, cur_time, key, cache = carry
        else:
            x, cur_time, key = carry
        i, s_i, step_eps = inputs
        s = jnp.where(i == n_total - 1, cur_time, jnp.full_like(cur_time, s_i))
        if reuse:
            cache = jax.lax.cond(
                (i % encoder_reuse == 0) & (i > 0),
                lambda op: encode_fn(op[0], op[1]),
                lambda op: op[2],
                (x, cur_time, cache),
            )
            drift, noise = decode_fn(x, cur_time, cache)
        else:
            drift, noise = model_fn(x, cur_time)
        if correct_fn is not None:
            drift = correct_fn(drift, x, noise, cur_time)
        else:
            drift = process.stochastic_correct(drift, x, noise, cur_time, clip)
        mean, sigma = process.reverse_mean_sigma(x, drift, noise, cur_time, s)
        key, eps_key = jax.random.split(key)
        eps = (
            step_eps
            if noise_seq is not None
            else jax.random.normal(eps_key, mean.shape, mean.dtype)
        )
        x = mean + sigma * eps
        if reuse:
            return (x, cur_time - s, key, cache), None
        return (x, cur_time - s, key), None

    idx = jnp.arange(n_total)
    seq = (
        noise_seq
        if noise_seq is not None
        else jnp.zeros((n_total, 0), jnp.float32)  # unused placeholder
    )
    if reuse:
        cache0 = encode_fn(x, cur_time)
        (x, _, _, _), _ = jax.lax.scan(
            body, (x, cur_time, key, cache0), (idx, s_steps, seq)
        )
    else:
        (x, _, _), _ = jax.lax.scan(body, (x, cur_time, key), (idx, s_steps, seq))

    if final_clip is True:
        x = jnp.clip(x, -scale_input, scale_input)
    elif final_clip is not False:
        x = jnp.clip(x, -final_clip, final_clip)
    if scale_input != 1.0:
        x = x / scale_input
    if unnormalize:
        x = unnormalize_to_zero_to_one(x)
    return x
