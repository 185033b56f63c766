"""Serving/deployment path: AOT export of the sampler as StableHLO.

The reference deploys by shipping torch checkpoints + the full python
training stack (sample_uncond.py loads the Trainer's .pt and re-builds the
model class). The TPU-native deployment story is ahead-of-time: serialize
the WHOLE jitted sampling program (every denoiser step, the time grid, the
clamps, unnormalization — for latent models also the VAE decode) with
`jax.export` into one StableHLO artifact that a serving process runs
without the model zoo, the config system, or a Python model definition —
params stream in as arguments (orbax).

  export_sampler(model, params)      -> bytes (+ optional file)
  load_sampler(path_or_bytes)        -> fn(params, [fs_params,] noise,
                                          seed[, cond]) -> images
  aot_compile_sampler(model, params) -> compiled executable (warm start,
                                        no first-request compile) + flops

The batch dimension is exported SYMBOLICALLY (jax.export symbolic shapes)
via the init-noise argument, so one artifact serves any batch size; pass
`batch_size` with symbolic_batch=False for a fixed-shape artifact. The
noise input is latent-shaped for LatentDiffusion (H/ratio, W/ratio,
latent channels) and image-shaped for image-space DDPM.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport


def _sample_fn(model, unnormalize, with_cond, with_fs, encoder_reuse=1,
               order=1):
    """Build the export callable. Argument order:
    (params, [fs_params,] noise, seed[, cond]). `noise` drives the initial
    draw (batch = noise.shape[0], possibly symbolic) and `seed` (scalar
    uint32) the stochastic sampler's intermediate renoise draws.
    `encoder_reuse` bakes encoder-propagation sampling (arXiv 2312.09608)
    into the exported program (uncond DDPM only; see core/sampling.py);
    `order=2` bakes the Heun deterministic sampler."""

    def core(params, noise, seed, cond=None, fs_params=None):
        kw: dict = dict(unnormalize=unnormalize, init_noise=noise)
        if cond is not None:
            kw["cond"] = cond
        if fs_params is not None:
            kw["fs_params"] = fs_params
        if order != 1:
            kw["order"] = order
        if encoder_reuse != 1:
            kw["encoder_reuse"] = encoder_reuse
        return model.sample(
            params,
            jax.random.PRNGKey(seed),
            batch_size=noise.shape[0],
            **kw,
        )

    if with_fs and with_cond:
        return lambda p, fs, n, s, c: core(p, n, s, c, fs)
    if with_fs:
        return lambda p, fs, n, s: core(p, n, s, None, fs)
    if with_cond:
        return lambda p, n, s, c: core(p, n, s, c)
    return lambda p, n, s: core(p, n, s)


def _noise_hwc(model) -> Tuple[int, int, int]:
    h, w = model.image_size
    ratio = getattr(getattr(model, "first_stage", None), "down_ratio", 1)
    return h // ratio, w // ratio, model.channels


def _shape_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )


def _specs(model, params, cond_shape, fs_params, b):
    """b: int batch or a symbolic dim object."""
    nh, nw, nc = _noise_hwc(model)
    noise = jax.ShapeDtypeStruct((b, nh, nw, nc), jnp.float32)
    seed = jax.ShapeDtypeStruct((), jnp.uint32)
    args = [_shape_tree(params)]
    if fs_params is not None:
        args.append(_shape_tree(fs_params))
    args += [noise, seed]
    if cond_shape is not None:
        args.append(jax.ShapeDtypeStruct((b, *cond_shape), jnp.float32))
    return tuple(args)


def export_sampler(
    model,
    params: Any,
    *,
    path: Optional[str] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    cond_shape: Optional[Tuple[int, ...]] = None,
    fs_params: Any = None,
    unnormalize: bool = True,
    symbolic_batch: bool = True,
    batch_size: int = 1,
    encoder_reuse: int = 1,
    order: int = 1,
) -> bytes:
    """Serialize the full sampling program to portable StableHLO bytes.

    `platforms` lists every platform the artifact may run on (multi-
    platform lowering); `cond_shape` is the per-sample conditioning shape
    (H, W, C) for conditional models; `fs_params` (LatentDiffusion) bakes
    the VAE decode into the program, called with the first-stage params as
    the second argument. `batch_size` applies when symbolic_batch=False.
    `encoder_reuse=k` bakes encoder propagation into the artifact (uncond
    DDPM only; quality table in BASELINE.md "Sampling acceleration");
    `order=2` bakes the Heun deterministic sampler (quality table in
    BASELINE.md, tools/heun_quality_cpu.py).
    """
    fn = _sample_fn(
        model, unnormalize, cond_shape is not None, fs_params is not None,
        encoder_reuse, order,
    )
    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size
    exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(
        *_specs(model, params, cond_shape, fs_params, b)
    )
    data = bytes(exp.serialize())
    if path is not None:
        Path(path).write_bytes(data)
    return data


def load_sampler(src):
    """bytes or path -> callable (params, [fs_params,] noise, seed[, cond])."""
    data = (
        bytes(src)
        if isinstance(src, (bytes, bytearray))
        else Path(src).read_bytes()
    )
    exp = jexport.deserialize(data)
    return exp.call


def aot_compile_sampler(
    model,
    params: Any,
    *,
    batch_size: int = 16,
    cond_shape: Optional[Tuple[int, ...]] = None,
    fs_params: Any = None,
    unnormalize: bool = True,
    encoder_reuse: int = 1,
    order: int = 1,
):
    """Ahead-of-time compile for a warm-started server: returns
    (compiled_executable, flops_estimate). The executable is called with
    concrete (params, [fs_params,] noise, seed[, cond]) of the lowered
    shapes — no compile on the first request. `encoder_reuse`/`order`
    select the accelerated sampler variants (see export_sampler)."""
    fn = _sample_fn(
        model, unnormalize, cond_shape is not None, fs_params is not None,
        encoder_reuse, order,
    )
    lowered = jax.jit(fn).lower(
        *_specs(model, params, cond_shape, fs_params, batch_size)
    )
    compiled = lowered.compile()
    flops = None
    try:
        flops = compiled.cost_analysis().get("flops")
    except Exception:  # cost analysis is backend-dependent
        pass
    return compiled, flops
