"""Serving/deployment path: AOT export of the sampler as StableHLO.

The reference deploys by shipping torch checkpoints + the full python
training stack (sample_uncond.py loads the Trainer's .pt and re-builds the
model class). The TPU-native deployment story is ahead-of-time: serialize
the WHOLE jitted sampling program (every denoiser step, the time grid, the
clamps, unnormalization) with `jax.export` into one StableHLO artifact
that a serving process runs without the model zoo, the config system, or
a Python model definition — params stream in as arguments (orbax).

  export_sampler(model, params)      -> bytes (+ optional file)
  load_sampler(path_or_bytes)        -> fn(params, key[, cond]) -> images
  aot_compile_sampler(model, params) -> compiled executable (warm start,
                                        no first-request compile) + flops

The batch dimension is exported SYMBOLICALLY (jax.export symbolic shapes)
via the init-noise argument, so one artifact serves any batch size.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport


def _sample_fn(model, unnormalize: bool = True, with_cond: bool = False):
    """(params, noise, seed[, cond]) -> images. Batch comes from
    noise.shape[0] (symbolic export dim); `noise` drives the initial draw
    and `seed` (scalar uint32) the stochastic sampler's intermediate
    renoise draws (unused by deterministic samplers)."""
    if with_cond:
        def fn(params, noise, seed, cond):
            return model.sample(
                params,
                jax.random.PRNGKey(seed),
                batch_size=noise.shape[0],
                cond=cond,
                unnormalize=unnormalize,
                init_noise=noise,
            )
    else:
        def fn(params, noise, seed):
            return model.sample(
                params,
                jax.random.PRNGKey(seed),
                batch_size=noise.shape[0],
                unnormalize=unnormalize,
                init_noise=noise,
            )
    return fn


def _specs(model, params, cond_shape, symbolic_batch: bool):
    h, w = model.image_size
    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = 1
    noise = jax.ShapeDtypeStruct((b, h, w, model.channels), jnp.float32)
    seed = jax.ShapeDtypeStruct((), jnp.uint32)
    p_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    if cond_shape is not None:
        cond = jax.ShapeDtypeStruct((b, *cond_shape), jnp.float32)
        return (p_spec, noise, seed, cond)
    return (p_spec, noise, seed)


def export_sampler(
    model,
    params: Any,
    *,
    path: Optional[str] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    cond_shape: Optional[Tuple[int, ...]] = None,
    unnormalize: bool = True,
    symbolic_batch: bool = True,
) -> bytes:
    """Serialize the full sampling program to portable StableHLO bytes.

    `platforms` lists every platform the artifact may run on (multi-
    platform lowering); `cond_shape` is the per-sample conditioning shape
    (H, W, C) for conditional models.
    """
    fn = _sample_fn(model, unnormalize, with_cond=cond_shape is not None)
    exp = jexport.export(
        jax.jit(fn), platforms=tuple(platforms)
    )(*_specs(model, params, cond_shape, symbolic_batch))
    data = bytes(exp.serialize())
    if path is not None:
        Path(path).write_bytes(data)
    return data


def load_sampler(src):
    """bytes or path -> callable (params, noise[, cond]) -> images."""
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
    unnormalize: bool = True,
):
    """Ahead-of-time compile for a warm-started server: returns
    (compiled_executable, flops_estimate). The executable is called with
    concrete (params, noise[, cond]) of the lowered shapes — no compile on
    the first request."""
    fn = _sample_fn(model, unnormalize, with_cond=cond_shape is not None)
    lowered = jax.jit(fn).lower(
        *_specs_fixed(model, params, cond_shape, batch_size)
    )
    compiled = lowered.compile()
    flops = None
    try:
        flops = compiled.cost_analysis().get("flops")
    except Exception:  # cost analysis is backend-dependent
        pass
    return compiled, flops


def _specs_fixed(model, params, cond_shape, batch_size: int):
    h, w = model.image_size
    noise = jax.ShapeDtypeStruct(
        (batch_size, h, w, model.channels), jnp.float32
    )
    seed = jax.ShapeDtypeStruct((), jnp.uint32)
    p_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    if cond_shape is not None:
        cond = jax.ShapeDtypeStruct((batch_size, *cond_shape), jnp.float32)
        return (p_spec, noise, seed, cond)
    return (p_spec, noise, seed)
