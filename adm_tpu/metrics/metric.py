"""calculate_metrics entry point (reference metrics/metric.py:19).

Computes FID / ISC / KID between two image sources fully on device: batched
InceptionV3 feature extraction under jit, then the closed-form metrics.
Sources are directories of images, arrays, or iterables of HWC uint8 frames.
"""

from __future__ import annotations

import logging
import os
from typing import Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from adm_tpu.metrics.fid import compute_fid
from adm_tpu.metrics.inception import FIDInceptionV3, convert_inception
from adm_tpu.metrics.isc import inception_score
from adm_tpu.metrics.kid import kernel_inception_distance

log = logging.getLogger("adm_tpu")

Source = Union[str, np.ndarray, Iterable[np.ndarray]]


def _iter_images(src: Source, image_size=None):
    if isinstance(src, str):
        from adm_tpu.data.image_folder import list_images, load_image, resize

        for p in list_images(src):
            img = load_image(p)
            if image_size is not None:
                img = resize(img, image_size)
            yield img
    elif isinstance(src, np.ndarray):
        for img in src:
            yield img
    else:
        yield from src


def resolve_weights_path(weights_path: Optional[str] = None) -> Optional[str]:
    """Single source of the weights-resolution rule (arg, else env)."""
    if weights_path is None:
        return os.environ.get("ADM_TPU_INCEPTION_WEIGHTS")
    return weights_path


def fid_feature_key(weights_path: Optional[str]) -> str:
    """Feature layer for Fréchet/kernel distances. Real weights use the
    standard '2048' pool. With weights_path == 'random' (proxy mode), deep
    features COLLAPSE through ~90 random conv layers (measured: std 3e-4,
    FID ~= 0 between any two image sets) while the shallow '192' features
    discriminate strongly (FID 0.002 within-distribution vs 0.80 against
    noise, 363x separation) — so the proxy scores on '192'."""
    return "192" if resolve_weights_path(weights_path) == "random" else "2048"


def load_inception_params(weights_path: Optional[str] = None):
    """Load converted torch-fidelity weights; see
    adm_tpu.metrics.inception.convert_inception for the one-time conversion
    (`weights-inception-2015-12-05` release of torch-fidelity)."""
    weights_path = resolve_weights_path(weights_path)
    if weights_path == "random":
        # Fixed random-init InceptionV3: random conv features are still a
        # projection of image statistics, so the Fréchet distance over them
        # is a valid RELATIVE quality signal between milestones of the SAME
        # run ("proxy-FID" trend). NOT comparable to published FID values —
        # drop the real weights-inception-2015-12-05 file in via
        # ADM_TPU_INCEPTION_WEIGHTS the moment it is available.
        log.warning(
            "using FIXED RANDOM-INIT InceptionV3 features (proxy-FID trend "
            "metric on the '192' layer, not a real FID)"
        )
        # init over EVERY tap so the param tree also carries the (zero) fc
        # head — calculate_metrics(isc=True) in proxy mode must not crash
        # on a missing fc_kernel
        net = FIDInceptionV3(
            features_list=("64", "192", "768", "2048", "logits_unbiased")
        )
        return jax.jit(net.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8)
        )
    if weights_path is None:
        raise FileNotFoundError(
            "InceptionV3 weights required: pass weights_path or set "
            "ADM_TPU_INCEPTION_WEIGHTS. Convert the torch-fidelity .pth with "
            "adm_tpu.metrics.inception.convert_inception, save via "
            "np.savez, and point at the .npz (or the raw .pth)."
        )
    if weights_path.endswith(".pth"):
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        return jax.tree_util.tree_map(jnp.asarray, convert_inception(sd))
    data = np.load(weights_path, allow_pickle=True)
    tree = data["params"].item() if "params" in data else dict(data)
    return jax.tree_util.tree_map(jnp.asarray, {"params": tree})


_EXTRACT_JIT = {}


def extract_features(
    src: Source,
    params,
    features=("2048", "logits_unbiased"),
    batch_size: int = 128,
    image_size=None,
):
    # cached jit, params as an ARGUMENT: a closure would embed the ~24M-param
    # tree as HLO constants (axon remote-compile HTTP 413) and retrace on
    # every call (per-milestone recompiles in the in-train FID hook)
    key = tuple(features)
    if key not in _EXTRACT_JIT:
        m = FIDInceptionV3(features_list=key)
        _EXTRACT_JIT[key] = jax.jit(lambda p, x: m.apply(p, x))
    jit_fn = _EXTRACT_JIT[key]

    def fn(x):
        return jit_fn(params, x)
    feats = {k: [] for k in features}
    buf = []

    def flush():
        if not buf:
            return
        batch = np.stack(buf)
        if batch.shape[0] < batch_size:  # pad to static shape, trim after
            pad = batch_size - batch.shape[0]
            batch = np.concatenate(
                [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)]
            )
        else:
            pad = 0
        out = fn(jnp.asarray(batch, jnp.uint8))
        n = batch_size - pad
        for k in features:
            feats[k].append(np.asarray(out[k])[:n])
        buf.clear()

    for img in _iter_images(src, image_size):
        buf.append(np.asarray(img, np.uint8))
        if len(buf) == batch_size:
            flush()
    flush()
    return {k: np.concatenate(v) for k, v in feats.items() if v}


def calculate_metrics(
    input1: Source,
    input2: Optional[Source] = None,
    *,
    fid: bool = True,
    isc: bool = False,
    kid: bool = False,
    batch_size: int = 128,
    weights_path: Optional[str] = None,
    image_size=None,
    kid_subset_size: int = 1000,
) -> dict:
    weights_path = resolve_weights_path(weights_path)
    params = load_inception_params(weights_path)
    feat = fid_feature_key(weights_path)
    features = []
    if fid or kid:
        features.append(feat)
    if isc:
        features.append("logits_unbiased")
    f1 = extract_features(input1, params, features, batch_size, image_size)
    out = {}
    if isc:
        m, s = inception_score(jnp.asarray(f1["logits_unbiased"]))
        out["inception_score_mean"] = float(m)
        out["inception_score_std"] = float(s)
    if fid or kid:
        assert input2 is not None, "fid/kid need a second input"
        f2 = extract_features(input2, params, [feat], batch_size, image_size)
        if fid:
            out["frechet_inception_distance"] = float(
                compute_fid(jnp.asarray(f1[feat]), jnp.asarray(f2[feat]))
            )
        if kid:
            m, s = kernel_inception_distance(
                jnp.asarray(f1[feat]),
                jnp.asarray(f2[feat]),
                jax.random.PRNGKey(0),
                subset_size=kid_subset_size,
            )
            out["kernel_inception_distance_mean"] = float(m)
            out["kernel_inception_distance_std"] = float(s)
    return out
