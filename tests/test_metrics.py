"""Metrics: FID math vs scipy, ISC/KID sanity, InceptionV3 architecture
parity against the reference's vendored extractor (random weights)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.metrics.fid import compute_fid, feature_stats, frechet_distance
from adm_tpu.metrics.isc import inception_score
from adm_tpu.metrics.kid import kernel_inception_distance


def test_fid_zero_for_identical_stats(rng):
    f = jax.random.normal(rng, (500, 16))
    fid = compute_fid(f, f)
    assert abs(float(fid)) < 1e-2


def test_fid_matches_scipy(rng):
    scipy_linalg = pytest.importorskip("scipy.linalg")
    k1, k2 = jax.random.split(rng)
    f1 = np.asarray(jax.random.normal(k1, (400, 8)))
    f2 = np.asarray(jax.random.normal(k2, (400, 8))) * 1.5 + 0.3
    mu1, s1 = np.mean(f1, 0), np.cov(f1, rowvar=False)
    mu2, s2 = np.mean(f2, 0), np.cov(f2, rowvar=False)
    covmean = scipy_linalg.sqrtm(s1.dot(s2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    expected = (
        np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean)
    )
    ours = float(compute_fid(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(ours, expected, rtol=2e-2)


def test_feature_stats_unbiased(rng):
    f = np.asarray(jax.random.normal(rng, (100, 4)))
    mu, sigma = feature_stats(jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(mu), f.mean(0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sigma), np.cov(f, rowvar=False), atol=1e-4
    )


def test_inception_score_uniform_is_one(rng):
    """Uniform predictions -> IS == 1."""
    logits = jnp.zeros((100, 10))
    mean, std = inception_score(logits, splits=5)
    np.testing.assert_allclose(float(mean), 1.0, atol=1e-5)


def test_inception_score_confident_is_high(rng):
    """One-hot-confident, diverse predictions -> IS == n_classes."""
    labels = jnp.arange(100) % 10
    logits = jax.nn.one_hot(labels, 10) * 50.0
    mean, _ = inception_score(logits, splits=5)
    np.testing.assert_allclose(float(mean), 10.0, rtol=1e-3)


def test_kid_separates_distributions(rng):
    """Unbiased MMD^2 hovers near 0 on matched distributions (subset
    variance makes it nonzero, possibly negative) and grows with shift."""
    f = jax.random.normal(rng, (300, 16))
    mean, std = kernel_inception_distance(
        f, f + 0.0, jax.random.PRNGKey(0), subsets=8, subset_size=150
    )
    assert abs(float(mean)) < 0.5
    f2 = f * 2 + 1
    mean2, _ = kernel_inception_distance(
        f, f2, jax.random.PRNGKey(0), subsets=8, subset_size=150
    )
    assert float(mean2) > 10 * abs(float(mean))


# ---------------------------------------------------------------------------
# architecture parity vs the reference's vendored torch extractor
# ---------------------------------------------------------------------------


def test_inception_architecture_parity():
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import metrics.feature_extractor_inceptionv3 as fx

    from adm_tpu.metrics.inception import FIDInceptionV3, convert_inception

    # construct with random weights: bypass the download + load
    torch.manual_seed(0)
    orig_load = torch.nn.Module.load_state_dict
    fx.load_state_dict_from_url = lambda *a, **k: {}
    torch.nn.Module.load_state_dict = lambda self, sd, strict=True: None
    try:
        ref = fx.FeatureExtractorInceptionV3(
            "x", features_list=["64", "192", "768", "2048", "logits_unbiased"],
        )
    finally:
        torch.nn.Module.load_state_dict = orig_load
    ref.eval()
    # random kaiming init collapses 48-layer relu features to ~0, which
    # would make the comparison vacuous — rescale convs and lift BN biases
    # so activations stay alive through the depth
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith("conv.weight"):
                p.mul_(1.8)
            if name.endswith("bn.bias"):
                p.add_(0.05)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_inception(ref.state_dict())
    )
    ours = FIDInceptionV3(
        features_list=("64", "192", "768", "2048", "logits_unbiased")
    )

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (2, 3, 64, 64)).astype(np.uint8)
    with torch.no_grad():
        ref_feats = ref(torch.from_numpy(img))
    ours_feats = ours.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    for name, rf in zip(["64", "192", "768", "2048", "logits_unbiased"], ref_feats):
        rfn = rf.numpy()
        assert np.abs(rfn).mean() > 1e-3, f"feature '{name}' degenerate"
        np.testing.assert_allclose(
            np.asarray(ours_feats[name]), rfn,
            atol=1e-3 + 1e-3 * np.abs(rfn).max(),
            err_msg=f"feature '{name}' mismatch",
        )


def _random_torch_extractor(features_list):
    """Reference extractor with live random weights (no download)."""
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import metrics.feature_extractor_inceptionv3 as fx

    torch.manual_seed(0)
    orig_load = torch.nn.Module.load_state_dict
    fx.load_state_dict_from_url = lambda *a, **k: {}
    torch.nn.Module.load_state_dict = lambda self, sd, strict=True: None
    try:
        ref = fx.FeatureExtractorInceptionV3("x", features_list=list(features_list))
    finally:
        torch.nn.Module.load_state_dict = orig_load
    ref.eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith("conv.weight"):
                p.mul_(1.8)
            if name.endswith("bn.bias"):
                p.add_(0.05)
    return ref


def test_fid_pipeline_end_to_end_vs_reference():
    """WHOLE-metric equivalence (VERDICT item 4): shared random Inception
    weights -> same two image sets -> |FID_jax - FID_torch| small, where the
    torch side runs the reference's vendored pipeline verbatim
    (metrics/metric_fid.py:16-72 on features from
    metrics/feature_extractor_inceptionv3.py)."""
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests._torchvision_stub import install as _install_tv

    _install_tv()
    from metrics.metric_fid import (
        fid_features_to_statistics,
        fid_statistics_to_metric,
    )

    from adm_tpu.metrics.inception import FIDInceptionV3, convert_inception

    # the '64' tap (3 convs deep) retains strong input sensitivity under
    # random weights; the deep taps wash inputs out to near-identical
    # feature distributions (FID ~5e-4, below cross-impl sqrtm noise) and
    # their elementwise parity is covered separately by
    # test_inception_architecture_parity
    ref = _random_torch_extractor(["64"])
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_inception(ref.state_dict())
    )
    ours = FIDInceptionV3(features_list=("64",))

    rng_np = np.random.RandomState(7)
    n = 128
    # two genuinely different distributions (white noise vs dark constant)
    imgs1 = rng_np.randint(0, 256, (n, 3, 32, 32)).astype(np.uint8)
    imgs2 = np.zeros((n, 3, 32, 32), np.uint8)

    def torch_feats(imgs):
        with torch.no_grad():
            return ref(torch.from_numpy(imgs))[0].to(torch.float64)

    stat1 = fid_features_to_statistics(torch_feats(imgs1))
    stat2 = fid_features_to_statistics(torch_feats(imgs2))
    fid_torch = fid_statistics_to_metric(stat1, stat2, verbose=False)[
        "frechet_inception_distance"
    ]

    def jax_feats(imgs):
        return ours.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)))[
            "64"
        ]

    fid_jax = float(compute_fid(jax_feats(imgs1), jax_feats(imgs2)))
    assert fid_torch > 1.0, "degenerate test: FID should be O(1)"
    np.testing.assert_allclose(fid_jax, fid_torch, rtol=2e-2)


def test_isc_pipeline_end_to_end_vs_reference():
    """Whole-metric ISC: same logits through the reference
    metrics/metric_isc.py:11-35 vs our inception_score."""
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests._torchvision_stub import install as _install_tv

    _install_tv()
    from metrics.metric_isc import isc_features_to_metric

    rng_np = np.random.RandomState(3)
    logits = rng_np.randn(200, 16).astype(np.float32) * 3
    ref = isc_features_to_metric(
        torch.from_numpy(logits), splits=4, shuffle=False
    )
    mean, std = inception_score(jnp.asarray(logits), splits=4)
    np.testing.assert_allclose(
        float(mean), ref["inception_score_mean"], rtol=1e-4
    )
    np.testing.assert_allclose(
        float(std), ref["inception_score_std"], rtol=1e-3, atol=1e-5
    )


def test_kid_pipeline_end_to_end_vs_reference():
    """Whole-metric KID: the unbiased MMD^2 core
    (metrics/metric_kid.py:58-71) on one full-set 'subset' so the subset
    RNG is out of the comparison."""
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests._torchvision_stub import install as _install_tv

    _install_tv()
    from metrics.metric_kid import polynomial_mmd

    rng_np = np.random.RandomState(4)
    f1 = rng_np.randn(100, 32).astype(np.float64)
    f2 = (rng_np.randn(100, 32) * 1.2 + 0.1).astype(np.float64)
    ref = polynomial_mmd(f1, f2, degree=3, gamma=None, coef0=1)
    mean, _ = kernel_inception_distance(
        jnp.asarray(f1), jnp.asarray(f2), jax.random.PRNGKey(0),
        subsets=1, subset_size=100,
    )
    np.testing.assert_allclose(float(mean), ref, rtol=1e-4, atol=1e-7)
