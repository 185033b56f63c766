"""MEADSTD_TANH_NORM depth loss parity vs the reference ddm/loss.py class."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from tests._torchvision_stub import install as _install_tv

_install_tv()

from adm_tpu.core.depth_loss import meadstd_tanh_norm_loss


def _ref_loss(**kw):
    from ddm.loss import MEADSTD_TANH_NORM_Loss

    return MEADSTD_TANH_NORM_Loss(**kw)


@pytest.mark.parametrize("with_sigmoid", [False, True])
def test_meadstd_matches_reference(with_sigmoid):
    rng = np.random.RandomState(0)
    # depth-like gt in (0, 1) with some invalid (<=0 / >=max) pixels
    gt = rng.rand(3, 1, 24, 24).astype(np.float32)
    gt[gt < 0.15] = 0.0  # invalid holes
    pred = rng.randn(3, 1, 24, 24).astype(np.float32) * 0.3 + 0.4

    ref = _ref_loss(valid_threshold=1e-3, max_threshold=1.0,
                    with_sigmoid=with_sigmoid)
    with torch.no_grad():
        expected = ref(torch.from_numpy(pred), torch.from_numpy(gt)).numpy()

    ours = np.asarray(
        meadstd_tanh_norm_loss(
            jnp.asarray(pred.transpose(0, 2, 3, 1)),
            jnp.asarray(gt.transpose(0, 2, 3, 1)),
            valid_threshold=1e-3, max_threshold=1.0,
            with_sigmoid=with_sigmoid,
        )
    )
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=1e-6)


def test_meadstd_zeroes_empty_samples():
    """A sample with <=100 valid pixels contributes zero (the reference
    drops the row; fixed-shape port zeroes it)."""
    gt = np.zeros((2, 8, 8, 1), np.float32)
    gt[0, :5, :5, 0] = 0.5  # 25 valid pixels only
    pred = np.random.RandomState(1).rand(2, 8, 8, 1).astype(np.float32)
    out = np.asarray(
        meadstd_tanh_norm_loss(jnp.asarray(pred), jnp.asarray(gt))
    )
    assert out[0] == 0.0 and out[1] == 0.0


def test_meadstd_config_wiring():
    from adm_tpu.utils.config import load_conf, build_model
    import os

    os.environ["ADM_TPU_DISABLE_LPIPS"] = "1"
    try:
        cfg = load_conf(
            "adm_tpu/configs/depth_estimation/NYUD_ddm_const_ldm_wby.yaml"
        )
        from adm_tpu.cli.train_vae import build_vae
        from adm_tpu.vae.autoencoder import FirstStage

        fs = FirstStage(build_vae(cfg["model"]["first_stage"]))
        model = build_model(cfg["model"], first_stage=fs)
        assert model.loss_main == "meadstd"
        assert model.loss_main_kwargs["with_sigmoid"] is True
    finally:
        os.environ.pop("ADM_TPU_DISABLE_LPIPS", None)
