"""Numerical parity vs the actual reference torch model (CPU).

Imports the read-only reference at /root/reference, instantiates its
EDMPrecond(DhariwalUNet), converts the weights with
adm_tpu.utils.torch_convert, and compares forward outputs element-wise.
This is the strongest architecture-equivalence check available offline.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
TINY = dict(
    model_channels=32,
    channel_mult=[1, 2],
    channel_mult_emb=2,
    num_blocks=2,
    attn_resolutions=[8],
    dropout=0.0,
)


@pytest.fixture(scope="module")
def ref_model():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from unet.uncond_unet import EDMPrecond as TorchEDM

    torch.manual_seed(0)
    m = TorchEDM(img_resolution=16, img_channels=3, sigma_data=1.0, **TINY)
    m.eval()
    return m


def test_dhariwal_edm_forward_parity(ref_model):
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.utils.torch_convert import convert_dhariwal_edm

    sd = ref_model.state_dict()
    params = convert_dhariwal_edm(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    net = EDMPrecond(
        img_resolution=16,
        img_channels=3,
        sigma_data=1.0,
        variant="const",
        n_decoders=2,
        model_kwargs=dict(
            model_channels=32,
            channel_mult=(1, 2),
            channel_mult_emb=2,
            num_blocks=2,
            attn_resolutions=(8,),
            dropout=0.0,
        ),
    )

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)

    with torch.no_grad():
        d_x_t, d_y_t = ref_model(torch.from_numpy(x), torch.from_numpy(t))
    d_x_j, d_y_j = net.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)
    )

    np.testing.assert_allclose(
        np.asarray(d_x_j), d_x_t.numpy().transpose(0, 2, 3, 1), atol=2e-4,
        err_msg="drift branch (D_x) mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(d_y_j), d_y_t.numpy().transpose(0, 2, 3, 1), atol=2e-4,
        err_msg="noise branch (D_y) mismatch",
    )


def test_param_count_parity(ref_model):
    from adm_tpu.nn.unets import EDMPrecond

    net = EDMPrecond(
        img_resolution=16, img_channels=3, sigma_data=1.0, variant="const",
        n_decoders=2,
        model_kwargs=dict(model_channels=32, channel_mult=(1, 2),
                          channel_mult_emb=2, num_blocks=2,
                          attn_resolutions=(8,), dropout=0.0),
    )
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.array([0.5])
    )
    n_jax = sum(p.size for p in jax.tree_util.tree_leaves(params))
    n_torch = sum(p.numel() for p in ref_model.parameters())
    assert n_jax == n_torch, f"param count {n_jax} != reference {n_torch}"
