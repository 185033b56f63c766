"""Serving/AOT export path (adm_tpu/serve): the full sampling program
serializes to StableHLO with a SYMBOLIC batch dim, deserializes without
the model zoo, and reproduces model.sample() exactly at multiple batch
sizes; aot_compile_sampler warm-compiles with a FLOP estimate."""

import jax
import jax.numpy as jnp
import numpy as np

from adm_tpu.serve import aot_compile_sampler, export_sampler, load_sampler

from tests.test_tp import _tiny_model


def _setup():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_export_roundtrip_symbolic_batch(tmp_path):
    model, params = _setup()
    path = tmp_path / "tiny.stablehlo"
    data = export_sampler(
        model, params, path=str(path), platforms=("cpu",)
    )
    assert path.read_bytes() == data and len(data) > 1000

    fn = load_sampler(str(path))
    for bs in (2, 3):
        noise = jax.random.normal(
            jax.random.PRNGKey(bs), (bs, 16, 16, 3), jnp.float32
        )
        served = fn(params, noise, jnp.uint32(7))
        direct = model.sample(
            params, jax.random.PRNGKey(7), batch_size=bs,
            unnormalize=True, init_noise=noise,
        )
        np.testing.assert_allclose(
            np.asarray(served), np.asarray(direct), atol=1e-5, rtol=1e-5
        )


def test_stochastic_sampler_exports_and_uses_seed(tmp_path):
    model = _tiny_model()
    model = type(model)(
        net=model.net, process_name="const", image_size=(16, 16),
        channels=3, sampling_timesteps=4, sample_type="stochastic",
    )
    params = model.init(jax.random.PRNGKey(0))
    data = export_sampler(model, params, platforms=("cpu",))
    fn = load_sampler(data)
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    a = np.asarray(fn(params, noise, jnp.uint32(1)))
    b = np.asarray(fn(params, noise, jnp.uint32(2)))
    assert np.isfinite(a).all()
    # same init noise, different seed -> different intermediate renoise
    assert np.abs(a - b).max() > 1e-6


def test_ldm_export_bakes_vae_decode(tmp_path):
    """Latent model: the artifact takes (params, fs_params, noise, seed)
    with LATENT-shaped noise and returns decoded image-space samples."""
    from adm_tpu.core.diffusion import LatentDiffusion
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.vae.autoencoder import AutoencoderKL, FirstStage

    from tests.test_latent import TINY_DD, TINY_UNET

    fs = FirstStage(AutoencoderKL(ddconfig=TINY_DD, embed_dim=4))
    fs_params = fs.init(jax.random.PRNGKey(0), (32, 32), 3)
    net = EDMPrecond(
        img_resolution=16, img_channels=4, variant="const2", n_decoders=2,
        model_kwargs=TINY_UNET,
    )
    model = LatentDiffusion(
        net=net, process_name="const2", image_size=(32, 32), channels=4,
        sampling_timesteps=2, first_stage=fs, scale_factor=2.0,
        scale_by_std=True,
    )
    params = model.init(jax.random.PRNGKey(1))
    data = export_sampler(
        model, params, platforms=("cpu",), fs_params=fs_params
    )
    fn = load_sampler(data)
    # latent noise: 32/2 (down_ratio) = 16, z_channels embed 4
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
    served = np.asarray(fn(params, fs_params, noise, jnp.uint32(3)))
    assert served.shape == (2, 32, 32, 3)
    direct = np.asarray(model.sample(
        params, jax.random.PRNGKey(3), batch_size=2, fs_params=fs_params,
        init_noise=noise,
    ))
    np.testing.assert_allclose(served, direct, atol=1e-5, rtol=1e-5)


def test_fixed_batch_export(tmp_path):
    model, params = _setup()
    data = export_sampler(
        model, params, platforms=("cpu",), symbolic_batch=False,
        batch_size=3,
    )
    fn = load_sampler(data)
    noise = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 16, 3))
    assert np.asarray(fn(params, noise, jnp.uint32(0))).shape[0] == 3


def test_aot_compile_executes():
    model, params = _setup()
    compiled, flops = aot_compile_sampler(model, params, batch_size=2)
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    out = compiled(params, noise, jnp.uint32(0))
    assert np.isfinite(np.asarray(out)).all()
    assert flops is None or flops > 0


def test_export_with_encoder_reuse(tmp_path):
    """encoder_reuse=k bakes encoder-propagation sampling into the
    artifact; the served output must equal the direct reuse-k sampler."""
    model, params = _setup()
    data = export_sampler(
        model, params, platforms=("cpu",), encoder_reuse=2
    )
    fn = load_sampler(data)
    noise = jax.random.normal(
        jax.random.PRNGKey(5), (2, 16, 16, 3), jnp.float32
    )
    served = fn(params, noise, jnp.uint32(7))
    direct = model.sample(
        params, jax.random.PRNGKey(7), batch_size=2,
        unnormalize=True, init_noise=noise, encoder_reuse=2,
    )
    np.testing.assert_allclose(
        np.asarray(served), np.asarray(direct), atol=1e-5, rtol=1e-5
    )


def test_export_model_cli_bakes_order2(tmp_path):
    """The export CLI's --order flag (review r4d) must reach the artifact:
    exported pixels match DDPM.sample(order=2) from the same (initial)
    weights — the CLI path, not just serve.export_sampler, bakes Heun."""
    from pathlib import Path

    from adm_tpu.cli import export_model
    from adm_tpu.utils.config import build_model, load_conf

    REPO = Path(__file__).resolve().parents[1]
    cfg_path = REPO / "tests/configs/tiny_uncond.yaml"
    out = tmp_path / "tiny_heun"
    export_model.main([
        "--cfg", str(cfg_path), "--out", str(out),
        "--platforms", "cpu", "--fixed-batch", "2", "--order", "2",
    ])

    model = build_model(load_conf(str(cfg_path))["model"])
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    noise = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
    served = load_sampler(str(out) + ".stablehlo")(
        params, noise, jnp.uint32(7)
    )
    direct = model.sample(
        params, jax.random.PRNGKey(7), batch_size=2,
        unnormalize=True, init_noise=noise, order=2,
    )
    np.testing.assert_allclose(
        np.asarray(served), np.asarray(direct), atol=1e-5, rtol=1e-5
    )
