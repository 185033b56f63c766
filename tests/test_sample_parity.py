"""END-TO-END sample parity: identical init noise + converted weights must
produce numerically matched samples from our lax.scan sampler and the
reference's torch sample_fn_d loop (BASELINE.md seed-parity target).

This composes every correctness-critical piece: weight conversion, UNet
forward parity, preconditioning, time grid, and the deterministic update.
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
    num_blocks=1,
    attn_resolutions=[8],
    dropout=0.0,
)


def _ref_sample_fn_d(model, init_noise, n_steps, sigma_max=1.0):
    """Transcription of ddm/ddm_const.py:424-456 (const, sqrt(t) noise):
    linear grid sigma_max -> sigma_min^2 (+0), invert-clamp-renoise."""
    sigma_min2 = 0.01**2
    idx = torch.arange(n_steps, dtype=torch.float64)
    t_steps = sigma_max + idx / (n_steps - 1) * (sigma_min2 - sigma_max)
    t_steps = torch.cat([t_steps, torch.zeros(1, dtype=torch.float64)])
    x = init_noise.to(torch.float64) * t_steps[0]
    for t_cur, t_next in zip(t_steps[:-1], t_steps[1:]):
        with torch.no_grad():
            c, noise = model(x.float(), t_cur.reshape(1).float())
        c, noise = c.to(torch.float64), noise.to(torch.float64)
        x0 = x - c * t_cur - noise * t_cur.sqrt()
        x0 = x0.clamp(-1, 1)
        x = x0 + c * t_next + noise * t_next.sqrt()
    x = x.clamp(-1, 1)
    return ((x + 1) / 2).float()


def _ref_sample_fn_s(model, init_noise, eps_seq, n_steps, sigma_max=1.0,
                     sigma_min=1e-2):
    """Transcription of ddm/ddm_const.py:381-419 (stochastic sample_fn_s):
    quadratic sigma^2 grid, clamp-rebuild C correction, posterior step.
    eps_seq supplies the per-step gaussian of pred_xtms_from_xt
    (ddm_const.py:300: epsilon = randn_like)."""
    idx = torch.arange(n_steps, dtype=torch.float64)
    t_steps = sigma_max**2 + idx / (n_steps - 1) * (sigma_min**2 - sigma_max**2)
    t_steps = torch.cat([t_steps, torch.zeros(1, dtype=torch.float64)])
    time_steps = -torch.diff(t_steps)
    img = init_noise.to(torch.float64)  # sigma_max scaling commented out (:393-394)
    cur_time = torch.ones(img.shape[0], dtype=torch.float64)
    for i, step in enumerate(time_steps):
        s = cur_time.clone() if i == len(time_steps) - 1 else torch.full_like(cur_time, step)
        with torch.no_grad():
            c, noise = model(img.float(), cur_time.float())
        c, noise = c.to(torch.float64), noise.to(torch.float64)
        tb = cur_time.reshape(-1, 1, 1, 1)
        sb = s.reshape(-1, 1, 1, 1)
        x0 = img - c * tb - noise * tb.sqrt()
        x0 = x0.clamp(-1, 1)
        c = -x0
        mean = img + c * (tb - sb) - c * tb - sb / tb.sqrt() * noise
        sigma = (sb * (tb - sb) / tb).sqrt()
        img = mean + sigma * eps_seq[i].to(torch.float64)
        cur_time = cur_time - s
    img = img.clamp(-1, 1)
    return ((img + 1) / 2).float()


def test_ten_step_sample_parity():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from unet.uncond_unet import EDMPrecond as TorchEDM

    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.utils.torch_convert import convert_dhariwal_edm

    torch.manual_seed(0)
    tm = TorchEDM(img_resolution=16, img_channels=3, sigma_data=1.0, **TINY)
    tm.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_dhariwal_edm(tm.state_dict())
    )
    net = EDMPrecond(
        img_resolution=16, img_channels=3, sigma_data=1.0, variant="const",
        n_decoders=2,
        model_kwargs=dict(model_channels=32, channel_mult=(1, 2),
                          channel_mult_emb=2, num_blocks=1,
                          attn_resolutions=(8,), dropout=0.0),
    )
    model = DDPM(
        net=net, process_name="const", image_size=(16, 16), channels=3,
        sampling_timesteps=10, sigma_min=0.01, sigma_max=1.0,
    )

    rng = np.random.RandomState(42)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)

    ref_img = _ref_sample_fn_d(tm, torch.from_numpy(noise), 10).numpy()
    ours = model.sample(
        params,
        jax.random.PRNGKey(0),  # unused: init_noise overrides
        batch_size=2,
        init_noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(ours),
        ref_img.transpose(0, 2, 3, 1),
        atol=2e-3,
        err_msg="10-step deterministic samples diverged from the reference",
    )


def test_ten_step_stochastic_sample_parity():
    """Stochastic sampler (sample_fn_s) parity: same converted weights, same
    init + per-step noise -> numerically matched walks."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from unet.uncond_unet import EDMPrecond as TorchEDM

    from adm_tpu.core import sampling
    from adm_tpu.core.processes import ConstProcess
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.utils.torch_convert import convert_dhariwal_edm

    torch.manual_seed(0)
    tm = TorchEDM(img_resolution=16, img_channels=3, sigma_data=1.0, **TINY)
    tm.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_dhariwal_edm(tm.state_dict())
    )
    net = EDMPrecond(
        img_resolution=16, img_channels=3, sigma_data=1.0, variant="const",
        n_decoders=2,
        model_kwargs=dict(model_channels=32, channel_mult=(1, 2),
                          channel_mult_emb=2, num_blocks=1,
                          attn_resolutions=(8,), dropout=0.0),
    )

    n_steps = 10
    rng = np.random.RandomState(7)
    init = rng.randn(2, 3, 16, 16).astype(np.float32)
    eps_seq = rng.randn(n_steps, 2, 3, 16, 16).astype(np.float32)

    ref_img = _ref_sample_fn_s(
        tm, torch.from_numpy(init), torch.from_numpy(eps_seq), n_steps
    ).numpy()

    def model_fn(x, t):
        return net.apply(params, x, t, deterministic=True)

    ours = sampling.sample_stochastic(
        ConstProcess(sigma_min=0.01, sigma_max=1.0),
        model_fn,
        (2, 16, 16, 3),
        jax.random.PRNGKey(0),  # unused: noise injected
        n_steps,
        clip_x_start=True,
        step_grid="quadratic",
        start_scale=1.0,
        init_noise=jnp.asarray(init.transpose(0, 2, 3, 1)),
        noise_seq=jnp.asarray(eps_seq.transpose(0, 1, 3, 4, 2)),
    )
    np.testing.assert_allclose(
        np.asarray(ours),
        ref_img.transpose(0, 2, 3, 1),
        atol=2e-3,
        err_msg="10-step stochastic samples diverged from the reference",
    )
