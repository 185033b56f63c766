"""Integration: tar shards -> web iterator -> text-conditioned latent DDM
training step -> text-conditioned sampling. The full t2i pipeline on the
CPU mesh with generated data."""

import io
import json
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.data.webdata import WebdatasetReader, web_batch_iterator
from adm_tpu.utils.config import build_model
from adm_tpu.vae.autoencoder import AutoencoderKL, FirstStage


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("t2i_shards")
    rng = np.random.RandomState(0)
    with tarfile.open(d / "shard-0000.tar", "w") as tf:
        for i in range(6):
            arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:05d}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = json.dumps({"caption": f"an image numbered {i}"}).encode()
            info = tarfile.TarInfo(f"{i:05d}.json")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))
    return str(d)


def test_t2i_web_training_pipeline(shard_dir):
    vae = AutoencoderKL(
        ddconfig=dict(ch=16, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), dropout=0.0, in_channels=3,
                      resolution=32, z_channels=4, double_z=True),
        embed_dim=4,
    )
    fs = FirstStage(vae)
    fs_params = fs.init(jax.random.PRNGKey(0), (32, 32), 3)

    model_cfg = {
        "class_name": "ddm.ddm_const.LatentDiffusion",
        "image_size": [32, 32],
        "sampling_timesteps": 2,
        "weighting_loss": True,
        "scale_factor": 1.0,
        "scale_by_std": True,
        "unet": {
            "class_name": "unet.cond_unet_t2i.Unet",
            "dim": 16, "dim_mults": [1, 2], "channels": 4,
            "window_sizes1": [[4, 4], [2, 2]], "resnet_block_groups": 4,
            "context_length": 77,
        },
    }
    model = build_model(model_cfg, first_stage=fs)
    params = model.init(jax.random.PRNGKey(1))

    reader = WebdatasetReader(shard_dir + "/*.tar", image_size=(32, 32))
    batch = next(web_batch_iterator(reader, 4))
    jb = {"image": jnp.asarray(batch["image"]), "cond": jnp.asarray(batch["cond"])}
    loss, logs = jax.jit(
        lambda p, b, k: model.training_step(p, b, k, fs_params=fs_params)
    )(params, jb, jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(loss))

    imgs = model.sample(
        params, jax.random.PRNGKey(3), cond=jb["cond"], fs_params=fs_params
    )
    assert imgs.shape == (4, 32, 32, 3)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0
