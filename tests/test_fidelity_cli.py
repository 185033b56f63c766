"""fidelity-compatible CLI (adm_tpu.cli.fidelity) end-to-end with random
Inception weights: mirrors the reference's `fidelity -f -i -b N --input1
--input2` shell-out surface (sample_uncond.py:177-180)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def folders_and_weights(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from adm_tpu.metrics.inception import FIDInceptionV3

    root = tmp_path_factory.mktemp("fidelity")
    rng = np.random.RandomState(0)
    for name, shift in (("a", 0), ("b", 60)):
        d = root / name
        d.mkdir()
        for i in range(8):
            img = (rng.rand(32, 32, 3) * 180 + shift).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")

    net = FIDInceptionV3(features_list=("2048", "logits_unbiased"))
    params = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.uint8)
    )
    wpath = root / "inception.npz"
    np.savez(wpath, params=np.asarray(params["params"], dtype=object))
    return str(root / "a"), str(root / "b"), str(wpath)


def test_fidelity_cli_fid_isc(folders_and_weights):
    a, b, w = folders_and_weights
    from adm_tpu.cli.fidelity import main

    out = main([
        "--input1", a, "--input2", b, "-f", "-i", "-b", "8", "--weights", w,
    ])
    # randomly-initialized Inception features nearly collapse over 48 relu
    # layers (see test_metrics.py), so separability isn't assertable here —
    # this test pins the CLI surface: flags, folder iteration, npz weight
    # loading, metric wiring, finite outputs
    assert np.isfinite(out["frechet_inception_distance"])
    assert np.isfinite(out["inception_score_mean"])
    # identical folders => FID ~ 0 (tolerance loose: 8 samples in 2048-dim
    # gives a rank-deficient covariance; the eigh sqrtm noise is ~1e-2)
    same = main(["--input1", a, "--input2", a, "-f", "-b", "8",
                 "--weights", w])
    assert abs(same["frechet_inception_distance"]) < 0.05
