"""ShapesCaptionedDataset + the t2i learning-evidence scorer.

The on-chip harness (tools/t2i_learn.py) claims 'color/shape accuracy
rises from chance toward 1'; these tests pin the two halves that make
that claim meaningful: the dataset renders what its caption says, and
the scorer awards 1.0 to ground-truth renders (so a model score below 1
measures the MODEL, not the metric). Reference analogue: the t2i
pipeline's caption->image contract (ddm/data.py web loader + the
train_t2i recipe)."""

import numpy as np
import pytest

from adm_tpu.data.synthetic import (
    CAPTION_COLORS,
    CAPTION_SHAPES,
    ShapesCaptionedDataset,
)


@pytest.fixture(scope="module")
def data():
    return ShapesCaptionedDataset(image_size=(32, 32))


def test_batch_contract(data):
    s = data[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["image"].dtype == np.float32
    assert s["image"].min() >= -1 and s["image"].max() <= 1
    assert s["cond"].shape == (77,)
    assert s["cond"].dtype == np.int32
    assert len(data.captions) == len(CAPTION_COLORS) * len(CAPTION_SHAPES)


def test_captions_tokenize_distinctly(data):
    toks = {tuple(t) for t in data._tokens}
    assert len(toks) == len(data.captions)


def test_deterministic_per_index(data):
    a, b = data[7], ShapesCaptionedDataset(image_size=(32, 32))[7]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["cond"], b["cond"])


def test_scorer_perfect_on_ground_truth(data):
    from tools.t2i_learn import _score

    imgs, specs = [], []
    for i in range(60):
        rng = np.random.RandomState((0 * 1_000_003 + i) % 2**31)
        k = rng.randint(len(data._specs))
        imgs.append((data[i]["image"] + 1) / 2)
        specs.append(data._specs[k])
    c_acc, s_acc = _score(np.stack(imgs), specs)
    assert c_acc == 1.0
    assert s_acc == 1.0


def test_scorer_chance_on_noise(data):
    from tools.t2i_learn import _score

    rng = np.random.RandomState(0)
    imgs = rng.uniform(0, 1, (120, 32, 32, 3)).astype(np.float32)
    specs = [data._specs[i % len(data._specs)] for i in range(120)]
    c_acc, _ = _score(imgs, specs)
    assert c_acc < 0.5  # uniform noise must not score like a trained model
