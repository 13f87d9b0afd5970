"""Training subsystem tests: loss, data pipeline, trainer loop, CLI, and
SPMD sharding over the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from sbb_textline_detection_tpu.models import registry
from sbb_textline_detection_tpu.training import data as data_mod
from sbb_textline_detection_tpu.training import train

TINY = registry.ModelSpec("tiny_train", "tpu_unet", 32, 32, 2, widths=(8, 16))


def test_cross_entropy_matches_manual():
    import jax.numpy as jnp
    logits = jnp.asarray([[[[2.0, 0.0], [0.0, 2.0]]]])  # (1,1,2,2)
    labels = jnp.asarray([[[0, 0]]])
    loss = float(train.cross_entropy_loss(logits, labels))
    p = np.exp([2.0, 0.0]) / np.exp([2.0, 0.0]).sum()
    expect = (-np.log(p[0]) - np.log(1 - p[1] + p[1] * p[0] / p[0] * 0)) / 2
    manual = (-np.log(p[0]) - np.log(np.exp(0) / (np.exp(0) + np.exp(2)))) / 2
    np.testing.assert_allclose(loss, manual, rtol=1e-5)


def test_trainer_reduces_loss():
    trainer = train.Trainer(TINY, learning_rate=1e-3, seed=0)
    rng = np.random.default_rng(0)

    def it():
        while True:
            yield train.synthetic_batch(rng, 4, 32, 32, 2)

    losses = trainer.train(it(), 12)
    assert losses[-1] < losses[0]


def test_synthetic_batches_shapes():
    it = data_mod.synthetic_batches("textline", 2, 64, 64)
    imgs, labs = next(it)
    assert imgs.shape == (2, 64, 64, 3) and labs.shape == (2, 64, 64)
    assert labs.max() <= 1
    it = data_mod.synthetic_batches("region", 2, 64, 64)
    imgs, labs = next(it)
    assert imgs.dtype == np.float32 and labs.dtype == np.int32


def test_crop_batches_from_files(tmp_path):
    from PIL import Image
    (tmp_path / "img").mkdir()
    (tmp_path / "lab").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 255, (80, 90, 3)).astype(np.uint8)
        lab = (rng.uniform(size=(80, 90)) < 0.3).astype(np.uint8)
        Image.fromarray(img).save(str(tmp_path / "img" / f"p{i}.png"))
        Image.fromarray(lab).save(str(tmp_path / "lab" / f"p{i}.png"))
    pairs = data_mod.list_pairs(str(tmp_path / "img"), str(tmp_path / "lab"))
    assert len(pairs) == 2
    it = data_mod.crop_batches(pairs, 3, 32, 32, 2, seed=1)
    imgs, labs = next(it)
    assert imgs.shape == (3, 32, 32, 3)
    assert labs.shape == (3, 32, 32)
    assert imgs.max() <= 1.0 and labs.max() <= 1


def test_crop_batches_pads_small_images(tmp_path):
    from PIL import Image
    (tmp_path / "img").mkdir()
    (tmp_path / "lab").mkdir()
    Image.fromarray(np.zeros((10, 12, 3), np.uint8)).save(
        str(tmp_path / "img" / "s.png"))
    Image.fromarray(np.ones((10, 12), np.uint8)).save(
        str(tmp_path / "lab" / "s.png"))
    pairs = data_mod.list_pairs(str(tmp_path / "img"), str(tmp_path / "lab"))
    imgs, labs = next(data_mod.crop_batches(pairs, 1, 32, 32, 2))
    assert imgs.shape == (1, 32, 32, 3)


def test_list_pairs_requires_matches(tmp_path):
    (tmp_path / "img").mkdir()
    (tmp_path / "lab").mkdir()
    with pytest.raises(ValueError):
        data_mod.list_pairs(str(tmp_path / "img"), str(tmp_path / "lab"))


@pytest.mark.slow
def test_training_cli_resume(tmp_path, monkeypatch):
    """--save-every writes mid-run checkpoints; --resume restarts from the
    saved weights (spec-checked)."""
    from click.testing import CliRunner

    from sbb_textline_detection_tpu.models import registry as reg
    monkeypatch.setitem(
        reg.DEFAULT_SPECS, "page",
        registry.ModelSpec("model_page_mixed_best", "tpu_unet", 32, 32, 2,
                           widths=(8, 16)))
    from sbb_textline_detection_tpu.training import cli as tcli
    args = ["--role", "page", "--out", str(tmp_path), "--steps", "3",
            "--batch", "4", "--save-every", "2", "--log-every", "1"]
    res = CliRunner().invoke(tcli.main, args)
    assert res.exit_code == 0, res.output
    assert "checkpointed at step 2" in res.output
    res2 = CliRunner().invoke(tcli.main, args + ["--resume"])
    assert res2.exit_code == 0, res2.output
    assert "resumed from" in res2.output


@pytest.mark.slow
def test_training_cli_synthetic(tmp_path, monkeypatch):
    """CLI smoke: a few synthetic steps on the 8-device CPU mesh, then the
    checkpoint loads into a SegmentationModel."""
    from click.testing import CliRunner

    from sbb_textline_detection_tpu.models import registry as reg
    monkeypatch.setitem(
        reg.DEFAULT_SPECS, "textline",
        registry.ModelSpec("model_textline_new", "tpu_unet", 32, 32, 2,
                           widths=(8, 16)))
    from sbb_textline_detection_tpu.training import cli as tcli
    res = CliRunner().invoke(tcli.main, [
        "--role", "textline", "--out", str(tmp_path), "--steps", "4",
        "--batch", "8", "--model-parallel", "2", "--log-every", "2"])
    assert res.exit_code == 0, res.output
    assert "saved" in res.output
    from sbb_textline_detection_tpu.core.config import RuntimeConfig
    from sbb_textline_detection_tpu.models import checkpoint, runner
    spec, variables = checkpoint.load(
        checkpoint.checkpoint_path(str(tmp_path), "model_textline_new"))
    m = runner.SegmentationModel(spec, variables,
                                 RuntimeConfig(batch_buckets=(1,)))
    assert m.predict_labels(
        np.zeros((1, 32, 32, 3), np.uint8)).shape == (1, 32, 32)
