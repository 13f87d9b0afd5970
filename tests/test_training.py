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


def test_mesh_train_step_matches_single_device():
    """Numeric SPMD parity: one train step on the (4,2) data+tensor-parallel
    mesh produces the same loss and updated params as the unsharded
    single-device step on identical data and init (VERDICT r01 task 8)."""
    import jax
    import jax.numpy as jnp

    from sbb_textline_detection_tpu.parallel import mesh as mesh_mod

    import optax

    spec = registry.ModelSpec("tp_parity", "tpu_unet", 32, 32, 3,
                              widths=(8, 16))
    variables = registry.init_variables(spec, seed=3)
    # SGD, not adam: after a single adam step the update is lr*sign(grad)
    # for every param, so an epsilon-level grad difference near zero flips
    # to a full 2*lr param difference — a numerics red herring. SGD keeps
    # the comparison proportional to the actual gradient agreement.
    tx = optax.sgd(1e-2)
    opt_state = jax.jit(tx.init)(variables)
    rng = np.random.default_rng(7)
    images, labels = train.synthetic_batch(rng, 8, 32, 32, 3)
    step = train.make_train_step(spec, tx)

    # Reference: plain single-device jit (implicitly device 0, replicated).
    v1, _, loss1 = jax.jit(step)(variables, opt_state,
                                 jnp.asarray(images), jnp.asarray(labels))
    loss1 = float(loss1)

    # Mesh: batch sharded over data=4, conv output channels over model=2.
    mesh = mesh_mod.make_mesh(jax.devices()[:8], model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    vs = mesh_mod.param_shardings(mesh, variables)
    v_sharded = mesh_mod.shard_tree(variables, vs)
    imgs_s = jax.device_put(jnp.asarray(images), mesh_mod.batch_sharding(mesh))
    labs_s = jax.device_put(jnp.asarray(labels), mesh_mod.label_sharding(mesh))
    opt_sharded = jax.jit(tx.init)(v_sharded)
    v2, _, loss2 = jax.jit(step)(v_sharded, opt_sharded, imgs_s, labs_s)
    loss2 = float(loss2)

    # TP kernels actually sharded (not a degenerate replicated mesh).
    kernels = [s for p, s in jax.tree_util.tree_flatten_with_path(vs)[0]
               if "model" in str(s.spec)]
    assert kernels, "no parameter picked up a model-axis sharding"

    np.testing.assert_allclose(loss2, loss1, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, v1))
    flat2 = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, v2))
    # Sharded psum reassociates float32 reductions; observed cross-device
    # noise is <=7e-6 absolute on O(0.1) params.
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5)


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
            "--batch", "8", "--save-every", "2", "--log-every", "1"]
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


def test_mesh_dualhead_train_step_matches_single_device():
    """SPMD parity for the dual-head joint task: one train step on the
    (4,2) mesh (batch over data, conv channels over model) matches the
    unsharded step — the multi-head summed-CE loss and its 4-D label
    planes shard like the single-task path."""
    import jax
    import jax.numpy as jnp
    import optax

    from sbb_textline_detection_tpu.parallel import mesh as mesh_mod
    from sbb_textline_detection_tpu.utils import synthetic

    spec = registry.ModelSpec("tp_parity_dual", "tpu_unet", 32, 32, 5,
                              widths=(8, 16), heads=(3, 2), in_channels=2)
    variables = registry.init_variables(spec, seed=3)
    tx = optax.sgd(1e-2)  # see test_mesh_train_step_matches_single_device
    opt_state = jax.jit(tx.init)(variables)
    rng = np.random.default_rng(11)
    images, labels = synthetic.dualhead_batch(rng, 8, 32, 32)
    step = train.make_train_step(spec, tx)

    v1, _, loss1 = jax.jit(step)(variables, opt_state,
                                 jnp.asarray(images), jnp.asarray(labels))
    loss1 = float(loss1)

    mesh = mesh_mod.make_mesh(jax.devices()[:8], model_parallel=2)
    vs = mesh_mod.param_shardings(mesh, variables)
    v_sharded = mesh_mod.shard_tree(variables, vs)
    imgs_s = jax.device_put(jnp.asarray(images),
                            mesh_mod.batch_sharding(mesh))
    labs_s = jax.device_put(jnp.asarray(labels),
                            mesh_mod.label_sharding(mesh, labels.ndim))
    opt_sharded = jax.jit(tx.init)(v_sharded)
    v2, _, loss2 = jax.jit(step)(v_sharded, opt_sharded, imgs_s, labs_s)
    np.testing.assert_allclose(float(loss2), loss1, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, v1))
    flat2 = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, v2))
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5)
