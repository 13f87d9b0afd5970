"""Converter CLI tests: synthetic Keras .h5 -> .npz checkpoint that loads
and validates against the ResNet50Unet architecture."""

import numpy as np
import jax
import pytest

from sbb_textline_detection_tpu.models import checkpoint, convert, registry

from tests.h5_fixture import build_fake_keras_h5


@pytest.fixture(scope="module")
def fake_h5(tmp_path_factory):
    spec = registry.ModelSpec("model_fake_best", "resnet50_unet", 64, 64, 2)
    variables = registry.init_variables(spec, seed=0)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    path = str(tmp_path_factory.mktemp("h5") / "model_fake_best.h5")
    build_fake_keras_h5(path, variables, np.random.default_rng(0),
                        with_model_config=(64, 64))
    return path


def test_infer_geometry(fake_h5):
    h, w, n = convert.infer_geometry(fake_h5)
    assert (h, w, n) == (64, 64, 2)


def test_convert_roundtrip(fake_h5, tmp_path):
    out = convert.convert_h5(fake_h5, str(tmp_path))
    assert out.endswith("model_fake_best.npz")
    spec, variables = checkpoint.load(out)
    assert spec.arch == "resnet50_unet"
    assert (spec.input_height, spec.input_width, spec.n_classes) == (64, 64, 2)
    # the checkpoint drives a SegmentationModel (includes shape validation)
    from sbb_textline_detection_tpu.core.config import RuntimeConfig
    from sbb_textline_detection_tpu.models import runner
    m = runner.SegmentationModel(spec, variables,
                                 RuntimeConfig(batch_buckets=(1,)))
    labels = m.predict_labels(np.zeros((1, 64, 64, 3), np.uint8))
    assert labels.shape == (1, 64, 64)


def test_convert_cli(fake_h5, tmp_path):
    from click.testing import CliRunner
    res = CliRunner().invoke(convert.main,
                             ["-i", fake_h5, "-o", str(tmp_path / "out")])
    assert res.exit_code == 0, res.output
    assert "model_fake_best.npz" in res.output
    # the mapping summary is surfaced, not just the output path
    assert "layers mapped, import complete" in res.output
    assert "n_classes=" in res.output


def test_convert_cli_surfaces_failure_report(tmp_path):
    import h5py
    from click.testing import CliRunner
    bad = str(tmp_path / "bad.h5")
    with h5py.File(bad, "w") as f:
        g = f.create_group("model_weights")
        lg = g.create_group("conv1")
        lg.create_dataset("conv1/kernel:0",
                          data=np.zeros((7, 7, 3, 64), np.float32))
        lg.attrs["weight_names"] = [b"conv1/kernel:0"]
        g.attrs["layer_names"] = [b"conv1"]
    res = CliRunner().invoke(convert.main,
                             ["-i", bad, "-o", str(tmp_path / "out")])
    assert res.exit_code == 1
    assert "FAILED" in res.output
    assert "unfilled target" in res.output


def test_convert_incomplete_h5_raises(tmp_path):
    import h5py
    bad = str(tmp_path / "bad.h5")
    with h5py.File(bad, "w") as f:
        g = f.create_group("model_weights")
        lg = g.create_group("conv1")
        lg.create_dataset("conv1/kernel:0",
                          data=np.zeros((7, 7, 3, 64), np.float32))
        lg.attrs["weight_names"] = [b"conv1/kernel:0"]
        g.attrs["layer_names"] = [b"conv1"]
    with pytest.raises(ValueError, match="incomplete import"):
        convert.convert_h5(bad, str(tmp_path / "out"))


# -- .h5 drop-in (convert-on-load, VERDICT r2 #7) ---------------------------

def test_checkpoint_path_converts_h5_on_load(fake_h5, tmp_path, monkeypatch):
    """A model dir holding only `.h5` files is accepted directly (reference
    CLI semantics, main.py:58-60): checkpoint_path converts on first load,
    caches the .npz sibling, and reuses it afterwards."""
    import shutil

    model_dir = tmp_path / "models"
    model_dir.mkdir()
    shutil.copy(fake_h5, model_dir / "model_fake_best.h5")
    path = checkpoint.checkpoint_path(str(model_dir), "model_fake_best")
    assert path == str(model_dir / "model_fake_best.npz")
    spec, variables = checkpoint.load(path)
    assert spec.arch == "resnet50_unet"
    # second resolve must hit the cache, not reconvert
    def boom(*a, **k):
        raise AssertionError("reconverted despite fresh cache")
    monkeypatch.setattr("sbb_textline_detection_tpu.models.convert.convert_h5",
                        boom)
    assert checkpoint.checkpoint_path(str(model_dir),
                                      "model_fake_best") == path


def test_checkpoint_path_readonly_dir_falls_back_to_user_cache(
        fake_h5, tmp_path, monkeypatch):
    """An unwritable model dir (simulated: chmod is a no-op for root, the
    uid tests run under) must fall back to the per-dir user cache."""
    import os
    import shutil

    model_dir = tmp_path / "ro_models"
    model_dir.mkdir()
    shutil.copy(fake_h5, model_dir / "model_fake_best.h5")
    monkeypatch.setenv("HOME", str(tmp_path / "home"))
    real_convert = convert.convert_h5

    def deny_model_dir(h5, out_dir, **kw):
        if os.path.abspath(out_dir) == os.path.abspath(str(model_dir)):
            raise PermissionError(f"read-only: {out_dir}")
        return real_convert(h5, out_dir, **kw)

    monkeypatch.setattr(
        "sbb_textline_detection_tpu.models.convert.convert_h5",
        deny_model_dir)
    path = checkpoint.checkpoint_path(str(model_dir), "model_fake_best")
    assert str(tmp_path / "home") in path
    assert os.path.exists(path)
    spec, _ = checkpoint.load(path)
    assert spec.n_classes == 2
    # resolves to the same cached file on the next call
    assert checkpoint.checkpoint_path(str(model_dir),
                                      "model_fake_best") == path


def test_cli_e2e_h5_model_dir(tmp_path, monkeypatch):
    """End-to-end: `sbb_textline_detector_tpu -i page.png -o out -m dir`
    where `dir` holds the three reference-named Keras .h5 checkpoints —
    drop-in parity with the reference CLI (main.py:2162-2171). The run
    must convert on load, produce a valid PAGE-XML, and cache the .npz
    siblings."""
    import dataclasses
    import xml.etree.ElementTree as ET

    from PIL import Image
    from click.testing import CliRunner

    from sbb_textline_detection_tpu import cli
    from sbb_textline_detection_tpu.core.config import (
        DEFAULT_CONFIG, DeskewConfig, ResizePolicy, RuntimeConfig)

    spec = registry.ModelSpec("m", "resnet50_unet", 64, 64, 2)
    variables = jax.tree_util.tree_map(
        np.asarray, registry.init_variables(spec, seed=0))
    model_dir = tmp_path / "models"
    model_dir.mkdir()
    rng = np.random.default_rng(1)
    for name in ("model_page_mixed_best", "model_strukturerkennung",
                 "model_textline_new"):
        build_fake_keras_h5(str(model_dir / f"{name}.h5"), variables, rng,
                            with_model_config=(64, 64))

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        resize=ResizePolicy(100, 64, 1.0),
        deskew=DeskewConfig(coarse_steps=8, vertical_steps=4),
        runtime=RuntimeConfig(batch_buckets=(2,), grid_bucket=1, grid_bucket_x=1,
                              deskew_canvas=256, tile_chunk=4))
    monkeypatch.setattr(cli, "DEFAULT_CONFIG", cfg)

    img_path = tmp_path / "page.png"
    Image.fromarray(np.full((80, 60, 3), 255, np.uint8)).save(img_path)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    res = CliRunner().invoke(cli.main, ["-i", str(img_path), "-o",
                                        str(out_dir), "-m", str(model_dir)])
    assert res.exit_code == 0, res.output
    xml_path = out_dir / "page.xml"
    assert xml_path.exists()
    root = ET.parse(str(xml_path)).getroot()
    assert root.tag.endswith("PcGts")
    # converted checkpoints were cached next to the .h5 files
    for name in ("model_page_mixed_best", "model_strukturerkennung",
                 "model_textline_new"):
        assert (model_dir / f"{name}.npz").exists()
