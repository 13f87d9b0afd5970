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
