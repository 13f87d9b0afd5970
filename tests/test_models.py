"""Model family, checkpoint I/O, h5 import, and inference-runner tests.

Tiny geometries/widths keep CPU compile times low; the architectures are
size-agnostic.
"""

import numpy as np
import pytest

from sbb_textline_detection_tpu.models import checkpoint, registry, runner

TINY = registry.ModelSpec("tiny", "tpu_unet", 64, 64, 3, widths=(8, 16))


def _tiny_model():
    variables = registry.init_variables(TINY, seed=0)
    from sbb_textline_detection_tpu.core.config import RuntimeConfig
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    return runner.SegmentationModel(TINY, variables, rt)


def test_tpu_unet_output_shape():
    model = _tiny_model()
    batch = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    labels = model.predict_labels(batch)
    assert labels.shape == (2, 64, 64)
    assert labels.dtype == np.uint8
    assert labels.max() < TINY.n_classes


def test_predict_labels_padding_does_not_leak():
    # Same bucket (4): a padded 3-batch must equal the first 3 of a 4-batch;
    # per-sample outputs are independent of the other batch entries.
    model = _tiny_model()
    rng = np.random.default_rng(1)
    batch4 = rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    out4 = model.predict_labels(batch4)
    out3 = model.predict_labels(batch4[:3])
    np.testing.assert_array_equal(out3, out4[:3])
    # determinism on repeat
    np.testing.assert_array_equal(out4, model.predict_labels(batch4))


def test_predict_whole_and_tiled_shapes():
    model = _tiny_model()
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (150, 131, 3)).astype(np.uint8)
    whole = model.predict_whole(img)
    assert whole.shape == (150, 131)
    tiled = model.predict_tiled(img)
    assert tiled.shape == (150, 131)
    # smaller-than-model image degrades gracefully in tiled mode
    small = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    assert model.predict_tiled(small).shape == (40, 40)


class _PointwiseStub:
    """Stand-in module whose prediction is a pure per-pixel function
    (class = pixel > 127), so tile extraction + slab stitching + packing +
    cropping must reproduce the thresholded image EXACTLY regardless of the
    grid — any indexing error in the device path shows up as a diff."""

    def apply(self, variables, x):
        import jax.numpy as jnp
        # 0.5 sits between 127/255 and 128/255 — immune to f32 rounding of
        # the normalization, unlike a threshold of exactly 127/255.
        b = (x[..., 0] > 0.5).astype(jnp.float32)
        return jnp.stack([1.0 - b, b], axis=-1)


def test_predict_tiled_slab_geometry_exact():
    model = _tiny_model()
    model._module = _PointwiseStub()
    model._tiled_cache.clear()
    rng = np.random.default_rng(5)
    for shape in [(104, 156), (150, 131), (64, 64), (40, 40), (200, 53)]:
        img = rng.integers(0, 255, shape + (3,)).astype(np.uint8)
        out = model.predict_tiled(img)
        np.testing.assert_array_equal(
            out, (img[:, :, 0] > 127.5).astype(np.uint8), err_msg=str(shape))


def test_predict_tiled_deterministic():
    """Same page twice -> identical packed/unpacked output (no RNG, no
    batch-position dependence through the chunked lax.map)."""
    model = _tiny_model()
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (104, 156, 3)).astype(np.uint8)
    np.testing.assert_array_equal(model.predict_tiled(img),
                                  model.predict_tiled(img))


def test_predict_tiled_fused_otsu_matches_host_otsu():
    """pre_otsu=True must binarize exactly like the host otsu_copy
    (threshold over the unpadded page) before the forward; with the
    pointwise stub the output IS the binarization."""
    from sbb_textline_detection_tpu.ops import threshold
    model = _tiny_model()
    model._module = _PointwiseStub()
    model._tiled_cache.clear()
    rng = np.random.default_rng(7)
    # bimodal page-like values so the otsu threshold is meaningful
    img = np.where(rng.uniform(size=(104, 156, 3)) < 0.3, 40, 230
                   ).astype(np.uint8)
    out = model.predict_tiled(img, pre_otsu=True)
    ref = (threshold.otsu_copy_host(img)[:, :, 0] > 127.5).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_predict_tiled_fused_morph_matches_host_morph():
    from sbb_textline_detection_tpu.ops import morphology
    model = _tiny_model()
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (104, 104, 3)).astype(np.uint8)
    fused = model.predict_tiled(
        img, morph=(("erode", 3, 1), ("dilate", 3, 2)))
    base = model.predict_tiled(img)
    ref = morphology.dilate_host(
        morphology.erode_host(base, 3, 1), 3, 2)
    np.testing.assert_array_equal(fused, ref)


def test_predict_tiled_fused_mask_matches_host_pipeline():
    """mask_class + post_morph must equal the host route: label morph,
    class mask, OPEN, CLOSE (reference main.py:2074-2075 + 457-464)."""
    from sbb_textline_detection_tpu.ops import morphology
    model = _tiny_model()
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (104, 104, 3)).astype(np.uint8)
    morph = (("erode", 3, 1), ("dilate", 3, 2))
    fused = model.predict_tiled(img, morph=morph, mask_class=1,
                                post_morph=(("open", 3, 1), ("close", 3, 1)))
    labels = model.predict_tiled(img, morph=morph)
    ref = (labels == 1).astype(np.uint8)
    ref = morphology.morph_open_host(ref, 3)
    ref = morphology.morph_close_host(ref, 3)
    np.testing.assert_array_equal(fused, ref)
    assert set(np.unique(fused)) <= {0, 1}


def test_grid_bucket_invariance():
    """Different grid_bucket settings change only which compiled program
    runs, never the output (padding is white and cropped away)."""
    from sbb_textline_detection_tpu.core.config import RuntimeConfig
    variables = registry.init_variables(TINY, seed=0)
    m1 = runner.SegmentationModel(
        TINY, variables, RuntimeConfig(grid_bucket=1))
    m4 = runner.SegmentationModel(
        TINY, variables, RuntimeConfig(grid_bucket=4))
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (150, 131, 3)).astype(np.uint8)
    np.testing.assert_array_equal(m1.predict_tiled(img),
                                  m4.predict_tiled(img))


def test_checkpoint_roundtrip(tmp_path):
    variables = registry.init_variables(TINY, seed=3)
    path = str(tmp_path / "tiny.npz")
    checkpoint.save(path, TINY, variables)
    spec2, tree2 = checkpoint.load(path)
    assert spec2 == TINY
    import jax
    leaves1 = jax.tree_util.tree_leaves(variables)
    leaves2 = jax.tree_util.tree_leaves(tree2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # loaded tree drives the model identically
    from sbb_textline_detection_tpu.core.config import RuntimeConfig
    m1 = runner.SegmentationModel(TINY, variables, RuntimeConfig(batch_buckets=(2,)))
    m2 = runner.SegmentationModel(TINY, tree2, RuntimeConfig(batch_buckets=(2,)))
    img = np.random.default_rng(4).integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    np.testing.assert_array_equal(m1.predict_labels(img), m2.predict_labels(img))


def test_checkpoint_path_strips_h5():
    assert checkpoint.checkpoint_path("/m", "model_x.h5") == "/m/model_x.npz"
    assert checkpoint.checkpoint_path("/m", "model_x") == "/m/model_x.npz"


@pytest.mark.slow
def test_h5_import_fills_resnet50_unet(tmp_path):
    """Synthetic Keras-layout .h5 with canonical ResNet50 + decoder layer
    names fills the flax tree completely (builder shared with the converter
    tests, tests/h5_fixture.py)."""
    import jax

    from sbb_textline_detection_tpu.models import h5_import
    from tests.h5_fixture import build_fake_keras_h5

    spec = registry.ModelSpec("r50", "resnet50_unet", 64, 64, 2)
    variables = registry.init_variables(spec, seed=0)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    path = str(tmp_path / "fake.h5")
    build_fake_keras_h5(path, variables, np.random.default_rng(0))

    out, report = h5_import.import_h5(path, variables)
    assert report.unmapped_source == []
    assert report.unfilled_target == []
    assert report.complete
    # imported weights actually differ from the random init and run forward
    from sbb_textline_detection_tpu.core.config import RuntimeConfig
    m = runner.SegmentationModel(spec, out, RuntimeConfig(batch_buckets=(1,)))
    img = np.zeros((1, 64, 64, 3), np.uint8)
    labels = m.predict_labels(img)
    assert labels.shape == (1, 64, 64)


def test_predict_dual_tiled_matches_separate_paths():
    """One fused dispatch for (region, textline) must equal the separate
    pre_otsu region pass and raw textline pass bit for bit."""
    variables_r = registry.init_variables(TINY, seed=0)
    variables_t = registry.init_variables(TINY, seed=1)
    from sbb_textline_detection_tpu.core.config import RuntimeConfig
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    m_r = runner.SegmentationModel(TINY, variables_r, rt)
    m_t = runner.SegmentationModel(TINY, variables_t, rt)
    rng = np.random.default_rng(11)
    img = np.where(rng.uniform(size=(150, 131, 3)) < 0.3, 40, 230
                   ).astype(np.uint8)
    morph = (("erode", 3, 1), ("dilate", 3, 2))
    post = (("open", 3, 1), ("close", 3, 1))
    mask_d, lines_d = m_r.predict_dual_tiled(
        m_t, img, morph=morph, mask_class=1, post_morph=post)
    mask_s = m_r.predict_tiled(img, morph=morph, pre_otsu=True,
                               mask_class=1, post_morph=post)
    lines_s = m_t.predict_tiled(img)
    np.testing.assert_array_equal(mask_d, mask_s)
    np.testing.assert_array_equal(lines_d, lines_s)


def test_predict_dual_tiled_multi_matches_per_page():
    """K pages folded into one dispatch must reproduce K single-page fused
    dispatches bit for bit — including pages of different sizes sharing one
    padded group grid, and each page's own Otsu scope."""
    variables_r = registry.init_variables(TINY, seed=0)
    variables_t = registry.init_variables(TINY, seed=1)
    from sbb_textline_detection_tpu.core.config import RuntimeConfig
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    m_r = runner.SegmentationModel(TINY, variables_r, rt)
    m_t = runner.SegmentationModel(TINY, variables_t, rt)
    rng = np.random.default_rng(5)
    # different sizes, same grid bucket (grid_for) — the grouping contract
    pages = [
        np.where(rng.uniform(size=(150, 131, 3)) < 0.3, 40, 230
                 ).astype(np.uint8),
        np.where(rng.uniform(size=(155, 140, 3)) < 0.5, 10, 250
                 ).astype(np.uint8),
        np.where(rng.uniform(size=(149, 130, 3)) < 0.2, 90, 200
                 ).astype(np.uint8),
    ]
    assert len({m_r.grid_for(p.shape[0], p.shape[1]) for p in pages}) == 1
    morph = (("erode", 3, 1), ("dilate", 3, 2))
    post = (("open", 3, 1), ("close", 3, 1))
    multi = m_r.predict_dual_tiled_multi(
        m_t, pages, morph=morph, mask_class=1, post_morph=post)
    assert len(multi) == 3
    for i, page in enumerate(pages):
        mask_s, lines_s = m_r.predict_dual_tiled(
            m_t, page, morph=morph, mask_class=1, post_morph=post)
        np.testing.assert_array_equal(multi[i][0], mask_s,
                                      err_msg=f"page {i} region mask")
        np.testing.assert_array_equal(multi[i][1], lines_s,
                                      err_msg=f"page {i} textline labels")


def test_predict_dual_tiled_binary_pack_path():
    """With a 2-class textline model and a class mask, both canvases travel
    1-bit packed; results must still match the separate unfused paths."""
    tiny2 = registry.ModelSpec("tiny2", "tpu_unet", 64, 64, 2, widths=(8, 16))
    variables_r = registry.init_variables(TINY, seed=0)
    variables_t = registry.init_variables(tiny2, seed=1)
    from sbb_textline_detection_tpu.core.config import RuntimeConfig
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    m_r = runner.SegmentationModel(TINY, variables_r, rt)
    m_t = runner.SegmentationModel(tiny2, variables_t, rt)
    rng = np.random.default_rng(13)
    img = np.where(rng.uniform(size=(150, 131, 3)) < 0.3, 40, 230
                   ).astype(np.uint8)
    mask_d, lines_d = m_r.predict_dual_tiled(m_t, img, mask_class=1)
    np.testing.assert_array_equal(
        mask_d, m_r.predict_tiled(img, pre_otsu=True, mask_class=1))
    np.testing.assert_array_equal(lines_d, m_t.predict_tiled(img))
    assert set(np.unique(mask_d)) <= {0, 1}
    multi = m_r.predict_dual_tiled_multi(m_t, [img, img], mask_class=1)
    np.testing.assert_array_equal(multi[0][0], mask_d)
    np.testing.assert_array_equal(multi[1][1], lines_d)
