"""Dual-head flagship tests (registry.DUALHEAD_SPEC).

One shared-trunk TpuUnet with a (region, textline) head split serves both
segmentation roles of the pipeline in ONE forward (the fused dual paths'
dual-head branch, runner._fused_forward_pair). These tests pin:

  * the fused program's exact input/forward contract against an
    independent numpy+flax oracle (pad -> page-scope Otsu -> tiles ->
    [raw01, binarized] -> per-head argmax -> slab stitch -> crop);
  * multi-page / resident-path bit-equality with the single-page program;
  * checkpoint round-trip of the head metadata and from_dir detection;
  * joint-task training (loss decreases) and the synthetic batch contract;
  * a full detector e2e run on a dual-head bundle.
"""

import numpy as np
import pytest

from sbb_textline_detection_tpu.core.config import RuntimeConfig
from sbb_textline_detection_tpu.models import checkpoint, registry, runner

DUAL_TINY = registry.ModelSpec("tiny_dual", "tpu_unet", 64, 64, 5,
                               widths=(8, 16), heads=(3, 2), in_channels=2)
PAGE_TINY = registry.ModelSpec("tiny_page", "tpu_unet", 64, 64, 2,
                               widths=(8, 16))


@pytest.fixture(scope="module")
def dual_model():
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    return runner.SegmentationModel(
        DUAL_TINY, registry.init_variables(DUAL_TINY, seed=0), rt)


def test_heads_must_sum_to_classes():
    with pytest.raises(ValueError):
        registry.ModelSpec("bad", "tpu_unet", 64, 64, 5, heads=(3, 3))


def test_dualhead_fused_matches_oracle(dual_model):
    """predict_dual_tiled on a dual-head model == an independent host
    recomputation of the documented contract."""
    import jax
    import jax.numpy as jnp

    from sbb_textline_detection_tpu.models.runner import _pad_white
    from sbb_textline_detection_tpu.ops import threshold

    m = dual_model
    rng = np.random.default_rng(3)
    img = np.where(rng.uniform(size=(150, 131, 3)) < 0.3, 40, 230
                   ).astype(np.uint8)
    got_r, got_t = m.predict_dual_tiled(m, img)

    h, w = img.shape[:2]
    mh, mw = m.input_hw
    margin = int(0.1 * mw)
    sh, sw = mh - 2 * margin, mw - 2 * margin
    ny, nx = m.grid_for(h, w)
    padded = _pad_white(img, margin, ny * sh - h + margin,
                        margin, nx * sw - w + margin)
    t = threshold.otsu_threshold_host(img[:, :, 0])

    module = registry.build_module(DUAL_TINY)
    want_r = np.zeros((ny * sh, nx * sw), np.uint8)
    want_t = np.zeros((ny * sh, nx * sw), np.uint8)
    for j in range(ny):
        for i in range(nx):
            tile = padded[j * sh:j * sh + mh, i * sw:i * sw + mw]
            raw = tile[:, :, 0].astype(np.float32) / 255.0
            binz = (tile[:, :, 0].astype(np.int32) > int(t)
                    ).astype(np.float32)
            x = jnp.asarray(np.stack([raw, binz], axis=-1)[None])
            logits = np.asarray(jax.jit(module.apply)(m.variables, x))[0]
            lr = np.argmax(logits[..., :3], axis=-1).astype(np.uint8)
            lt = np.argmax(logits[..., 3:], axis=-1).astype(np.uint8)
            want_r[j * sh:(j + 1) * sh, i * sw:(i + 1) * sw] = \
                lr[margin:margin + sh, margin:margin + sw]
            want_t[j * sh:(j + 1) * sh, i * sw:(i + 1) * sw] = \
                lt[margin:margin + sh, margin:margin + sw]
    np.testing.assert_array_equal(got_r, want_r[:h, :w])
    np.testing.assert_array_equal(got_t, want_t[:h, :w])
    assert got_r.max() <= 2 and got_t.max() <= 1


def test_dualhead_multi_matches_single(dual_model):
    m = dual_model
    rng = np.random.default_rng(5)
    pages = [
        np.where(rng.uniform(size=(150, 131, 3)) < 0.3, 40, 230
                 ).astype(np.uint8),
        np.where(rng.uniform(size=(155, 140, 3)) < 0.5, 10, 250
                 ).astype(np.uint8),
    ]
    assert len({m.grid_for(p.shape[0], p.shape[1]) for p in pages}) == 1
    morph = (("erode", 3, 1),)
    post = (("open", 3, 1),)
    multi = m.predict_dual_tiled_multi(m, pages, morph=morph, mask_class=1,
                                       post_morph=post)
    for i, page in enumerate(pages):
        mask_s, lines_s = m.predict_dual_tiled(
            m, page, morph=morph, mask_class=1, post_morph=post)
        np.testing.assert_array_equal(multi[i][0], mask_s,
                                      err_msg=f"page {i} region")
        np.testing.assert_array_equal(multi[i][1], lines_s,
                                      err_msg=f"page {i} textline")
    # with a class mask and the 2-wide textline head, packing is 1-bit
    assert set(np.unique(multi[0][0])) <= {0, 1}
    assert set(np.unique(multi[0][1])) <= {0, 1}


def test_dualhead_resident_matches_classic(dual_model):
    m = dual_model
    rng = np.random.default_rng(7)
    scaled = np.where(rng.uniform(size=(160, 130, 3)) < 0.35, 40, 230
                      ).astype(np.uint8)
    crop = scaled[12:142, 5:115]
    morph = (("erode", 5, 1), ("dilate", 5, 2))
    post = (("open", 5, 1), ("close", 5, 1))
    want = m.predict_dual_tiled(m, crop, morph=morph, mask_class=1,
                                post_morph=post)
    got = m.predict_dual_tiled_resident(
        m, [m.upload_canvas(scaled)], [[12, 5, 130, 110]],
        morph=morph, mask_class=1, post_morph=post)[0]
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_dualhead_checkpoint_roundtrip(tmp_path):
    variables = registry.init_variables(DUAL_TINY, seed=1)
    path = str(tmp_path / "model_dualhead.npz")
    checkpoint.save(path, DUAL_TINY,
                    __import__("jax").tree_util.tree_map(np.asarray,
                                                         variables))
    spec, loaded = checkpoint.load(path)
    assert spec == DUAL_TINY
    assert spec.heads == (3, 2) and spec.in_channels == 2


def test_from_dir_prefers_dualhead(tmp_path):
    import jax

    as_np = lambda v: jax.tree_util.tree_map(np.asarray, v)
    checkpoint.save(str(tmp_path / "model_page_mixed_best.npz"), PAGE_TINY,
                    as_np(registry.init_variables(PAGE_TINY, seed=0)))
    checkpoint.save(str(tmp_path / "model_dualhead.npz"), DUAL_TINY,
                    as_np(registry.init_variables(DUAL_TINY, seed=1)))
    bundle = runner.ModelBundle.from_dir(
        str(tmp_path), RuntimeConfig(batch_buckets=(2, 4)))
    assert bundle.is_dual_head
    assert bundle.region is bundle.textline
    assert bundle.region.spec.heads == (3, 2)


def test_dualhead_batch_contract():
    from sbb_textline_detection_tpu.utils import synthetic

    rng = np.random.default_rng(0)
    imgs, labels = synthetic.dualhead_batch(rng, 4, 64, 64)
    assert imgs.shape == (4, 64, 64, 2) and labels.shape == (4, 64, 64, 2)
    assert imgs.dtype == np.float32 and labels.dtype == np.int32
    # channel 1 is strictly binary; labels bounded by the head widths
    assert set(np.unique(imgs[..., 1])) <= {0.0, 1.0}
    assert labels[..., 0].max() <= 2 and labels[..., 1].max() <= 1


@pytest.mark.parametrize("steps", [6])
def test_dualhead_training_loss_decreases(steps):
    from sbb_textline_detection_tpu.training import train
    from sbb_textline_detection_tpu.utils import synthetic

    spec = registry.ModelSpec("train_dual", "tpu_unet", 32, 32, 5,
                              widths=(8, 16), heads=(3, 2), in_channels=2)
    trainer = train.Trainer(spec, learning_rate=3e-3, seed=0)
    rng = np.random.default_rng(0)

    def data():
        while True:
            yield synthetic.dualhead_batch(rng, 4, 32, 32)

    losses = trainer.train(data(), steps)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_detector_e2e_dualhead(tmp_path):
    """Full pipeline on a dual-head bundle: tiny trained-free (random)
    models, real fused+resident device paths, must emit valid PAGE-XML."""
    from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
    from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector

    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    page_m = runner.SegmentationModel(
        PAGE_TINY, registry.init_variables(PAGE_TINY, seed=0), rt)
    dual_m = runner.SegmentationModel(
        DUAL_TINY, registry.init_variables(DUAL_TINY, seed=1), rt)
    bundle = runner.ModelBundle(page_m, dual_m, dual_m)
    assert bundle.is_dual_head

    rng = np.random.default_rng(9)
    img = np.full((300, 240, 3), 235, np.uint8)
    for y in range(40, 260, 24):
        img[y:y + 10, 30:210] = 25
    det = TextlineDetector(bundle, DEFAULT_CONFIG)
    res = det.process_image(img, "dual.png")
    out = res.write(str(tmp_path), "dual")
    import xml.etree.ElementTree as ET

    root = ET.parse(out).getroot()
    assert root.tag.endswith("PcGts")


def test_from_dir_rejects_headless_dualhead_checkpoint(tmp_path):
    """A checkpoint NAMED as the dual-head model but carrying no head
    split must fail loudly (a silently mis-decoded head slice would
    degrade every page)."""
    import jax

    as_np = lambda v: jax.tree_util.tree_map(np.asarray, v)
    checkpoint.save(str(tmp_path / "model_page_mixed_best.npz"), PAGE_TINY,
                    as_np(registry.init_variables(PAGE_TINY, seed=0)))
    bad = registry.ModelSpec("tiny5", "tpu_unet", 64, 64, 5,
                             widths=(8, 16))
    checkpoint.save(str(tmp_path / "model_dualhead.npz"), bad,
                    as_np(registry.init_variables(bad, seed=1)))
    with pytest.raises(ValueError, match="head split"):
        runner.ModelBundle.from_dir(str(tmp_path),
                                    RuntimeConfig(batch_buckets=(2, 4)))
