"""SPMD inference tests on the virtual 8-device CPU mesh: the tile batch
of one page shards across the mesh's data axis inside the one-dispatch
tiled program (SURVEY §2.4's multi-chip spatial parallelism)."""

import numpy as np
import jax
import pytest

from sbb_textline_detection_tpu.core.config import RuntimeConfig
from sbb_textline_detection_tpu.models import registry, runner
from sbb_textline_detection_tpu.parallel import mesh as mesh_mod

from tests.test_models import TINY, _PointwiseStub


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    return mesh_mod.make_mesh(devices[:8], model_parallel=1)


def test_sharded_tiled_matches_single_device_stub(mesh8):
    """Pointwise stub network: sharded and unsharded tiled paths must be
    bit-identical (any partition/gather error shows up as a pixel diff)."""
    variables = registry.init_variables(TINY, seed=0)
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    m_single = runner.SegmentationModel(TINY, variables, rt)
    m_shard = runner.SegmentationModel(TINY, variables, rt, mesh=mesh8)
    for m in (m_single, m_shard):
        m._module = _PointwiseStub()
        m._tiled_cache.clear()
    rng = np.random.default_rng(0)
    for shape in [(104, 156), (200, 53), (150, 131)]:
        img = rng.integers(0, 255, shape + (3,)).astype(np.uint8)
        np.testing.assert_array_equal(
            m_shard.predict_tiled(img), m_single.predict_tiled(img),
            err_msg=str(shape))
        np.testing.assert_array_equal(
            m_shard.predict_tiled(img),
            (img[:, :, 0] > 127.5).astype(np.uint8))


def test_sharded_tiled_real_model_runs(mesh8):
    variables = registry.init_variables(TINY, seed=1)
    m = runner.SegmentationModel(TINY, variables,
                                 RuntimeConfig(batch_buckets=(2,)),
                                 mesh=mesh8)
    img = np.random.default_rng(2).integers(
        0, 255, (104, 104, 3)).astype(np.uint8)
    out = m.predict_tiled(img)
    assert out.shape == (104, 104)
    np.testing.assert_array_equal(out, m.predict_tiled(img))  # deterministic


def test_bundle_accepts_mesh(mesh8):
    bundle = runner.ModelBundle.random_init(
        RuntimeConfig(batch_buckets=(2,)),
        specs={"page": TINY, "region": TINY, "textline": TINY}, mesh=mesh8)
    assert bundle.region.mesh is mesh8


def test_multi_page_fused_sharded_matches_unsharded(mesh8):
    """Data-parallel pages (SURVEY §2.4): the multi-page fused program with
    the pages x tiles batch sharded over the mesh's data axis must match
    the unsharded multi-page program bit for bit. Pointwise stub network,
    as in the single-page sharded test: a real conv's sharded reductions
    reassociate float32 sums, so bit-exactness is only a meaningful claim
    for the surrounding index machinery (tiling/stitch/Otsu/pack)."""
    variables = registry.init_variables(TINY, seed=0)
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    models = []
    for mesh in (None, mesh8):
        m_r = runner.SegmentationModel(TINY, variables, rt, mesh=mesh)
        m_t = runner.SegmentationModel(TINY, variables, rt, mesh=mesh)
        for m in (m_r, m_t):
            m._module = _PointwiseStub()
            m._tiled_cache.clear()
        models.append((m_r, m_t))
    rng = np.random.default_rng(9)
    pages = [np.where(rng.uniform(size=(120, 100, 3)) < 0.4, 30, 220
                      ).astype(np.uint8) for _ in range(2)]
    (m_r, m_t), (m_r_s, m_t_s) = models
    got = m_r_s.predict_dual_tiled_multi(m_t_s, pages, mask_class=1)
    want = m_r.predict_dual_tiled_multi(m_t, pages, mask_class=1)
    for i in range(2):
        np.testing.assert_array_equal(got[i][0], want[i][0])
        np.testing.assert_array_equal(got[i][1], want[i][1])


def test_dualhead_fused_sharded_matches_unsharded(mesh8):
    """The dual-head branch of the fused forward (one shared-trunk pass
    serving both roles) under the mesh's data axis must match the
    unsharded dual-head program bit for bit — and a pointwise stub pins
    the 2-channel input wiring: head 0 reads the raw01 channel, head 1
    the page-Otsu binarized channel."""
    import jax.numpy as jnp

    from sbb_textline_detection_tpu.ops import threshold

    class _DualStub:
        def apply(self, variables, x):
            raw = (x[..., 0] > 0.5).astype(jnp.float32)
            binz = (x[..., 1] > 0.5).astype(jnp.float32)
            return jnp.stack([1.0 - raw, raw, jnp.zeros_like(raw),
                              1.0 - binz, binz], axis=-1)

    spec = registry.ModelSpec("tiny_dual", "tpu_unet", 64, 64, 5,
                              widths=(8, 16), heads=(3, 2), in_channels=2)
    variables = registry.init_variables(spec, seed=0)
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    rng = np.random.default_rng(21)
    pages = [np.where(rng.uniform(size=(120, 100, 3)) < 0.4, 30, 220
                      ).astype(np.uint8) for _ in range(2)]
    outs = []
    for mesh in (None, mesh8):
        m = runner.SegmentationModel(spec, variables, rt, mesh=mesh)
        m._module = _DualStub()
        m._tiled_cache.clear()
        outs.append(m.predict_dual_tiled_multi(m, pages, mask_class=1))
    want, got = outs
    for i, page in enumerate(pages):
        np.testing.assert_array_equal(got[i][0], want[i][0])
        np.testing.assert_array_equal(got[i][1], want[i][1])
        # stub semantics: region head = raw01 threshold, textline head =
        # page-scope Otsu binarization of channel 0
        np.testing.assert_array_equal(
            want[i][0], (page[:, :, 0] > 127.5).astype(np.uint8))
        t = threshold.otsu_threshold_host(page[:, :, 0])
        np.testing.assert_array_equal(
            want[i][1], (page[:, :, 0].astype(np.int32) > int(t)
                         ).astype(np.uint8))


def test_mesh_auto_group_size(mesh8):
    """runtime.mesh_auto_group: process_batch's group size auto-raises to
    the mesh data-axis size under a multi-chip mesh, stays at the
    configured pages_per_dispatch (1, per the single-chip A/B) without."""
    import dataclasses

    from sbb_textline_detection_tpu.core.config import (DEFAULT_CONFIG,
                                                        RuntimeConfig)
    from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector

    rt = RuntimeConfig(batch_buckets=(2,), deskew_canvas=256)
    bundle_mesh = runner.ModelBundle.random_init(
        rt, specs={"page": TINY, "region": TINY, "textline": TINY},
        mesh=mesh8)
    bundle_single = runner.ModelBundle.random_init(
        rt, specs={"page": TINY, "region": TINY, "textline": TINY})
    cfg = dataclasses.replace(DEFAULT_CONFIG, runtime=rt)
    assert TextlineDetector(bundle_mesh, cfg)._effective_group_size() == 8
    assert TextlineDetector(bundle_single, cfg)._effective_group_size() == 1
    # explicit opt-out wins
    cfg_off = dataclasses.replace(
        cfg, runtime=dataclasses.replace(rt, mesh_auto_group=False))
    assert TextlineDetector(bundle_mesh, cfg_off)._effective_group_size() == 1


def test_mesh_auto_group_batch_uses_grouped_path(mesh8):
    """Under the mesh, process_batch must hand device_phase_group whole
    groups of data-axis size (the grouped fused program), not 1-page
    groups."""
    import dataclasses

    from sbb_textline_detection_tpu.core.config import (DEFAULT_CONFIG,
                                                        RuntimeConfig)
    from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector

    rt = RuntimeConfig(batch_buckets=(2,), deskew_canvas=256)
    bundle = runner.ModelBundle.random_init(
        rt, specs={"page": TINY, "region": TINY, "textline": TINY},
        mesh=mesh8)
    cfg = dataclasses.replace(DEFAULT_CONFIG, runtime=rt)
    det = TextlineDetector(bundle, cfg)
    seen = []

    def spy(items):
        # bypass the heavy k=8 fused compile: the assertion under test is
        # the GROUPING, handled entirely by process_batch before this call
        from sbb_textline_detection_tpu.pipeline import stages
        from sbb_textline_detection_tpu.pipeline.detector import _DeviceState
        items = list(items)
        seen.append(len(items))
        return [_DeviceState(name, stages.ScaledImage(img, img.shape[0],
                                                      img.shape[1], 1.0, 1.0),
                             img, [0, img.shape[0], 0, img.shape[1]],
                             np.zeros((4, 2)), None, None, {}, {}, 0.0)
                for img, name in items]

    det.device_phase_group = spy
    rng = np.random.default_rng(3)
    pages = [(rng.integers(0, 255, (60, 50, 3)).astype(np.uint8), f"p{i}")
             for i in range(9)]
    results = list(det.process_batch(iter(pages)))
    assert len(results) == 9
    assert seen == [8, 1]
