"""Pipelined batch execution tests: process_batch must produce exactly the
same results as sequential process_image, in input order."""

import dataclasses
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from sbb_textline_detection_tpu.core.config import (
    DEFAULT_CONFIG, DeskewConfig, ResizePolicy, RuntimeConfig)
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector

from tests.test_detector_e2e import (
    FakePageModel, FakeRegionModel, FakeTextlineModel, _synthetic_page)


@pytest.fixture(scope="module")
def detector():
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        resize=ResizePolicy(100, 840, 1.2),
        deskew=DeskewConfig(coarse_steps=20, vertical_steps=10),
        runtime=RuntimeConfig(deskew_canvas=256))
    return TextlineDetector(
        ModelBundle(FakePageModel(), FakeRegionModel(), FakeTextlineModel()),
        cfg)


def _pages():
    rng = np.random.default_rng(3)
    pages = [_synthetic_page(), _synthetic_page(600, 440),
             np.full((400, 300, 3), 255, np.uint8)]
    pages.append(rng.integers(0, 255, (300, 220, 3)).astype(np.uint8))
    return pages


def test_batch_matches_sequential(detector):
    pages = _pages()
    seq = [detector.process_image(p, f"p{i}.png")
           for i, p in enumerate(pages)]
    batched = list(detector.process_batch(
        (p, f"p{i}.png") for i, p in enumerate(pages)))
    assert len(batched) == len(seq)
    for a, b in zip(seq, batched):
        assert len(a.contours) == len(b.contours)
        assert a.slopes == b.slopes
        for ca, cb in zip(a.contours, b.contours):
            np.testing.assert_array_equal(ca, cb)
        xa = ET.tostring(a.xml_tree.getroot())
        xb = ET.tostring(b.xml_tree.getroot())
        # timestamps differ; compare structure without Metadata
        import re
        strip = lambda s: re.sub(rb"<Metadata>.*?</Metadata>", b"", s,
                                 flags=re.S)
        assert strip(xa) == strip(xb)


def test_batch_empty_iterable(detector):
    assert list(detector.process_batch(iter([]))) == []


def test_warm_up_then_results_unchanged(detector):
    """warm_up pre-loads device programs in parallel threads; results after
    it must match a cold run bit for bit (it must only warm caches)."""
    pages = _pages()[:2]
    cold = [detector.process_image(p, f"c{i}.png")
            for i, p in enumerate(pages)]
    timings = detector.warm_up(height=500, width=380)
    fixed = {"page_model", "dual_multi", "dual_single", "deskew",
             "headless", "fullfused"}
    raw_jobs = {k for k in timings if k.startswith("raw_single_")}
    # raw_single_<w> jobs exist per crop-grid bucket only when the bundle
    # can run the raw path (these FAKE models cannot)
    assert set(timings) == fixed | raw_jobs
    assert all(v >= 0.0 for v in timings.values())
    warm = [detector.process_image(p, f"w{i}.png")
            for i, p in enumerate(pages)]
    for a, b in zip(cold, warm):
        assert len(a.contours) == len(b.contours)
        assert a.slopes == b.slopes
        for ca, cb in zip(a.contours, b.contours):
            np.testing.assert_array_equal(ca, cb)


def test_run_files_writes_in_order(detector, tmp_path):
    from PIL import Image
    paths = []
    for i, p in enumerate(_pages()[:2]):
        f = tmp_path / f"scan_{i}.png"
        Image.fromarray(p).save(str(f))
        paths.append(str(f))
    outs = list(detector.run_files(paths, str(tmp_path)))
    assert [o.endswith(f"scan_{i}.xml") for i, o in enumerate(outs)] == [True, True]
    for o in outs:
        assert ET.parse(o).getroot().tag.endswith("PcGts")


def test_batch_workers_1_matches_2(detector):
    """Results are identical whichever worker count overlaps the device
    phases (runtime.device_phase_workers): the scheduling changes only
    timing, never values."""
    pages = _pages()
    want = list(detector.process_batch(
        (p, f"p{i}.png") for i, p in enumerate(pages)))
    cfg1 = dataclasses.replace(
        detector.config, runtime=dataclasses.replace(
            detector.config.runtime, device_phase_workers=1))
    det1 = TextlineDetector(detector.models, cfg1)
    got = list(det1.process_batch(
        (p, f"p{i}.png") for i, p in enumerate(pages)))
    assert len(got) == len(want)
    for a, b in zip(want, got):
        assert a.slopes == b.slopes
        assert len(a.contours) == len(b.contours)
        for ca, cb in zip(a.contours, b.contours):
            np.testing.assert_array_equal(ca, cb)


def test_prefetch_thread_death_drops_no_pages():
    """Degrade-don't-crash holds per page in batch mode (main.py:2152-2156):
    if the page-box prefetch THREAD dies (not just the batched forward —
    that already degrades to box-less items), every input page must still
    come out of process_batch as a PageResult. A KeyboardInterrupt escapes
    the worker's inner `except Exception` and exercises the thread-death
    drain path."""
    from sbb_textline_detection_tpu.models import registry, runner
    from tests.test_models import TINY

    variables = registry.init_variables(TINY, seed=0)
    rt = RuntimeConfig(batch_buckets=(2, 4, 8), deskew_canvas=256,
                       page_box_batch=4)
    models = ModelBundle(
        runner.SegmentationModel(TINY, variables, rt),
        runner.SegmentationModel(TINY, variables, rt),
        runner.SegmentationModel(TINY, variables, rt))
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        resize=ResizePolicy(300, 160, 1.0),
        deskew=DeskewConfig(coarse_steps=6, vertical_steps=4),
        runtime=rt)
    det = TextlineDetector(models, cfg)
    assert det._page_box_batch_size() == 4  # the path under test is live

    pages = [(_synthetic_page(210, 170), f"p{i}.png") for i in range(6)]

    def dying(smalls, pad_to=None):
        raise KeyboardInterrupt("injected prefetch-thread death")

    orig = models.page.predict_smalls_prescaled_batch
    models.page.predict_smalls_prescaled_batch = dying
    try:
        results = list(det.process_batch(iter(pages)))
    finally:
        models.page.predict_smalls_prescaled_batch = orig
    assert len(results) == len(pages)
    for r in results:
        assert r.xml_tree.getroot().tag.endswith("PcGts")


def test_failed_predispatch_not_reattempted():
    """When host_phase_dispatch already attempted (and failed -> None
    handle) the resident deskew dispatch, host_phase must not re-run it —
    the result still comes out valid via the host fallback, with exactly
    one dispatch attempt. Uses real tiny models so the device textline
    handle exists (fakes would skip the dispatch entirely)."""
    from sbb_textline_detection_tpu.models import registry, runner
    from sbb_textline_detection_tpu.pipeline import stages
    from tests.test_models import TINY

    variables = registry.init_variables(TINY, seed=0)
    rt = RuntimeConfig(batch_buckets=(2, 4, 8), deskew_canvas=256)
    models = ModelBundle(
        runner.SegmentationModel(TINY, variables, rt),
        runner.SegmentationModel(TINY, variables, rt),
        runner.SegmentationModel(TINY, variables, rt))
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        resize=ResizePolicy(300, 160, 1.0),
        deskew=DeskewConfig(coarse_steps=6, vertical_steps=4),
        runtime=rt)
    det = TextlineDetector(models, cfg)
    rng = np.random.default_rng(61)  # this seed yields >=1 region
    page = np.where(rng.uniform(size=(210, 170, 3)) < 0.35, 40, 230
                    ).astype(np.uint8)
    st = det.device_phase(page, "p.png")
    assert st.textline_dev is not None  # the guard path under test
    want = det.host_phase(st, det.host_phase_dispatch(st))
    assert len(want.contours) >= 1

    calls = []
    orig = stages.deskew_dispatch_resident

    def failing(boxes, engine, textline_dev):
        calls.append(1)
        return None  # what the real wrapper returns on a caught failure

    stages.deskew_dispatch_resident = failing
    try:
        st2 = det.device_phase(page, "p.png")
        pre = det.host_phase_dispatch(st2)
        assert pre is not None and pre["handle"] is None
        assert len(calls) == 1
        got = det.host_phase(st2, pre)
        # host_phase must not have re-attempted the failed dispatch
        assert len(calls) == 1
    finally:
        stages.deskew_dispatch_resident = orig
    assert len(got.contours) == len(want.contours)
    # host fallback recomputes the same slopes the resident path found
    assert got.slopes == want.slopes
