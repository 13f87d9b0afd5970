"""Pipeline orchestrator — the equivalent of `textline_detector.run`
(upstream main.py:2056-2157), redesigned:

  * models load once per process (ModelBundle) instead of per page
    (the reference reloads each .h5 and tears down the TF session per stage,
    main.py:216-223/2065/2085/2104);
  * per-stage wall-clock timings are returned as a structured dict (the
    reference prints them, main.py:2144-2151);
  * the degrade-don't-crash contract is preserved: any failure after page
    extraction still produces a valid PAGE-XML (empty regions on total
    failure, main.py:2152-2156);
  * batch mode overlaps the device-bound phase of page N+1 (model
    dispatches) with the host-bound phase of page N (contours, line
    splitting, XML) on a prefetch thread — the reference's only
    parallelism is a per-region multiprocessing fan-out inside one page
    (main.py:1721-1799).
"""

from __future__ import annotations

import functools
import dataclasses
import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, Iterator, List, Optional, Tuple, Union

import numpy as np

LOG = logging.getLogger("sbb_textline_detection_tpu.detector")

from sbb_textline_detection_tpu.core import jaxenv
from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG, PipelineConfig
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.pagexml import writer as pagexml_writer
from sbb_textline_detection_tpu.pipeline import order as order_mod
from sbb_textline_detection_tpu.pipeline import stages
from sbb_textline_detection_tpu.pipeline.deskew import DeskewEngine


def _channels_identical(image: np.ndarray) -> bool:
    """True when an RGB page's three planes are byte-identical — common
    for gray scans stored as RGB. The raw-upload path then ships ONE
    plane (a third of the blocking ~130 MB/s host->device bytes) and the
    device program re-broadcasts it, bit-identically. A strided sample
    rejects genuinely colored pages in ~microseconds; only near-gray
    pages pay the two full-plane compares (~25 ms, vs ~130 ms upload
    saved)."""
    if image.ndim != 3 or image.shape[2] != 3:
        return False
    s = image[::64, ::64]
    if not (np.array_equal(s[..., 0], s[..., 1])
            and np.array_equal(s[..., 0], s[..., 2])):
        return False
    return bool(np.array_equal(image[..., 0], image[..., 1])
                and np.array_equal(image[..., 0], image[..., 2]))


@dataclasses.dataclass
class PageResult:
    xml_tree: "object"
    contours: List[np.ndarray]
    slopes: List[float]
    textlines: List[List[np.ndarray]]
    page_coord: List[int]
    timings: Dict[str, float]
    # Host-observed device dispatch+transfer seconds per stage (subset of
    # `timings`; the remainder of each stage is host work) and the total
    # executed-program FLOPs, from XLA's cost model (utils/stagetime).
    device_timings: Dict[str, float] = dataclasses.field(default_factory=dict)
    flops: float = 0.0

    def write(self, dir_out: str, f_name: str) -> str:
        return pagexml_writer.write_page_xml(self.xml_tree, dir_out, f_name)


@dataclasses.dataclass
class _DeviceState:
    """Everything produced by the device-bound phase of one page."""
    image_filename: str
    scaled: stages.ScaledImage
    image_page: np.ndarray
    page_coord: List[int]
    cont_page: np.ndarray
    region_mask: Optional[np.ndarray]
    textline_mask: Optional[np.ndarray]
    timings: Dict[str, float]
    device_timings: Dict[str, float]
    flops: float
    # On-device textline canvas (the fused program's HBM output) for the
    # resident deskew path; None when a fallback path produced the masks.
    textline_dev: Optional[object] = None
    # Crop-masked textline row projection (runtime.textline_projection):
    # set when the host textline canvas was NOT transferred — reading
    # order consumes this directly, and fallbacks fetch the full canvas
    # lazily from textline_dev.
    textline_proj: Optional[np.ndarray] = None
    # Speculative resident-deskew dispatch (runtime.spec_deskew): a
    # deskew._SpecPending enqueued behind the fused program from DEVICE
    # region boxes, resolved against the host contour boxes in
    # host_phase_dispatch / host_phase (stages.deskew_finalize_spec).
    spec: Optional[object] = None

    def textline_mask_or_fetch(self) -> Optional[np.ndarray]:
        """The host textline mask, fetching it from the device handle when
        only the projection crossed (rare fallback paths)."""
        if self.textline_mask is not None:
            return self.textline_mask
        if self.textline_dev is None:
            return None
        h, w = self.image_page.shape[:2]
        return np.asarray(self.textline_dev)[:h, :w]


def _page_quad(page_coord):
    """cont_page corner quad from [y0, y1, x0, x1] (main.py:409-426)."""
    return np.array([[page_coord[2], page_coord[0]],
                     [page_coord[3], page_coord[0]],
                     [page_coord[3], page_coord[1]],
                     [page_coord[2], page_coord[1]]])


def _box5_page_coords(box5, image_filename):
    """(page_coord, cont_page, bh, bw) from a device [by,bx,h,w,valid]
    box — shared by the headless and fully-fused phases so the coord
    convention (incl. the main.py:406-426 whole-page fallback) lives in
    one place."""
    by, bx, bh, bw, ok = (int(v) for v in box5)
    if not ok:
        LOG.warning("page-border detection found no printspace for "
                    "%s; using the whole page (main.py:406-426 "
                    "fallback)", image_filename)
    page_coord = [by, by + bh, bx, bx + bw]
    return page_coord, _page_quad(page_coord), bh, bw


def _split_fused(masks):
    """(region_mask, textline_mask, textline_dev, textline_proj) from a
    fused-path per-page tuple: 2-tuple = classic, 3-tuple = +device
    handle, 3-tuple with a 1-D second element = projection mode."""
    if len(masks) == 3:
        region, second, dev = masks
        if second is not None and getattr(second, "ndim", 2) == 1:
            return region, None, dev, second
        return region, second, dev, None
    region, second = masks
    return region, second, None, None


class TextlineDetector:
    """Process-lifetime detector: holds the model bundle and deskew engine."""

    def __init__(self, models: ModelBundle,
                 config: PipelineConfig = DEFAULT_CONFIG):
        jaxenv.enable_compilation_cache()
        self.models = models
        self.config = config
        self.deskew = DeskewEngine(
            config.deskew,
            max_canvas=config.runtime.deskew_canvas,
            region_batch=config.runtime.deskew_batch,
            morph_kernel=config.morphology.kernel_size,
            crop_erode_iterations=(
                config.morphology.deskew_crop_erode_iterations),
            buf_max=config.runtime.deskew_buf_max)

    # -- device-bound phase --------------------------------------------------
    def device_phase(self, image: np.ndarray,
                     image_filename: str = "",
                     pre_box=None) -> _DeviceState:
        """Scale, border-crop, and run all three model passes. Prefers the
        raw-upload path (original page up, working canvas materialized on
        device); any failure there falls back to the standard path.
        `pre_box`: optional (box, t_share, d_share, f_share) from the
        batched page-box stage (_page_box_prefetch) — the raw path then
        skips its per-page small forward."""
        cfg = self.config
        if cfg.runtime.resident_upload and \
                getattr(cfg.runtime, "raw_upload", False) and \
                hasattr(self.models.region, "upload_raw") and \
                hasattr(self.models.region,
                        "predict_dual_tiled_resident_raw") and \
                hasattr(self.models.page, "predict_small_prescaled"):
            if getattr(cfg.runtime, "fused_page_box", False) and \
                    getattr(cfg.runtime, "textline_projection", False) and \
                    hasattr(self.models.region,
                            "predict_dual_tiled_resident_raw_fullfused"):
                try:
                    return self._device_phase_raw_fullfused(image,
                                                            image_filename)
                except Exception:
                    LOG.warning("fully-fused device phase failed for %s; "
                                "using the raw-resident path",
                                image_filename, exc_info=True)
            if getattr(cfg.runtime, "device_page_box", False) and \
                    getattr(cfg.runtime, "textline_projection", False) and \
                    hasattr(self.models.page, "page_box_dev") and \
                    hasattr(self.models.region,
                            "predict_dual_tiled_resident_raw_headless"):
                try:
                    return self._device_phase_raw_headless(image,
                                                           image_filename)
                except Exception:
                    LOG.warning("headless device phase failed for %s; "
                                "using the raw-resident path",
                                image_filename, exc_info=True)
            try:
                return self._device_phase_raw(image, image_filename,
                                              pre_box=pre_box)
            except Exception:
                LOG.warning("raw-resident device phase failed for %s; "
                            "using the standard path", image_filename,
                            exc_info=True)
        return self._device_phase_standard(image, image_filename)

    def _device_phase_raw_fullfused(self, image: np.ndarray,
                                    image_filename: str = "") -> _DeviceState:
        """The whole page device phase as ONE dispatch
        (runtime.fused_page_box): page-model input gather, page forward +
        border-box decision, and the fused dual segmentation in a single
        program from the resident raw page. Chain: raw upload -> one
        dispatch -> one blob fetch."""
        return self._device_phase_fetchfree(image, image_filename,
                                            fullfused=True)

    def _device_phase_raw_headless(self, image: np.ndarray,
                                   image_filename: str = "") -> _DeviceState:
        """Fetch-free device phase (runtime.device_page_box): the page
        model's forward AND the border-box decision run on device
        (page_box_dev), the (1, 5) box feeds the fused segmentation
        program as a device array, and the host's FIRST fetch of the page
        is the fused packed blob (which carries the box bytes at its
        tail). Chain: raw upload -> box dispatch -> fused dispatch -> one
        blob fetch — one blocking round trip shorter than
        _device_phase_raw."""
        return self._device_phase_fetchfree(image, image_filename,
                                            fullfused=False)

    def _device_phase_fetchfree(self, image: np.ndarray,
                                image_filename: str,
                                fullfused: bool) -> _DeviceState:
        """Shared body of the two fetch-free phases; they differ only in
        how the box program runs (inline in the fused program vs a
        separate page_box_dev dispatch). The upload (+ box dispatch) is
        attributed to page_extraction and the fused program to
        region_extraction so stage keys stay comparable with the other
        paths."""
        from sbb_textline_detection_tpu.utils import stagetime

        cfg = self.config
        t: Dict[str, float] = {}
        dev: Dict[str, float] = {}
        flops = 0.0
        stagetime.reset()
        t0 = time.time()
        th, tw = stages.working_dims(image, cfg)
        scaled = stages.LazyScaledImage(image, th, tw)
        raw_dev = self.models.region.upload_raw(
            image[:, :, 0] if _channels_identical(image) else image)
        if not fullfused:
            mh, mw = self.models.page.input_hw
            small = stages.page_model_input_from_raw(image, th, tw, mh, mw)
            box5_dev = self.models.page.page_box_dev(small, th, tw)
        t["page_extraction"] = time.time() - t0
        dev["page_extraction"], f = stagetime.snapshot()
        flops += f

        stagetime.reset()
        t1 = time.time()
        if fullfused:
            res = stages.extract_regions_and_textline_resident_raw_fullfused(
                raw_dev, (th, tw), self.models, cfg, raw_hw=image.shape[:2])
        else:
            res = stages.extract_regions_and_textline_resident_raw_headless(
                raw_dev, box5_dev, (th, tw), self.models, cfg,
                raw_hw=image.shape[:2])
        if res is None:
            raise RuntimeError("bundle cannot run the fetch-free path")
        region_mask, textline_proj, textline_dev, box5 = res
        page_coord, cont_page, bh, bw = _box5_page_coords(box5,
                                                          image_filename)
        t["region_extraction_model"] = time.time() - t1
        dev["region_extraction"], f = stagetime.snapshot()
        flops += f
        t["textlines"] = 0.0
        dev["textlines"] = 0.0
        image_page = np.empty((bh, bw, 0), np.uint8)  # shape-only
        return _DeviceState(image_filename, scaled, image_page, page_coord,
                            cont_page, region_mask, None, t, dev,
                            flops, textline_dev, textline_proj)

    def _device_phase_raw(self, image: np.ndarray,
                          image_filename: str = "",
                          pre_box=None) -> _DeviceState:
        """Raw-upload device phase: the ORIGINAL page goes up once
        (upload_raw); the page model's input is gathered from it on host
        via the exact composed nearest maps; the fused program resizes,
        crops, and segments on device. The working image is never
        materialized on host (LazyScaledImage does so only if a degrade
        path touches it). With `pre_box` (from the batched page-box
        stage), the per-page small forward + label fetch are skipped and
        the window's shared cost is folded into page_extraction."""
        from sbb_textline_detection_tpu.utils import stagetime

        cfg = self.config
        t: Dict[str, float] = {}
        dev: Dict[str, float] = {}
        flops = 0.0
        stagetime.reset()
        t0 = time.time()
        th, tw = stages.working_dims(image, cfg)
        scaled = stages.LazyScaledImage(image, th, tw)
        raw_dev = self.models.region.upload_raw(
            image[:, :, 0] if _channels_identical(image) else image)
        t_share = d_share = f_share = 0.0
        if pre_box is not None:
            box, t_share, d_share, f_share = pre_box
        else:
            mh, mw = self.models.page.input_hw
            small = stages.page_model_input_from_raw(image, th, tw, mh, mw)
            try:
                small_labels = self.models.page.predict_small_prescaled(
                    small)
                box = stages._page_box_model_res(small_labels, th, tw, cfg)
            except Exception:
                # reference fallback: the whole image (main.py:406-426
                # shape quirk included)
                box = [0, 0, tw - 1, th - 1]
        page_coord = [box[1], box[1] + box[3], box[0], box[0] + box[2]]
        cont_page = _page_quad(page_coord)
        t["page_extraction"] = time.time() - t0 + t_share
        dev["page_extraction"], f = stagetime.snapshot()
        dev["page_extraction"] += d_share
        flops += f + f_share

        stagetime.reset()
        t1 = time.time()
        keep_dev = bool(cfg.runtime.resident_deskew)
        tp = keep_dev and getattr(cfg.runtime, "textline_projection", False)
        pbox = [page_coord[0], page_coord[2], box[3], box[2]]
        spec = None
        res = None
        if tp and getattr(cfg.runtime, "spec_deskew", False):
            # speculative deskew: dispatch the fused program WITHOUT
            # fetching, enqueue the deskew from device boxes right behind
            # it, then block on the blob — the deskew no longer waits for
            # the ~20 MB/s blob transfer + host contours (VERDICT r4 #1)
            handle = stages.extract_regions_and_textline_resident_raw(
                [raw_dev], [pbox], [(th, tw)], self.models, cfg,
                return_device_textline=True, textline_projection=True,
                raw_hws=[image.shape[:2]], defer_fetch=True)
            if handle is not None:
                spec = stages.deskew_spec_dispatch(
                    self.deskew, handle, (box[3], box[2]), cfg)
                res = [handle.fetch()]
        if res is None:
            res = stages.extract_regions_and_textline_resident_raw(
                [raw_dev], [pbox], [(th, tw)], self.models, cfg,
                return_device_textline=keep_dev, textline_projection=tp,
                raw_hws=[image.shape[:2]])
        if not res:
            raise RuntimeError("bundle cannot run the raw-resident path")
        region_mask, textline_mask, textline_dev, textline_proj = \
            _split_fused(res[0])
        t["region_extraction_model"] = time.time() - t1
        dev["region_extraction"], f = stagetime.snapshot()
        flops += f
        t["textlines"] = 0.0
        dev["textlines"] = 0.0
        image_page = np.empty((box[3], box[2], 0), np.uint8)  # shape-only
        return _DeviceState(image_filename, scaled, image_page, page_coord,
                            cont_page, region_mask, textline_mask, t, dev,
                            flops, textline_dev, textline_proj, spec)

    def _device_phase_standard(self, image: np.ndarray,
                               image_filename: str = "") -> _DeviceState:
        """Scale, border-crop, and run all three model passes."""
        from sbb_textline_detection_tpu.utils import stagetime

        cfg = self.config
        t: Dict[str, float] = {}
        dev: Dict[str, float] = {}
        flops = 0.0

        stagetime.reset()
        t0 = time.time()
        scaled = stages.scale_image(image, cfg)
        canvas = None
        if cfg.runtime.resident_upload and \
                hasattr(self.models.region, "upload_canvas"):
            try:
                canvas = self.models.region.upload_canvas(
                    scaled.image, cfg.tiling.margin_ratio)
            except Exception:
                LOG.warning("canvas upload failed for %s; using the "
                            "upload-per-dispatch path", image_filename,
                            exc_info=True)
                canvas = None
        image_page, page_coord, cont_page = stages.extract_page(
            scaled, self.models, cfg)
        t["page_extraction"] = time.time() - t0
        dev["page_extraction"], f = stagetime.snapshot()
        flops += f

        region_mask = None
        textline_mask = None
        textline_dev = None
        textline_proj = None
        keep_dev = bool(cfg.runtime.resident_deskew)
        tp = keep_dev and getattr(cfg.runtime, "textline_projection", False)
        stagetime.reset()
        t1 = time.time()
        fused = None
        try:
            if canvas is not None:
                box = [page_coord[0], page_coord[2],
                       image_page.shape[0], image_page.shape[1]]
                res = stages.extract_regions_and_textline_resident(
                    [canvas], [box], self.models, cfg,
                    return_device_textline=keep_dev,
                    textline_projection=tp)
                fused = res[0] if res else None
            if fused is None:
                fused = stages.extract_regions_and_textline(
                    image_page, self.models, cfg,
                    return_device_textline=keep_dev,
                    textline_projection=tp)
        except Exception:
            LOG.warning("fused segmentation failed for %s; retrying the "
                        "separate per-model path", image_filename,
                        exc_info=True)
            fused = None
        if fused is not None:
            # one dispatch covered both stages; attribute the cost to
            # region_extraction and the (tiny) remainder to textlines so
            # stage keys stay comparable across runs
            region_mask, textline_mask, textline_dev, textline_proj = \
                _split_fused(fused)
            t["region_extraction_model"] = time.time() - t1
            dev["region_extraction"], f = stagetime.snapshot()
            flops += f
            t["textlines"] = 0.0
            dev["textlines"] = 0.0
        else:
            try:
                region_mask = stages.extract_text_regions(
                    image_page, self.models, cfg)
            except Exception:
                LOG.warning("region model failed for %s; degrading to empty "
                            "regions", image_filename, exc_info=True)
                region_mask = None
            t["region_extraction_model"] = time.time() - t1
            dev["region_extraction"], f = stagetime.snapshot()
            flops += f
            if region_mask is not None:
                stagetime.reset()
                t2 = time.time()
                try:
                    textline_mask = stages.textline_mask_total(
                        image_page, self.models, cfg)
                except Exception:
                    LOG.warning("textline model failed for %s; degrading to "
                                "empty regions", image_filename,
                                exc_info=True)
                    textline_mask = None
                t["textlines"] = time.time() - t2
                dev["textlines"], f = stagetime.snapshot()
                flops += f
        return _DeviceState(image_filename, scaled, image_page, page_coord,
                            cont_page, region_mask, textline_mask, t, dev,
                            flops, textline_dev, textline_proj)

    def device_phase_group(self, items) -> List[_DeviceState]:
        """Device phase for a group of pages with the segmentation passes of
        ALL pages folded into one dispatch (predict_dual_tiled_multi —
        pages x tiles as the forward batch dim, SURVEY §2.4's data-parallel
        pages). Page extraction stays per page (one small whole-image
        forward each); group timings are attributed evenly across pages so
        stage keys stay comparable with the single-page path. Any fused
        failure falls back to the per-page device_phase.

        Items are (image, name) or (image, name, pre_box) triples from the
        batched page-box stage; pre_box is consumed only by the per-page
        path (grouped dispatch runs its own batched page extraction)."""
        from sbb_textline_detection_tpu.utils import stagetime

        items = [tuple(it) + (None,) * (3 - len(it)) for it in items]
        if len(items) <= 1:
            return [self.device_phase(img, name, pre_box=pb)
                    for img, name, pb in items]
        items = [(img, name) for img, name, _ in items]
        cfg = self.config

        # Page extraction for the whole group: K whole-image forwards fold
        # into one dispatch (stages.extract_page_batch); cost is attributed
        # evenly so per-page stage keys stay comparable. Each page's
        # margin-padded working image ships first (upload_canvas BLOCKS —
        # see its docstring; this placement is for dispatch order, not
        # overlap) so the fused dispatch reads RESIDENT canvases.
        stagetime.reset()
        t0 = time.time()
        scaleds = [stages.scale_image(img, cfg) for img, _ in items]
        region = self.models.region
        canvases: Optional[List] = None
        if cfg.runtime.resident_upload and hasattr(region, "upload_canvas"):
            try:
                canvases = [region.upload_canvas(s.image,
                                                 cfg.tiling.margin_ratio)
                            for s in scaleds]
            except Exception:
                LOG.warning("canvas upload failed; using the upload-per-"
                            "dispatch path", exc_info=True)
                canvases = None
        page_crops = stages.extract_page_batch(scaleds, self.models, cfg)
        t_page = (time.time() - t0) / len(items)
        d_page, f_page_group = stagetime.snapshot()
        d_page /= len(items)
        f_page = f_page_group / len(items)
        pre = [(name, scaled, image_page, page_coord, cont_page,
                t_page, d_page, f_page)
               for (_, name), scaled, (image_page, page_coord, cont_page)
               in zip(items, scaleds, page_crops)]

        # Pages fuse only with pages on the SAME tile grid: a smaller page
        # padded onto a larger group grid would see a moved canvas border
        # in the fused morphology and drift from its single-page result.
        # The resident path additionally needs identical canvas shapes.
        if not hasattr(region, "grid_for"):
            return [self.device_phase(img, name) for img, name in items]
        subgroups: Dict[tuple, List[int]] = {}
        for idx, p in enumerate(pre):
            key = region.grid_for(p[2].shape[0], p[2].shape[1],
                                  cfg.tiling.margin_ratio)
            if canvases is not None:
                key = key + tuple(canvases[idx].shape)
            subgroups.setdefault(key, []).append(idx)

        states: List[Optional[_DeviceState]] = [None] * len(pre)
        keep_dev = bool(cfg.runtime.resident_deskew)
        tp = keep_dev and getattr(cfg.runtime, "textline_projection", False)
        for idxs in subgroups.values():
            stagetime.reset()
            t1 = time.time()
            fused = None
            try:
                if canvases is not None:
                    # page_coord = [y0, y1, x0, x1] in working coords
                    boxes = [[pre[i][3][0], pre[i][3][2],
                              pre[i][2].shape[0], pre[i][2].shape[1]]
                             for i in idxs]
                    fused = stages.extract_regions_and_textline_resident(
                        [canvases[i] for i in idxs], boxes, self.models,
                        cfg, return_device_textline=keep_dev,
                        textline_projection=tp)
                if fused is None:
                    fused = stages.extract_regions_and_textline_multi(
                        [pre[i][2] for i in idxs], self.models, cfg,
                        return_device_textline=keep_dev,
                        textline_projection=tp)
            except Exception:
                LOG.warning("multi-page fused segmentation failed for %s; "
                            "falling back to per-page device phases",
                            [pre[i][0] for i in idxs], exc_info=True)
                fused = None
            if fused is None:
                for i in idxs:
                    states[i] = self.device_phase(items[i][0], items[i][1])
                continue
            t_share = (time.time() - t1) / len(idxs)
            d_share, f_group = stagetime.snapshot()
            d_share /= len(idxs)
            f_share = f_group / len(idxs)
            for i, masks in zip(idxs, fused):
                region_mask, textline_mask, textline_dev, textline_proj = \
                    _split_fused(masks)
                (name, scaled, image_page, page_coord, cont_page,
                 t_page, d_page, f_page) = pre[i]
                t = {"page_extraction": t_page,
                     "region_extraction_model": t_share, "textlines": 0.0}
                dev = {"page_extraction": d_page,
                       "region_extraction": d_share, "textlines": 0.0}
                states[i] = _DeviceState(
                    name, scaled, image_page, page_coord, cont_page,
                    region_mask, textline_mask, t, dev, f_page + f_share,
                    textline_dev, textline_proj)
        return states

    # -- host-bound phase ------------------------------------------------------
    def host_phase_dispatch(self, st: _DeviceState) -> Optional[Dict]:
        """The host phase's device-enqueueing prefix: region contours and
        the resident deskew DISPATCH. The pipelined batch runs this for
        page N BEFORE submitting page N+1's device phase — the chip
        executes programs in order, so dispatching N's deskew late would
        make N's host phase wait behind N+1's entire segmentation.
        Returns an opaque dict for host_phase, or None (host_phase then
        does everything itself, including after any failure here)."""
        from sbb_textline_detection_tpu.utils import stagetime

        if st.region_mask is None or st.textline_dev is None:
            return None
        try:
            t1 = time.time()
            contours, boxes = stages.region_contours_and_boxes(
                st.region_mask, self.config)
            t_contours = time.time() - t1
            handle = None
            t_dispatch = d_dispatch = f_dispatch = 0.0
            if contours and (st.textline_mask is not None
                             or st.textline_dev is not None):
                stagetime.reset()
                t2 = time.time()
                if st.spec is not None:
                    handle = stages.deskew_finalize_spec(
                        st.spec, boxes, self.deskew, st.textline_dev)
                else:
                    handle = stages.deskew_dispatch_resident(
                        boxes, self.deskew, st.textline_dev)
                t_dispatch = time.time() - t2
                d_dispatch, f_dispatch = stagetime.snapshot()
            return {"contours": contours, "boxes": boxes,
                    "t_contours": t_contours, "handle": handle,
                    "t_dispatch": t_dispatch, "d_dispatch": d_dispatch,
                    "f_dispatch": f_dispatch}
        except Exception:
            LOG.warning("host-phase dispatch failed for %s; host_phase "
                        "will redo it", st.image_filename, exc_info=True)
            return None

    def host_phase(self, st: _DeviceState,
                   pre: Optional[Dict] = None) -> PageResult:
        """Contours, deskew + line split, reading order, PAGE-XML.
        `pre`: optional result of host_phase_dispatch (pipelined batch)."""
        from sbb_textline_detection_tpu.utils import stagetime

        cfg = self.config
        t = dict(st.timings)
        dev = dict(st.device_timings)
        flops = st.flops
        t0_all = time.time()

        contours: List[np.ndarray] = []
        boxes: List[List[int]] = []
        slopes: List[float] = []
        textlines: List[List[np.ndarray]] = []
        order_of_texts: Optional[List[int]] = None
        id_of_texts: Optional[List[str]] = None
        all_box_coord: List[List[int]] = []

        try:
            t1 = time.time()
            pre_contours = time.time() - t1
            if pre is not None:
                contours, boxes = pre["contours"], pre["boxes"]
                pre_contours = pre["t_contours"]
            elif st.region_mask is not None:
                try:
                    contours, boxes = stages.region_contours_and_boxes(
                        st.region_mask, cfg)
                except Exception:
                    LOG.warning("region contour extraction failed for %s",
                                st.image_filename, exc_info=True)
                    contours, boxes = [], []
            t["region_extraction"] = (
                st.timings.get("region_extraction_model", 0.0)
                + pre_contours + time.time() - t1)

            if len(contours) > 0 and st.textline_mask is None \
                    and st.textline_dev is None:
                contours, boxes = [], []  # degrade: no line mask, no regions
            if len(contours) > 0:
                stagetime.reset()
                t3 = time.time()
                deskew_handle = pre.get("handle") if pre else None
                attempted = pre is not None
                if not attempted and st.spec is not None:
                    # single-page path (no host_phase_dispatch ran):
                    # resolve the speculative dispatch here instead of
                    # re-dispatching from scratch
                    deskew_handle = stages.deskew_finalize_spec(
                        st.spec, boxes, self.deskew, st.textline_dev)
                    attempted = True
                slopes, textlines = stages.slopes_and_lines(
                    contours, boxes, st.textline_mask, cfg, self.deskew,
                    textline_dev=st.textline_dev,
                    deskew_handle=deskew_handle,
                    textline_mask_fetch=st.textline_mask_or_fetch,
                    deskew_attempted=attempted)
                t["deskew"] = time.time() - t3
                dev["deskew"], f = stagetime.snapshot()
                flops += f
                if pre is not None:
                    t["deskew"] += pre["t_dispatch"]
                    dev["deskew"] += pre["d_dispatch"]
                    flops += pre["f_dispatch"]

                t4 = time.time()
                if st.textline_proj is not None:
                    indexes_sorted, matrix = \
                        order_mod.order_of_regions_from_projection(
                            st.textline_proj, st.image_page.shape[0],
                            contours, cfg.reading_order)
                else:
                    indexes_sorted, matrix = order_mod.order_of_regions(
                        st.textline_mask, contours, cfg.reading_order)
                order_of_texts, id_of_texts = order_mod.order_and_id_of_texts(
                    contours, matrix, indexes_sorted)
                t["reading_order"] = time.time() - t4

                # all_box_coord = [y0, y1, x0, x1] per region (main.py:483-487)
                all_box_coord = [[b[1], b[1] + b[3], b[0], b[0] + b[2]]
                                 for b in boxes]
        except Exception:
            # The reference's outermost contract: never crash, always write
            # a valid PAGE-XML (main.py:2152-2156).
            LOG.warning("post-processing failed for %s; writing empty "
                        "PAGE-XML", st.image_filename, exc_info=True)
            contours = []
            order_of_texts = None
            id_of_texts = None
            slopes = []
            textlines = []
            all_box_coord = []

        scaled = st.scaled
        tree = pagexml_writer.build_page_xml(
            image_filename=st.image_filename,
            height_org=scaled.height_org,
            width_org=scaled.width_org,
            scale_x=scaled.scale_x,
            scale_y=scaled.scale_y,
            cont_page=st.cont_page,
            contours=contours,
            page_coord=st.page_coord,
            order_of_texts=order_of_texts,
            id_of_texts=id_of_texts,
            all_found_textline_polygons=textlines,
            all_box_coord=all_box_coord,
            cfg=cfg.pagexml,
        )
        device_total = sum(st.timings.values())
        t["total"] = device_total + (time.time() - t0_all)
        if pre is not None:
            # host_phase_dispatch ran outside this wall but its contour +
            # dispatch time is already inside the stage keys — keep
            # sum(stages) <= total
            t["total"] += pre["t_contours"] + pre["t_dispatch"]
        t.pop("region_extraction_model", None)
        dev["total"] = sum(dev.values())
        return PageResult(tree, contours, slopes, textlines,
                          st.page_coord, t, dev, flops)

    def warm_up(self, height: int = 3508, width: int = 2480,
                group_size: Optional[int] = None) -> Dict[str, float]:
        """Compile and first-dispatch every device program a (height, width)
        page batch needs, in PARALLEL threads.

        The serving environment loads each program onto the chip on its
        first dispatch (5-30 s each through the tunnel); those loads
        overlap when issued concurrently, so the cold-start collapses from
        the sum of the program loads to roughly the slowest one. Returns
        per-program wall seconds."""
        import threading

        cfg = self.config
        group = group_size or self._effective_group_size()
        # the exact working/crop geometry a real page of this size hits
        scaled = stages.scale_image(
            np.full((height, width, 3), 255, np.uint8), cfg)
        page_img = scaled.image
        timings: Dict[str, float] = {}

        def timed(name, fn):
            def run():
                t0 = time.time()
                try:
                    fn()
                except Exception:
                    LOG.warning("warm_up: %s failed", name, exc_info=True)
                timings[name] = time.time() - t0
            return run

        def warm_page_model():
            # the single-page program (predict_small_prescaled via
            # extract_page) serves process_image and the box-less
            # fallback; the batched page-box program (page_box_batch) is
            # what process_batch's prefetch stage dispatches
            stages.extract_page(scaled, self.models, cfg)
            bb = self._page_box_batch_size()
            if bb and hasattr(self.models.page,
                              "predict_smalls_prescaled_batch"):
                mh, mw = self.models.page.input_hw
                self.models.page.predict_smalls_prescaled_batch(
                    np.full((1, mh, mw, 3), 255, np.uint8), pad_to=bb)
            if group > 1:
                stages.extract_page_batch([scaled] * group, self.models,
                                          cfg)

        # warm the program VARIANTS production dispatches: the resident
        # program cache is keyed on (keep_dev, proj, raw_shape, ...) —
        # warming the default-kwarg variant would load a program no real
        # page ever runs
        keep_dev = bool(cfg.runtime.resident_deskew)
        tp = keep_dev and getattr(cfg.runtime, "textline_projection", False)

        def _warm_crop_w(region):
            # a box whose (ny, nx) lands on the grid bucket real page
            # crops use (an A4 crop is narrower than the full scaled
            # width)
            return min(page_img.shape[1],
                       8 * (region.input_hw[1]
                            - 2 * int(cfg.tiling.margin_ratio
                                      * region.input_hw[1])))

        def _warm_crop_widths(region, th, tw):
            """EVERY x-grid bucket a real (height, width) page can mint:
            border crops range from the typical A4 crop up to the full
            working width (skewed scans' content bboxes are wider), and
            each distinct (ny, nx) keys its own fused + speculative +
            resident-deskew programs. The r4 bench lost ~130 s of
            warm-pass stalls to exactly these (VERDICT r4 #3/#4); a
            25-30 s mid-run program load per missed grid was measured
            again in the r5 timeline probe."""
            mh, mw = region.input_hw
            margin = int(cfg.tiling.margin_ratio * mw)
            sw = mw - 2 * margin
            lo = region.grid_for(th, min(tw, 8 * sw),
                                 cfg.tiling.margin_ratio)[1]
            hi = region.grid_for(th, tw, cfg.tiling.margin_ratio)[1]
            widths, seen = [], set()
            for nx in range(lo, hi + 1):
                w = min(tw, nx * sw)
                g = region.grid_for(th, w, cfg.tiling.margin_ratio)
                if g not in seen:
                    seen.add(g)
                    widths.append(w)
            return widths

        def warm_dual():
            if group <= 1:
                return
            region = self.models.region
            if hasattr(region, "upload_canvas"):
                # the resident program is what the batch path dispatches
                canvases = [region.upload_canvas(page_img,
                                                 cfg.tiling.margin_ratio)
                            for _ in range(group)]
                h = page_img.shape[0]
                w = _warm_crop_w(region)
                stages.extract_regions_and_textline_resident(
                    canvases, [[0, 0, h, w]] * group, self.models, cfg,
                    return_device_textline=keep_dev,
                    textline_projection=tp)
            else:
                stages.extract_regions_and_textline_multi(
                    [page_img] * group, self.models, cfg,
                    return_device_textline=keep_dev,
                    textline_projection=tp)

        def warm_dual_single():
            region = self.models.region
            raw_primary = (cfg.runtime.resident_upload
                           and getattr(cfg.runtime, "raw_upload", False)
                           and hasattr(region,
                                       "predict_dual_tiled_resident_raw"))
            if raw_primary and not getattr(cfg.runtime,
                                           "warm_fallback_programs", False):
                # canvas-resident program is only the raw path's FALLBACK
                # here; its cold compile (112 s measured on the 1-core
                # host) would serialize against the production compiles
                return
            if cfg.runtime.resident_upload and \
                    hasattr(region, "upload_canvas"):
                canvas = region.upload_canvas(page_img,
                                              cfg.tiling.margin_ratio)
                h = page_img.shape[0]
                w = _warm_crop_w(region)
                stages.extract_regions_and_textline_resident(
                    [canvas], [[0, 0, h, w]], self.models, cfg,
                    return_device_textline=keep_dev,
                    textline_projection=tp)
            else:
                stages.extract_regions_and_textline(
                    page_img, self.models, cfg,
                    return_device_textline=keep_dev,
                    textline_projection=tp)

        def _raw_single_enabled():
            rt = cfg.runtime
            region = self.models.region
            return (rt.resident_upload and getattr(rt, "raw_upload", False)
                    and hasattr(region, "predict_dual_tiled_resident_raw")
                    and not getattr(rt, "fused_page_box", False)
                    and not getattr(rt, "device_page_box", False))

        def warm_raw_single(w):
            """The production single-page path (runtime.raw_upload) at ONE
            crop-grid bucket: the raw-resident fused program with the
            production (keep_dev, proj) variant, plus the speculative
            deskew program enqueued behind it exactly like
            _device_phase_raw does. One job per _warm_crop_widths entry
            so the per-grid 5-30 s program loads overlap."""
            region = self.models.region
            image = np.full((height, width, 3), 255, np.uint8)
            th, tw = stages.working_dims(image, cfg)
            raw_dev = region.upload_raw(image[:, :, 0])
            w = min(tw, w)
            if tp and getattr(cfg.runtime, "spec_deskew", False):
                handle = stages.extract_regions_and_textline_resident_raw(
                    [raw_dev], [[0, 0, th, w]], [(th, tw)], self.models,
                    cfg, return_device_textline=True,
                    textline_projection=True, raw_hws=[image.shape[:2]],
                    defer_fetch=True)
                if handle is not None:
                    spec = stages.deskew_spec_dispatch(
                        self.deskew, handle, (th, w), cfg)
                    handle.fetch()
                    if spec is not None:
                        np.asarray(spec.out_dev)  # force the program load
                    return
            stages.extract_regions_and_textline_resident_raw(
                [raw_dev], [[0, 0, th, w]], [(th, tw)], self.models, cfg,
                return_device_textline=keep_dev, textline_projection=tp,
                raw_hws=[image.shape[:2]])

        def warm_deskew():
            s = min(512, self.deskew.max_canvas)
            if cfg.runtime.resident_deskew and hasattr(
                    self.models.region, "grid_for"):
                # primary path: the resident program for this page
                # geometry's fused-canvas shape, at the canvas bucket a
                # full-size region lands on; host-path programs stay warm
                # for the fallback at the production group size only
                import jax.numpy as jnp
                region = self.models.region
                mh, mw = region.input_hw
                margin = int(cfg.tiling.margin_ratio * mw)
                # the resident program's cache key includes the textline
                # canvas shape: the fetch-free paths run the FULL working
                # page grid, the default raw path the border-crop grid
                # (_warm_crop_w) — warm the one production dispatches
                fetchfree = (getattr(cfg.runtime, "fused_page_box", False)
                             or getattr(cfg.runtime, "device_page_box",
                                        False))
                th_w = page_img.shape[0]
                w_grids = ([page_img.shape[1]] if fetchfree
                           else _warm_crop_widths(region, th_w,
                                                  page_img.shape[1]))
                # the resident dispatch uses exactly two slot counts
                # (tail<=2 -> 2 slots, else region_batch) and two crop
                # buffer heights (<=1024 -> 1024, else cap), PER canvas
                # grid variant: warm every program in parallel threads so
                # the 5-30 s loads overlap (a tall box keeps s at the 512
                # cap but forces bufH=cap)
                bthreads = []
                for w_grid in w_grids:
                    ny, nx = region.grid_for(th_w, w_grid,
                                             cfg.tiling.margin_ratio)
                    mask = jnp.zeros((ny * (mh - 2 * margin),
                                      nx * (mw - 2 * margin)), jnp.uint8)
                    side = max(8, int(s / self.deskew.cfg.pad_factor))
                    side = min(side, mask.shape[0], mask.shape[1])
                    tall = min(1200, mask.shape[0])

                    def warm_bucket(b, box_h, mask=mask, side=side):
                        self.deskew.slopes_and_profiles_resident(
                            mask, [[0, 0, side, box_h]] * b)
                    bthreads += [threading.Thread(target=warm_bucket,
                                                  args=(b, bh), daemon=True)
                                 for b in (min(2, self.deskew.region_batch),
                                           self.deskew.region_batch)
                                 for bh in (side, tall)]
                for t in bthreads:
                    t.start()
                for t in bthreads:
                    t.join()
                if getattr(cfg.runtime, "warm_fallback_programs", False):
                    # host-path sweep program: only dispatched when the
                    # resident path fails for a region group
                    self.deskew._sweep_batched(
                        np.zeros((self.deskew.region_batch, s, s),
                                 np.uint8), s, self.deskew._coarse)
                return
            # every power-of-two group bucket a real page can dispatch
            # (_batch_buckets) — a shape missed here pays its 5-30 s
            # program load on the first page that hits it
            for b in self.deskew._batch_buckets():
                self.deskew._sweep_batched(
                    np.zeros((b, s, s), np.uint8), s, self.deskew._coarse)

        def warm_headless():
            """The fetch-free chain (runtime.device_page_box): box program
            + full-page-grid fused program, gray-plane raw shape for an
            (height, width) page."""
            rt = cfg.runtime
            page, region = self.models.page, self.models.region
            if not (rt.resident_upload and getattr(rt, "raw_upload", False)
                    and getattr(rt, "device_page_box", False)
                    and getattr(rt, "textline_projection", False)
                    and hasattr(page, "page_box_dev")
                    and hasattr(region,
                                "predict_dual_tiled_resident_raw_headless")):
                return
            image = np.full((height, width, 3), 255, np.uint8)
            th, tw = stages.working_dims(image, cfg)
            raw_dev = region.upload_raw(image[:, :, 0])
            mh, mw = page.input_hw
            small = stages.page_model_input_from_raw(image, th, tw, mh, mw)
            box5 = page.page_box_dev(small, th, tw)
            stages.extract_regions_and_textline_resident_raw_headless(
                raw_dev, box5, (th, tw), self.models, cfg,
                raw_hw=image.shape[:2])

        def warm_fullfused():
            """The one-dispatch page program (runtime.fused_page_box),
            gray-plane raw shape for an (height, width) page."""
            rt = cfg.runtime
            region = self.models.region
            if not (rt.resident_upload and getattr(rt, "raw_upload", False)
                    and getattr(rt, "fused_page_box", False)
                    and getattr(rt, "textline_projection", False)
                    and hasattr(region,
                                "predict_dual_tiled_resident_raw_fullfused")):
                return
            image = np.full((height, width, 3), 255, np.uint8)
            th, tw = stages.working_dims(image, cfg)
            raw_dev = region.upload_raw(image[:, :, 0])
            stages.extract_regions_and_textline_resident_raw_fullfused(
                raw_dev, (th, tw), self.models, cfg,
                raw_hw=image.shape[:2])

        jobs = [("page_model", warm_page_model), ("dual_multi", warm_dual),
                ("dual_single", warm_dual_single),
                ("deskew", warm_deskew),
                ("headless", warm_headless),
                ("fullfused", warm_fullfused)]
        if _raw_single_enabled():
            # one job per crop-grid bucket a real page can mint (fused +
            # speculative programs are keyed per grid)
            image = np.full((height, width, 3), 255, np.uint8)
            th_, tw_ = stages.working_dims(image, cfg)
            for wv in _warm_crop_widths(self.models.region, th_, tw_):
                jobs.append((f"raw_single_{wv}",
                             functools.partial(warm_raw_single, wv)))
        threads = [threading.Thread(target=timed(n, f), daemon=True)
                   for n, f in jobs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return timings

    def _effective_group_size(self) -> int:
        """pages_per_dispatch, auto-raised to the mesh data-axis size when
        the models carry a multi-chip Mesh (runtime.mesh_auto_group): the
        grouped fused dispatch then spreads pages x tiles over the data
        axis instead of running each page's grid on every chip."""
        rt = self.config.runtime
        group = max(1, rt.pages_per_dispatch)
        mesh = getattr(self.models.region, "mesh", None)
        if rt.mesh_auto_group and mesh is not None:
            try:
                data = int(mesh.shape["data"])
            except (KeyError, TypeError):
                data = 1
            if data > 1:
                group = max(group, data)
        return group

    def _page_box_batch_size(self) -> int:
        """Window size of the batched page-box stage, or 0 when the
        production path can't consume it (grouped dispatch runs its own
        batched page extraction; the fetch-free paths decide the box on
        device)."""
        rt = self.config.runtime
        n = max(0, getattr(rt, "page_box_batch", 0))
        if n <= 1:
            return 0
        if not (rt.resident_upload and getattr(rt, "raw_upload", False)):
            return 0
        if getattr(rt, "device_page_box", False) or \
                getattr(rt, "fused_page_box", False):
            return 0
        if not (hasattr(self.models.page, "predict_smalls_prescaled_batch")
                and hasattr(self.models.region,
                            "predict_dual_tiled_resident_raw")):
            return 0
        return n

    def _page_box_prefetch(self, images, batch: int):
        """Batched page-box stage: pulls up to `batch` upcoming pages,
        gathers each page model input on host (the exact composed nearest
        maps of page_model_input_from_raw), runs ONE (batch, mh, mw, 3)
        forward dispatch + ONE packed fetch, computes each page's border
        box (stages._page_box_model_res), and yields (image, name,
        pre_box) triples. One dispatch+fetch round-trip pair per window
        replaces one PER PAGE (reference chain main.py:368-373 per page).
        Runs on its own thread with a bounded queue so the window-boundary
        fetch wait overlaps the consumers' device phases; any failure
        yields box-less items (pages then run their own small forward)."""
        import itertools
        import queue as queue_mod
        import threading

        from sbb_textline_detection_tpu.utils import stagetime

        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=batch + 2)
        _END = object()

        def worker():
            # Degrade-don't-crash holds PER PAGE in batch mode (reference
            # contract main.py:2152-2156): a window whose batched forward
            # fails yields its pages box-less (they run their own small
            # forward), and if this thread dies for ANY other reason the
            # remaining pages still flow through box-less instead of being
            # dropped from the batch.
            it = None
            window: List = []
            put_count = 0
            try:
                it = iter(images)
                mh, mw = self.models.page.input_hw
                while True:
                    window = list(itertools.islice(it, batch))
                    put_count = 0
                    if not window:
                        break
                    stagetime.reset()
                    t0 = time.time()
                    pre_boxes = None
                    try:
                        dims = []
                        smalls = []
                        for img, _ in window:
                            th, tw = stages.working_dims(img, self.config)
                            dims.append((th, tw))
                            smalls.append(stages.page_model_input_from_raw(
                                img, th, tw, mh, mw))
                        labels = self.models.page \
                            .predict_smalls_prescaled_batch(
                                np.stack(smalls), pad_to=batch)
                        pre_boxes = []
                        for (th, tw), lab in zip(dims, labels):
                            try:
                                pre_boxes.append(stages._page_box_model_res(
                                    lab, th, tw, self.config))
                            except Exception:
                                # reference fallback: the whole image
                                # (main.py:406-426 shape quirk included)
                                pre_boxes.append([0, 0, tw - 1, th - 1])
                    except Exception:
                        LOG.warning("batched page-box stage failed; pages "
                                    "fall back to per-page forwards",
                                    exc_info=True)
                    d, f = stagetime.snapshot()
                    n = len(window)
                    share = ((time.time() - t0) / n, d / n, f / n)
                    for i, (img, name) in enumerate(window):
                        pb = ((pre_boxes[i],) + share
                              if pre_boxes is not None else None)
                        q.put((img, name, pb))
                        put_count = i + 1
            except BaseException:
                LOG.warning("page-box prefetch thread died; yielding the "
                            "current window and remaining pages box-less",
                            exc_info=True)
                for img, name in window[put_count:]:
                    q.put((img, name, None))
                try:
                    for img, name in (it or ()):
                        q.put((img, name, None))
                except BaseException:
                    LOG.warning("page iterator itself failed while "
                                "draining; pages it never produced cannot "
                                "be recovered", exc_info=True)
            finally:
                q.put(_END)

        threading.Thread(target=worker, daemon=True,
                         name="page-box-prefetch").start()
        while True:
            item = q.get()
            if item is _END:
                return
            yield item

    # -- public API --------------------------------------------------------
    def process_image(self, image: np.ndarray,
                      image_filename: str = "") -> PageResult:
        """Run the full cascade on an RGB uint8 page image."""
        return self.host_phase(self.device_phase(image, image_filename))

    def process_batch(self, images: Iterable[Tuple[np.ndarray, str]],
                      prefetch: int = 1) -> Iterator[PageResult]:
        """Pipelined batch: the device phases of upcoming pages run on
        runtime.device_phase_workers prefetch threads while this thread
        does host post-processing — device dispatches and transfer waits
        block outside the GIL, so the single host core interleaves all of
        it. A page's device phase is a chain of latency-bound tunnel
        round trips; two workers overlap two pages' chains (measured
        +12%, see config). Pages are grouped runtime.pages_per_dispatch
        at a time so the segmentation passes of the whole group run as
        one fused device dispatch (device_phase_group). With the default
        per-page dispatch (pages_per_dispatch 1), the page-model forwards
        of up to runtime.page_box_batch upcoming pages fold into one
        batched dispatch on a prefetch thread (_page_box_prefetch)."""
        group_size = self._effective_group_size()
        workers = max(1, getattr(self.config.runtime,
                                 "device_phase_workers", 1))
        if group_size == 1:
            boxbatch = self._page_box_batch_size()
            if boxbatch:
                images = self._page_box_prefetch(images, boxbatch)

        def grouped():
            buf = []
            for item in images:
                buf.append(item)
                if len(buf) == group_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending = []
            it = grouped()
            try:
                for _ in range(max(workers, prefetch)):
                    pending.append(pool.submit(self.device_phase_group,
                                               next(it)))
            except StopIteration:
                pass
            while pending:
                fut = pending.pop(0)
                states = fut.result()
                # Enqueue this group's deskew programs as soon as its
                # state resolves (with >1 workers the next group's
                # segmentation may already be queued ahead — the deskew
                # results then wait ~100 ms of chip time, still a net
                # win over serializing the round-trip chains).
                pres = [self.host_phase_dispatch(s) for s in states]
                try:
                    pending.append(pool.submit(self.device_phase_group,
                                               next(it)))
                except StopIteration:
                    pass
                for state, pre in zip(states, pres):
                    yield self.host_phase(state, pre)

    def run_file(self, image_path: str, dir_out: str,
                 f_name: Optional[str] = None) -> str:
        """File-in, PAGE-XML-out (reference CLI semantics, main.py:2162-2171)."""
        if f_name is None:
            f_name = os.path.splitext(os.path.basename(image_path))[0]
        image = load_image(image_path)
        result = self.process_image(image, image_filename=image_path)
        return result.write(dir_out, f_name)

    def run_files(self, image_paths: Iterable[str], dir_out: str
                  ) -> Iterator[str]:
        """Pipelined directory mode: yields output XML paths in input order."""
        paths = list(image_paths)
        for path, result in zip(paths, self.process_batch(
                ((load_image(p), p) for p in paths))):
            f_name = os.path.splitext(os.path.basename(path))[0]
            yield result.write(dir_out, f_name)


def load_image(path: str) -> np.ndarray:
    """Image loading (the reference uses cv2.imread, main.py:197; we use
    PIL to keep the product cv2-free). Returns RGB uint8 (H, W, 3)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))
