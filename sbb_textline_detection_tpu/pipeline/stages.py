"""Pipeline stages as pure functions over numpy/JAX arrays.

Stage-by-stage TPU-native equivalents of `textline_detector.run`'s cascade
(upstream main.py:2056-2157). Degrade-don't-crash semantics are handled one
level up in the detector; stages themselves raise freely like the upstream
stage bodies do.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Tuple

import numpy as np

from sbb_textline_detection_tpu.core.config import PipelineConfig
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.ops import contours as contour_ops
from sbb_textline_detection_tpu.ops import morphology
from sbb_textline_detection_tpu.ops import resize as resize_ops
from sbb_textline_detection_tpu.ops import rotate as rotate_ops
from sbb_textline_detection_tpu.ops import threshold
from sbb_textline_detection_tpu.pipeline import lines as lines_mod
from sbb_textline_detection_tpu.pipeline.deskew import DeskewEngine

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ScaledImage:
    image: np.ndarray          # resized working image (H, W, 3) uint8
    height_org: int
    width_org: int
    scale_x: float
    scale_y: float


def working_dims(image: np.ndarray, cfg: PipelineConfig) -> Tuple[int, int]:
    """(target_h, target_w) of the global resize policy (main.py:196-214):
    pages under 2500 px high scale to 2800 px high; taller pages by 1.2."""
    h, w = image.shape[:2]
    rp = cfg.resize
    if h < rp.small_page_height_threshold:
        target_h = rp.small_page_target_height
    else:
        target_h = int(h * rp.large_page_scale)
    return target_h, int(target_h * w / float(h))


def scale_image(image: np.ndarray, cfg: PipelineConfig) -> ScaledImage:
    """Global resize policy (main.py:196-214) applied on host."""
    h, w = image.shape[:2]
    target_h, target_w = working_dims(image, cfg)
    scaled = resize_ops.resize_nearest_host(image, target_h, target_w)
    return ScaledImage(scaled, h, w, target_w / float(w), target_h / float(h))


class LazyScaledImage:
    """ScaledImage whose working-resolution pixels are materialized only if
    a host path actually touches them — the raw-upload device phase
    resizes on device (runner.predict_dual_tiled_resident_raw), so in the
    common case the ~10 MP host resize never happens."""

    def __init__(self, raw: np.ndarray, target_h: int, target_w: int):
        self._raw = raw
        self._target = (target_h, target_w)
        self._img: Optional[np.ndarray] = None
        self.height_org = raw.shape[0]
        self.width_org = raw.shape[1]
        self.scale_x = target_w / float(raw.shape[1])
        self.scale_y = target_h / float(raw.shape[0])

    @property
    def image(self) -> np.ndarray:
        if self._img is None:
            self._img = resize_ops.resize_nearest_host(
                self._raw, self._target[0], self._target[1])
        return self._img


def page_model_input_from_raw(image: np.ndarray, target_h: int,
                              target_w: int, mh: int, mw: int) -> np.ndarray:
    """The page model's (mh, mw) input gathered straight from the ORIGINAL
    page via the composed two-stage nearest index maps — bit-identical to
    resize(resize(raw, working), model) (main.py:196-214 then 368-373)
    without ever materializing the working image on host."""
    ys = resize_ops.compose_nearest_indices(mh, target_h, image.shape[0])
    xs = resize_ops.compose_nearest_indices(mw, target_w, image.shape[1])
    return image[ys][:, xs]


def _page_box_full_res(labels: np.ndarray, cfg: PipelineConfig) -> List[int]:
    """Reference-shaped page box (main.py:394-404): threshold, dilate x6
    (5x5), largest exterior contour, boundingRect — at full working
    resolution. Host parity oracle for _page_box_model_res."""
    mask = (labels != 0).astype(np.uint8) * 255
    mask = morphology.dilate_host(
        mask, cfg.morphology.kernel_size,
        cfg.morphology.page_dilate_iterations)
    conts = contour_ops.find_contours(mask)
    areas = [contour_ops.polygon_area(c) for c in conts]
    best = conts[int(np.argmax(areas))]
    x, y, bw, bh = contour_ops.bounding_rect(best)
    return [x, y, bw, bh]


def _page_box_model_res(small: np.ndarray, h: int, w: int,
                        cfg: PipelineConfig) -> List[int]:
    """Page box computed at model resolution (DEVIATIONS.md #9).

    The reference nearest-upscales the label map to working resolution and
    runs dilate x6 + largest-contour + boundingRect there (main.py:394-404).
    The same decision on the (mh, mw) map is ~100x cheaper on this 1-core
    host: dilate by 1 px at model scale (≈ the reference's 12 px at working
    scale), pick the largest component, and map its bbox through the exact
    INTER_NEAREST upscale index math (ops/resize.py), so the result equals
    the full-resolution route up to the morphology-scale quantization."""
    mh, mw = small.shape[:2]
    mask = (small != 0).astype(np.uint8)
    mask = morphology.dilate_host(mask, 3, 1)
    conts = contour_ops.find_contours(mask)
    areas = [contour_ops.polygon_area(c) for c in conts]
    best = conts[int(np.argmax(areas))]
    x, y, bw, bh = contour_ops.bounding_rect(best)
    # full-res pixels whose nearest source index is j span
    # [ceil(j*W/mw), ceil((j+1)*W/mw) - 1]
    x0 = int(np.ceil(x * w / mw))
    x1 = int(np.ceil((x + bw) * w / mw)) - 1
    y0 = int(np.ceil(y * h / mh))
    y1 = int(np.ceil((y + bh) * h / mh)) - 1
    return [x0, y0, max(1, x1 - x0 + 1), max(1, y1 - y0 + 1)]


def extract_page(scaled: ScaledImage, models: ModelBundle,
                 cfg: PipelineConfig) -> Tuple[np.ndarray, List[int], np.ndarray]:
    """Border/printspace detection (main.py:384-437): whole-image page model,
    threshold, dilate, largest exterior contour's bbox, crop. Fallback on
    any failure: the whole image. The box decision runs at model resolution
    when the model exposes the small label map (DEVIATIONS.md #9)."""
    img = scaled.image
    h, w = img.shape[:2]
    try:
        if hasattr(models.page, "predict_whole_small"):
            small = models.page.predict_whole_small(img)
            box = _page_box_model_res(small, h, w, cfg)
        else:
            box = _page_box_full_res(models.page.predict_whole(img), cfg)
    except Exception:
        box = [0, 0, w - 1, h - 1]
    return _crop_to_box(img, box)


def _crop_to_box(img: np.ndarray, box: List[int]
                 ) -> Tuple[np.ndarray, List[int], np.ndarray]:
    """Crop + page_coord + cont_page from a page box (main.py:405-437)."""
    cropped = img[box[1]:box[1] + box[3], box[0]:box[0] + box[2]]
    page_coord = [box[1], box[1] + box[3], box[0], box[0] + box[2]]
    cont_page = np.array([[page_coord[2], page_coord[0]],
                          [page_coord[3], page_coord[0]],
                          [page_coord[3], page_coord[1]],
                          [page_coord[2], page_coord[1]]])
    return cropped, page_coord, cont_page


def extract_page_batch(scaleds: List[ScaledImage], models: ModelBundle,
                       cfg: PipelineConfig
                       ) -> List[Tuple[np.ndarray, List[int], np.ndarray]]:
    """Border detection for a GROUP of pages with all K page-model forwards
    folded into one dispatch (predict_whole_small_batch). Per-page results
    are identical to extract_page (same model-resolution box decision);
    any batch failure falls back to the per-page path, and any per-page
    box failure degrades to the whole image, like extract_page does."""
    if not hasattr(models.page, "predict_whole_small_batch") or \
            not hasattr(models.page, "predict_whole_small"):
        return [extract_page(s, models, cfg) for s in scaleds]
    try:
        smalls = models.page.predict_whole_small_batch(
            [s.image for s in scaleds])
    except Exception:
        logger.warning("batched page extraction failed; falling back to "
                       "per-page forwards", exc_info=True)
        return [extract_page(s, models, cfg) for s in scaleds]
    out = []
    for s, small in zip(scaleds, smalls):
        img = s.image
        h, w = img.shape[:2]
        try:
            box = _page_box_model_res(small, h, w, cfg)
        except Exception:
            box = [0, 0, w - 1, h - 1]
        out.append(_crop_to_box(img, box))
    return out


def extract_text_regions(image_page: np.ndarray, models: ModelBundle,
                         cfg: PipelineConfig) -> np.ndarray:
    """Region segmentation + mask shaping (main.py:439-454, 2074-2075,
    457-464): channel-0 Otsu copy, patch-mode region model, erode x3 /
    dilate x4 on the label map, text-class mask, morph OPEN + CLOSE.
    Returns the final binary (H, W) uint8 0/1 text-region mask — with a
    capable model the whole chain is ONE fused device dispatch and only the
    2-bit-packed mask crosses back to host."""
    k = cfg.morphology.kernel_size
    morph = (("erode", k, cfg.morphology.region_erode_iterations),
             ("dilate", k, cfg.morphology.region_dilate_iterations))
    post = (("open", k, 1), ("close", k, 1))
    text_class = cfg.region.text_class_value
    # Capability is detected from the signature, not by catching TypeError:
    # JAX raises TypeError for genuine dtype/shape bugs inside the fused
    # path, and those must not be silently retried via the host fallback.
    if _accepts_kwarg(models.region.predict_tiled, "pre_otsu"):
        return models.region.predict_tiled(
            image_page.astype(np.uint8), cfg.tiling.margin_ratio,
            morph=morph, pre_otsu=True, mask_class=text_class,
            post_morph=post)
    # duck-typed model without the fused extensions (tests/users):
    # binarize on host (reference otsu_copy, main.py:178-194) and shape the
    # mask with the host morphology oracles.
    binarized = threshold.otsu_copy_host(image_page.astype(np.uint8))
    if _accepts_kwarg(models.region.predict_tiled, "morph"):
        labels = models.region.predict_tiled(
            binarized.astype(np.uint8), cfg.tiling.margin_ratio, morph=morph)
    else:
        labels = models.region.predict_tiled(binarized.astype(np.uint8),
                                             cfg.tiling.margin_ratio)
        labels = np.asarray(morphology.erode_host(labels, k, morph[0][2]))
        labels = np.asarray(morphology.dilate_host(labels, k, morph[1][2]))
    mask = (np.asarray(labels) == text_class).astype(np.uint8)
    mask = morphology.morph_open_host(mask, k)
    return morphology.morph_close_host(mask, k)


def _fused_kwargs(fn, return_device_textline: bool,
                  textline_projection: bool) -> dict:
    """The optional fused-program kwargs a duck-typed model supports
    (projection requires the device handle; _split_fused decodes both)."""
    kwargs = {}
    if return_device_textline and _accepts_kwarg(fn,
                                                 "return_device_textline"):
        kwargs["return_device_textline"] = True
        if textline_projection and _accepts_kwarg(fn,
                                                  "textline_projection"):
            kwargs["textline_projection"] = True
    return kwargs


def _accepts_kwarg(fn, name: str) -> bool:
    """True if `fn` can be called with keyword `name` (explicit or **kwargs)."""
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return True  # builtins/uninspectable: assume full-featured
    if name in sig.parameters:
        return True
    return any(p.kind is inspect.Parameter.VAR_KEYWORD
               for p in sig.parameters.values())


def extract_regions_and_textline(image_page: np.ndarray, models: ModelBundle,
                                 cfg: PipelineConfig,
                                 return_device_textline: bool = False,
                                 textline_projection: bool = False):
    """Fused region+textline segmentation: one pad, one upload, one device
    dispatch, one packed transfer for both model passes (predict_dual_tiled).
    Returns (region_mask, textline_labels) — plus the on-device textline
    canvas when return_device_textline (consumed by the resident deskew
    path) — or None when the bundle can't fuse (duck-typed models,
    mismatched geometry); the caller then runs extract_text_regions /
    textline_mask_total separately."""
    region, textline = models.region, models.textline
    if not (hasattr(region, "predict_dual_tiled")
            and hasattr(textline, "input_hw")
            and getattr(region, "input_hw", None) == textline.input_hw):
        return None
    k = cfg.morphology.kernel_size
    kwargs = _fused_kwargs(region.predict_dual_tiled, return_device_textline,
                           textline_projection)
    return region.predict_dual_tiled(
        textline, image_page.astype(np.uint8), cfg.tiling.margin_ratio,
        morph=(("erode", k, cfg.morphology.region_erode_iterations),
               ("dilate", k, cfg.morphology.region_dilate_iterations)),
        mask_class=cfg.region.text_class_value,
        post_morph=(("open", k, 1), ("close", k, 1)), **kwargs)


def extract_regions_and_textline_multi(image_pages, models: ModelBundle,
                                       cfg: PipelineConfig,
                                       return_device_textline: bool = False,
                                       textline_projection: bool = False):
    """Multi-page fused segmentation: K pages' tiles fold into one device
    dispatch (runner.predict_dual_tiled_multi). Returns a list of
    (region_mask, textline_labels[, textline_dev]) in input order, or None
    when the bundle can't fuse — the caller then falls back to per-page
    paths."""
    region, textline = models.region, models.textline
    if not (hasattr(region, "predict_dual_tiled_multi")
            and hasattr(textline, "input_hw")
            and getattr(region, "input_hw", None) == textline.input_hw):
        return None
    k = cfg.morphology.kernel_size
    kwargs = _fused_kwargs(region.predict_dual_tiled_multi, return_device_textline,
                           textline_projection)
    return region.predict_dual_tiled_multi(
        textline, [np.asarray(p, np.uint8) for p in image_pages],
        cfg.tiling.margin_ratio,
        morph=(("erode", k, cfg.morphology.region_erode_iterations),
               ("dilate", k, cfg.morphology.region_dilate_iterations)),
        mask_class=cfg.region.text_class_value,
        post_morph=(("open", k, 1), ("close", k, 1)), **kwargs)


def extract_regions_and_textline_resident(canvases, boxes,
                                          models: ModelBundle,
                                          cfg: PipelineConfig,
                                          return_device_textline: bool = False,
                                          textline_projection: bool = False):
    """Fused segmentation reading crops from RESIDENT device canvases
    (runner.upload_canvas) with runtime page-box offsets: the full-page
    upload overlapped the border stage instead of serializing before the
    dispatch. Returns [(region_mask, textline_labels[, textline_dev]), ...]
    or None when the bundle can't fuse."""
    region, textline = models.region, models.textline
    if not (hasattr(region, "predict_dual_tiled_resident")
            and hasattr(textline, "input_hw")
            and getattr(region, "input_hw", None) == textline.input_hw):
        return None
    k = cfg.morphology.kernel_size
    kwargs = _fused_kwargs(region.predict_dual_tiled_resident, return_device_textline,
                           textline_projection)
    return region.predict_dual_tiled_resident(
        textline, canvases, boxes, cfg.tiling.margin_ratio,
        morph=(("erode", k, cfg.morphology.region_erode_iterations),
               ("dilate", k, cfg.morphology.region_dilate_iterations)),
        mask_class=cfg.region.text_class_value,
        post_morph=(("open", k, 1), ("close", k, 1)), **kwargs)


def extract_regions_and_textline_resident_raw(raws, boxes, scaled_hws,
                                              models: ModelBundle,
                                              cfg: PipelineConfig,
                                              return_device_textline:
                                              bool = False,
                                              raw_hws=None,
                                              textline_projection:
                                              bool = False,
                                              defer_fetch: bool = False):
    """Fused segmentation reading from RESIDENT raw pages (upload_raw) —
    the working canvas is gathered on device through exact nearest index
    maps. Returns [(region_mask, textline_labels[, textline_dev]), ...] or
    None when the bundle can't do it. With `defer_fetch` (single page,
    projection mode), returns the runner's DeferredFusedRaw handle
    instead — the caller enqueues the speculative deskew behind it, then
    calls .fetch()."""
    region, textline = models.region, models.textline
    if not (hasattr(region, "predict_dual_tiled_resident_raw")
            and hasattr(textline, "input_hw")
            and getattr(region, "input_hw", None) == textline.input_hw):
        return None
    k = cfg.morphology.kernel_size
    kwargs = _fused_kwargs(region.predict_dual_tiled_resident_raw, return_device_textline,
                           textline_projection)
    if defer_fetch:
        if not _accepts_kwarg(region.predict_dual_tiled_resident_raw,
                              "defer_fetch"):
            return None
        kwargs["defer_fetch"] = True
    return region.predict_dual_tiled_resident_raw(
        textline, raws, boxes, scaled_hws, cfg.tiling.margin_ratio,
        morph=(("erode", k, cfg.morphology.region_erode_iterations),
               ("dilate", k, cfg.morphology.region_dilate_iterations)),
        mask_class=cfg.region.text_class_value,
        post_morph=(("open", k, 1), ("close", k, 1)), raw_hws=raw_hws,
        **kwargs)


def deskew_spec_dispatch(engine: DeskewEngine, fused_handle, crop_hw,
                         cfg: PipelineConfig):
    """Enqueue the SPECULATIVE resident deskew behind a deferred fused
    dispatch (see DeskewEngine spec section): device CC boxes replace the
    blob-fetch -> host-contours -> dispatch dependency. Area bounds are
    PERMISSIVE pixel-count versions of the host polygon-area filter
    (main.py:473): pixel count >= shoelace area for filled components, so
    half the min bound cannot drop a host-passing region, and the max
    bound is widened the same way; false passes only waste slots — trust
    comes from spec_finalize's exact box matching. Returns a _SpecPending
    or None (speculation unavailable; the ordinary dispatch runs later)."""
    if fused_handle is None or not getattr(fused_handle, "bits1", False) \
            or not getattr(fused_handle, "proj", False):
        return None
    tl_dev = fused_handle.textline_dev
    if tl_dev is None:
        return None
    area = float(crop_hw[0]) * float(crop_hw[1])
    amin = 0.5 * cfg.region.min_area_ratio * area
    ratio = cfg.region.max_area_ratio
    amax = area if ratio >= 1.0 else min(area, 1.5 * ratio * area)
    try:
        return engine.spec_dispatch(
            fused_handle.blob_dev, fused_handle.packed_nbytes,
            fused_handle.big_hw, tl_dev, crop_hw, amin, amax,
            slots=cfg.runtime.deskew_spec_slots)
    except Exception:
        logger.warning("speculative deskew dispatch failed; the ordinary "
                       "dispatch will run after contours", exc_info=True)
        return None


def deskew_finalize_spec(spec_pending, boxes: List[List[int]],
                         engine: DeskewEngine, textline_dev):
    """Resolve a speculative deskew against the host contour boxes;
    returns a handle for slopes_and_lines (engine.resident_collect) or
    None (host fallback — same contract as deskew_dispatch_resident)."""
    if spec_pending is None:
        return deskew_dispatch_resident(boxes, engine, textline_dev)
    try:
        return engine.spec_finalize(spec_pending, boxes)
    except Exception:
        logger.warning("speculative deskew finalize failed for %d regions; "
                       "host path will run", len(boxes), exc_info=True)
        return None


def extract_regions_and_textline_resident_raw_headless(
        raw_dev, boxes5_dev, scaled_hw, models: ModelBundle,
        cfg: PipelineConfig, raw_hw=None):
    """Fused segmentation from a RESIDENT raw page with a DEVICE page box
    (page_box_dev): the host fetches nothing until the single packed blob.
    Returns (region_mask, row_projection, textline_dev, box5) or None when
    the bundle can't do it."""
    region, textline = models.region, models.textline
    if not (hasattr(region, "predict_dual_tiled_resident_raw_headless")
            and hasattr(textline, "input_hw")
            and getattr(region, "input_hw", None) == textline.input_hw):
        return None
    k = cfg.morphology.kernel_size
    return region.predict_dual_tiled_resident_raw_headless(
        textline, raw_dev, boxes5_dev, scaled_hw, cfg.tiling.margin_ratio,
        morph=(("erode", k, cfg.morphology.region_erode_iterations),
               ("dilate", k, cfg.morphology.region_dilate_iterations)),
        mask_class=cfg.region.text_class_value,
        post_morph=(("open", k, 1), ("close", k, 1)), raw_hw=raw_hw)


def extract_regions_and_textline_resident_raw_fullfused(
        raw_dev, scaled_hw, models: ModelBundle, cfg: PipelineConfig,
        raw_hw):
    """The whole page device phase as ONE dispatch
    (runner.predict_dual_tiled_resident_raw_fullfused): page-model input
    gather, page forward + border-box decision, and the fused dual
    segmentation in a single program from the RESIDENT raw page. Returns
    (region_mask, row_projection, textline_dev, box5) or None when the
    bundle can't do it."""
    region, textline, page = models.region, models.textline, models.page
    if not (hasattr(region, "predict_dual_tiled_resident_raw_fullfused")
            and hasattr(page, "input_hw")
            and hasattr(page, "variables")
            and hasattr(textline, "input_hw")
            and getattr(region, "input_hw", None) == textline.input_hw):
        return None
    th, tw = scaled_hw
    pmh, pmw = page.input_hw
    sy = resize_ops.compose_nearest_indices(pmh, th, raw_hw[0])
    sx = resize_ops.compose_nearest_indices(pmw, tw, raw_hw[1])
    k = cfg.morphology.kernel_size
    return region.predict_dual_tiled_resident_raw_fullfused(
        textline, page, raw_dev, sy, sx, scaled_hw,
        cfg.tiling.margin_ratio,
        morph=(("erode", k, cfg.morphology.region_erode_iterations),
               ("dilate", k, cfg.morphology.region_dilate_iterations)),
        mask_class=cfg.region.text_class_value,
        post_morph=(("open", k, 1), ("close", k, 1)), raw_hw=raw_hw)


def region_contours_and_boxes(region_mask: np.ndarray, cfg: PipelineConfig
                              ) -> Tuple[List[np.ndarray], List[List[int]]]:
    """Text-region contours (main.py:465-481) from the shaped binary mask
    produced by extract_text_regions: exterior contours, relative-area
    filter, bounding boxes. (The class masking and OPEN/CLOSE of
    main.py:457-464 already happened — on device — in the previous stage.)"""
    mask = np.asarray(region_mask)
    conts = contour_ops.find_contours(mask)
    img_area = float(np.prod(mask.shape[:2]))
    main_contours = []
    for c in conts:
        if len(c) < 3:
            continue
        area = contour_ops.polygon_area(c)
        if cfg.region.min_area_ratio * img_area <= area <= cfg.region.max_area_ratio * img_area:
            main_contours.append(c)
    boxes = [list(contour_ops.bounding_rect(c)) for c in main_contours]
    return main_contours, boxes


def textline_mask_total(image_page: np.ndarray, models: ModelBundle,
                        cfg: PipelineConfig) -> np.ndarray:
    """Textline segmentation (main.py:490-503): patch-mode textline model;
    returns the raw (H, W) label map (the reference keeps channel 0 of the
    label image — same values)."""
    return models.textline.predict_tiled(image_page.astype(np.uint8),
                                         cfg.tiling.margin_ratio)


def textline_postprocess(crop_labels: np.ndarray, slope: float,
                         contour: np.ndarray, box: List[int],
                         cfg: PipelineConfig) -> List[np.ndarray]:
    """Per-region line extraction (main.py:1472-1524): morph open+close the
    textline crop, rotate by the slope, rasterize+rotate the region contour,
    split into per-line quads. Any failure -> no lines (main.py:1520-1522)."""
    try:
        k = cfg.morphology.kernel_size
        mask = (crop_labels.astype(np.uint8) * np.uint8(255))  # uint8 wrap, as upstream
        mask = morphology.morph_seq_host(mask, (("open", k, 1),
                                                ("close", k, 1)))

        dst = rotate_ops.rotate_mask_host(mask, slope)

        # The reference rasterizes the region contour, warps the raster,
        # and re-traces its longest boundary (main.py:1498-1511) — only to
        # obtain the rotated region polygon. Rotating the contour POINTS
        # through the same affine is geometrically equivalent (within the
        # 1px the warp+binarize+trace round trip wobbles) and skips a
        # full-crop bicubic warp + scanline fill + boundary trace per
        # region (DEVIATIONS.md).
        big = _contour_in_rotated_frame(contour, slope, box)

        vertical = (abs(slope) > cfg.deskew.vertical_line_split_abs
                    and not cfg.line_split.vertical_axis_fix)
        # with vertical_axis_fix (DEVIATIONS #14) the rotated patch is
        # already horizontal-text, so the HORIZONTAL split applies
        _, boxes_rot = lines_mod.separate_lines(
            dst, big, slope, cfg.line_split, vertical=vertical,
            band=_contour_band(big, cfg, vertical))
        return boxes_rot
    except Exception:
        return []


def _contour_band(big: np.ndarray, cfg: PipelineConfig, vertical: bool):
    """(lo, hi) profile band of the deskewed region contour, or None —
    the DEVIATIONS #17 junk-peak filter (see LineSplitConfig
    .contour_peak_band). The horizontal split profiles rows, so the band
    is the rotated contour's y-extent; the reference-faithful vertical
    variant keeps full-range parity (it is itself a preserved-bug path,
    DEVIATIONS #14)."""
    ls = cfg.line_split
    if vertical or not getattr(ls, "contour_peak_band", False):
        return None
    pad = float(getattr(ls, "contour_peak_band_pad", 2.0))
    return (float(np.min(big[:, 1])) - pad, float(np.max(big[:, 1])) + pad)


def _contour_in_rotated_frame(contour: np.ndarray, slope: float,
                              box: List[int]) -> np.ndarray:
    """Region contour points mapped into the deskewed crop frame
    (analytic equivalent of the reference's rasterize-warp-retrace,
    main.py:1498-1511; DEVIATIONS #5)."""
    shifted = np.asarray(contour, dtype=np.float64).copy()
    shifted[:, 0] -= box[0]
    shifted[:, 1] -= box[1]
    M = rotate_ops.rotation_matrix_host(slope, box[2], box[3])
    return shifted @ M[:, :2].T + M[:, 2]


def textline_postprocess_profile(profile_pair, slope: float,
                                 contour: np.ndarray, box: List[int],
                                 cfg: PipelineConfig) -> List[np.ndarray]:
    """textline_postprocess when the deskewed region's projection profiles
    were already computed on device (DeskewEngine.slopes_and_profiles_
    resident): only the contour rotation and the branch-heavy peak logic
    run on host. Any failure -> no lines (main.py:1520-1522)."""
    try:
        big = _contour_in_rotated_frame(contour, slope, box)
        vertical = (abs(slope) > cfg.deskew.vertical_line_split_abs
                    and not cfg.line_split.vertical_axis_fix)
        # DEVIATIONS #14: with the fix, the deskewed region's ROW profile
        # (profile_pair[0], one peak per now-horizontal line) feeds the
        # horizontal peak logic even for vertical-text slopes
        prof = profile_pair[1] if vertical else profile_pair[0]
        _, boxes_rot = lines_mod.separate_lines_from_profile(
            prof, box[3], box[2], big, slope, cfg.line_split,
            vertical=vertical, band=_contour_band(big, cfg, vertical))
        return boxes_rot
    except Exception:
        return []


def deskew_dispatch_resident(boxes: List[List[int]], engine: DeskewEngine,
                             textline_dev):
    """Enqueue the resident deskew programs for a page's regions (see
    DeskewEngine.resident_dispatch); returns a handle for slopes_and_lines
    or None when the resident path is unavailable (host fallback)."""
    if textline_dev is None or not hasattr(engine, "resident_dispatch"):
        return None
    try:
        return engine.resident_dispatch(textline_dev, boxes)
    except Exception:
        logger.warning("resident deskew dispatch failed for %d regions; "
                       "host path will run", len(boxes), exc_info=True)
        return None


def slopes_and_lines(contours: List[np.ndarray], boxes: List[List[int]],
                     textline_mask: Optional[np.ndarray],
                     models_cfg: PipelineConfig,
                     engine: Optional[DeskewEngine] = None,
                     textline_dev=None, deskew_handle=None,
                     textline_mask_fetch=None, deskew_attempted=False
                     ) -> Tuple[List[float], List[List[np.ndarray]]]:
    """Reference get_slopes_and_deskew + do_work_of_slopes
    (main.py:1721-1799), without the multiprocessing fan-out: the angle
    sweep runs on device (DeskewEngine), so host processes have nothing to
    parallelize. Region order is preserved (the reference's reassembly order
    is nondeterministic; input order is one valid instance).

    With `textline_dev` (the fused segmentation program's on-device
    textline canvas) and a resident-capable engine, the ENTIRE per-region
    device chain — crop, erode, sweep, morph, deskewed projection — runs
    as one dispatch per region group and the host only does contours and
    peak logic; any resident failure falls back to this host path."""
    cfg = models_cfg
    engine = engine or DeskewEngine(cfg.deskew)
    if deskew_handle is None and textline_dev is not None \
            and not deskew_attempted:
        # with deskew_attempted, host_phase_dispatch already ran (and
        # warning-logged) this dispatch for these boxes — re-running it
        # would re-enqueue device work guaranteed to fail at collect
        deskew_handle = deskew_dispatch_resident(boxes, engine,
                                                 textline_dev)
    if deskew_handle is not None:
        try:
            slopes, profiles = engine.resident_collect(deskew_handle)
            return slopes, [
                textline_postprocess_profile(p, s, contour, box, cfg)
                for p, s, contour, box in zip(profiles, slopes, contours,
                                              boxes)]
        except Exception:
            logger.warning(
                "resident deskew failed for %d regions; falling back to "
                "the host path", len(boxes), exc_info=True)
    if textline_mask is None and textline_mask_fetch is not None:
        # projection mode shipped no host canvas; fetch it from the
        # device handle only now that a fallback actually needs it
        textline_mask = textline_mask_fetch()
    if textline_mask is None:
        return ([0.0] * len(boxes), [[] for _ in boxes])
    crops: List[np.ndarray] = []
    for box in boxes:
        x, y, w, h = box
        crop = textline_mask[y:y + h, x:x + w]
        crops.append(morphology.erode_host(
            crop, cfg.morphology.kernel_size,
            cfg.morphology.deskew_crop_erode_iterations))
    try:
        raw_slopes = engine.best_angles(crops)
    except Exception:
        logger.warning(
            "deskew sweep failed for %d regions; using slope 0 "
            "(reference sentinel path, main.py:1744-1747)",
            len(crops), exc_info=True)
        raw_slopes = [cfg.deskew.slope_sentinel] * len(crops)
    slopes: List[float] = []
    all_lines: List[List[np.ndarray]] = []
    for crop, contour, box, slope in zip(crops, contours, boxes, raw_slopes):
        if slope == cfg.deskew.slope_sentinel or \
                abs(slope) > cfg.deskew.slope_reject_abs:
            slope = 0.0
        slopes.append(slope)
        all_lines.append(textline_postprocess(crop, slope, contour, box, cfg))
    return slopes, all_lines
