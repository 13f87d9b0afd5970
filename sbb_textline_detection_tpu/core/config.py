"""Frozen pipeline configuration.

Every magic constant of the reference pipeline is lifted into this single
frozen dataclass so that behavioral parity is auditable in one place.
Reference provenance is cited per field (file:line into the upstream
qurator-spk/sbb_textline_detection repo, `main.py` =
qurator/sbb_textline_detector/main.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ResizePolicy:
    """Global page scaling policy (main.py:196-214)."""

    small_page_height_threshold: int = 2500  # main.py:201
    small_page_target_height: int = 2800     # main.py:202
    large_page_scale: float = 1.2            # main.py:206


@dataclasses.dataclass(frozen=True)
class TilingConfig:
    """Overlapped-patch inference geometry (main.py:231-257)."""

    margin_ratio: float = 0.1  # margin = int(0.1 * model_width), main.py:233


@dataclasses.dataclass(frozen=True)
class MorphologyConfig:
    """Structuring element and iteration counts for each morphology site."""

    kernel_size: int = 5                 # np.ones((5,5)), main.py:57
    page_dilate_iterations: int = 6      # main.py:397
    region_erode_iterations: int = 3     # main.py:2074
    region_dilate_iterations: int = 4    # main.py:2075
    deskew_crop_erode_iterations: int = 2  # main.py:1734


@dataclasses.dataclass(frozen=True)
class RegionConfig:
    """Text-region extraction (main.py:456-481)."""

    text_class_value: int = 1            # rgb_class_of_texts=(1,1,1), main.py:457
    min_area_ratio: float = 0.00001      # main.py:473
    max_area_ratio: float = 1.0          # main.py:473


@dataclasses.dataclass(frozen=True)
class DeskewConfig:
    """Per-region deskew angle search (main.py:1601-1718, 1721-1758)."""

    sigma: float = 2.0                   # sigma_des=2, main.py:1737
    pad_factor: float = 1.4              # main.py:1612
    coarse_range: Tuple[float, float] = (-25.0, 25.0)  # main.py:1620
    coarse_steps: int = 80               # main.py:1620
    vertical_trigger_angle: float = 15.0  # main.py:1669
    vertical_range: Tuple[float, float] = (-90.0, -50.0)  # main.py:1670
    vertical_steps: int = 30             # main.py:1670
    peak_threshold_multiplier: float = 20.3  # main.py:1639
    pos_peak_min_value: float = 10.0     # interest_pos > 10, main.py:1584
    slope_sentinel: float = 999.0        # main.py:1740
    slope_reject_abs: float = 120.5      # main.py:1744
    vertical_line_split_abs: float = 45.0  # main.py:1514
    # DEVIATIONS #15 — orientation by score. The reference consults the
    # [-90,-50] vertical sweep only when the coarse [-25,25] argmax
    # exceeds 15 degrees, and then replaces unconditionally
    # (main.py:1669-1714). Both halves of that rule fail, measured on the
    # bench corpus: (a) 15-25-degree-skewed HORIZONTAL text always
    # triggers and always loses — every 18-24 degree page came back -50.0
    # and was split as vertical text (|slope| > 45, main.py:1514); (b)
    # WIDE vertical-text regions have flat coarse profiles whose argmax
    # lands near 0, never trigger, and emit 1 line for an 8-11-line
    # region (7 of 10 regions on the bench vertical page). True: run both
    # sweeps for every region (the resident program already does) and
    # take the vertical result exactly when its best profile variance
    # beats the coarse sweep's — same scorer, same canvas, directly
    # comparable. False restores the reference-faithful trigger+clobber.
    vertical_resweep_guard: bool = True


@dataclasses.dataclass(frozen=True)
class LineSplitConfig:
    """Projection-profile textline separation (main.py:516-1457)."""

    profile_pad: int = 20                 # y_padded pads 20 each side, main.py:544-545
    sigma_estimation: float = 2.0         # main.py:553
    estimation_weak_ratio: float = 0.3    # main.py:564
    weak_peak_ratio: float = 0.42         # main.py:649
    sigma_from_spacing: float = 7.0 / 40.0  # main.py:612
    sigma_min: int = 3                    # main.py:616-617
    sigma_fallback: int = 12              # main.py:615
    n_x_samples: int = 1000               # xv = linspace(..., 1000), main.py:537
    # Up/down extent multipliers for the >=3-peak case (main.py:748-773):
    strong_up: float = 1.1
    strong_down: float = 1.1
    weak_up: float = 1.23
    weak_down: float = 1.33
    last_strong_up: float = 1.3
    last_weak_up: float = 1.4
    # NB: the reference also computes `point_down_narrow` variants
    # (main.py:756/771), but they feed only the unconsumed textline_boxes
    # output — deliberately not modeled here.
    # DEVIATIONS #14 — vertical-text split axis fix. The reference's
    # seperate_lines_vertical profiles img_patch.sum(axis=0)
    # (main.py:1020) on a patch rotate_image ALREADY turned horizontal
    # (the deskew sweep picks the angle whose ROW profile peaks,
    # main.py:1640; textline_contours_postprocessing rotates by that
    # slope before the split, main.py:1494/1515) — a profile
    # PERPENDICULAR to the text, yielding 0-2 garbage boxes per vertical
    # region (plus the unbound-variable crash at main.py:1298). True:
    # split the rotated patch with the HORIZONTAL peak logic instead
    # (same machinery, correct axis); the reference-faithful broken
    # behavior stays available at False (pipeline/lines.py keeps the
    # vertical variant verbatim as the parity oracle).
    vertical_axis_fix: bool = True
    # DEVIATIONS #17 — contour peak band. The reference profiles the
    # region's RECTANGULAR crop (main.py:539: dst is the unmasked bbox
    # crop; the contour only shapes x-extents) — at high skew the bbox
    # corner triangles carry NEIGHBOR regions' text whose projection
    # mints junk peaks above/below the region's own band (measured: 1-10
    # junk peaks/region at 18°, 18/20 regions over-split, MAE 2.2 with
    # slopes exact — PERF.md round-5 probes). True: a peak outside the
    # deskewed contour's profile extent (±contour_peak_band_pad) emits no
    # line; surviving boxes are bit-identical to the unfiltered run.
    # False restores the reference-faithful behavior.
    contour_peak_band: bool = True
    contour_peak_band_pad: float = 2.0
    # Generic / 2-peak case divisors (main.py:868-943):
    two_peak_div: float = 1.8
    generic_div: float = 1.9
    generic_last_div: float = 1.7


@dataclasses.dataclass(frozen=True)
class ReadingOrderConfig:
    """Region reading-order heuristic (main.py:1802-1906)."""

    sigma: float = 8.0                    # main.py:1814
    profile_pad: int = 20                 # main.py:1806-1807


@dataclasses.dataclass(frozen=True)
class ModelNames:
    """Checkpoint filenames (main.py:58-60); `.h5` or converted `.npz`."""

    page: str = "model_page_mixed_best"
    region: str = "model_strukturerkennung"
    textline: str = "model_textline_new"
    # Dual-head flagship (registry.DUALHEAD_SPEC): when a checkpoint with
    # this name exists in the model dir, it serves BOTH the region and
    # textline roles with one shared-trunk forward; the two classic
    # checkpoints are then not required.
    dualhead: str = "model_dualhead"


@dataclasses.dataclass(frozen=True)
class PageXmlConfig:
    """PAGE-XML serialization constants (main.py:1908-2053)."""

    schema: str = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
    creator: str = "SBB_QURATOR"
    reading_order_group_id: str = "ro357564684568544579089"
    region_type: str = "paragraph"
    reading_direction: str = "left-to-right"
    textline_order: str = "top-to-bottom"
    page_type: str = "content"


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """TPU runtime knobs (no reference equivalent; ours)."""

    # Patch batches are padded up to the next bucket to bound recompiles.
    batch_buckets: Tuple[int, ...] = (8, 16, 32, 64, 128)
    # Tiles per lax.map step inside the one-dispatch tiled program
    # (bounds activation memory; the page's tile count is padded up to a
    # multiple of this). 96 runs a whole A4 page's grid as one step —
    # measured 30% faster than 16 on the v5e (fewer loop trips, fuller
    # batches) at ~6 GB peak activations.
    tile_chunk: int = 96
    # Tile-grid (ny, nx) dimensions round up to multiples of these, so pages
    # whose crops differ by a few hundred pixels share one compiled tiled
    # program (cold-start and recompile control; padded rows/cols are white
    # and cropped away after stitching). Per-axis buckets (VERDICT r2 #4):
    # (2, 1) measured 22.2 -> 17.4 TFLOP/page (-21%) on A4 bench pages vs
    # the old (4, 4), won every interleaved A/B round vs (4, 2), and all
    # four bench pages (straight/skewed/degraded) still landed on ONE
    # compiled 10x7 program — A4 crop-box jitter is well under a tile.
    # Page stocks of genuinely different size compile one extra program
    # each (persisted in the XLA cache).
    grid_bucket: int = 2
    grid_bucket_x: int = 1
    # Model compute dtype. Params are kept fp32; matmul/conv run in bf16.
    compute_dtype: str = "bfloat16"
    # Maximum regions processed by the fixed-shape deskew sweep at once
    # (sweeps use power-of-two sub-buckets up to this, so small pages and
    # tail groups don't pay for empty canvas slots).
    deskew_batch: int = 8
    # Side of the fixed square canvas used for the batched deskew sweep.
    # Crops larger than canvas/pad_factor are downscaled into it (the
    # documented canvas deviation, pipeline/deskew.py); 512 halves the
    # Radon GEMM time vs 1024 with IDENTICAL recovered angles: the
    # model-free sweep table (PERF.md round-5, scripts/
    # probe_quality_tail.py) shows 512 == 1024 row for row at every
    # skew 2.5-24 deg and on vertical text — the angle error is bounded
    # by the coarse grid step (50/79 ~ 0.63 deg), not the canvas.
    deskew_canvas: int = 512
    # Use the exact point-in-polygon test against traced contours (reference
    # semantics) instead of the rasterized-mask fast path.
    exact_point_in_polygon: bool = True
    # Device-resident deskew + line profiles: the fused segmentation
    # program keeps the textline canvas in HBM and one dispatch per region
    # group runs crop/erode/sweep/morph/deskewed-projection there
    # (pipeline/deskew.py resident section; DEVIATIONS #10). Falls back to
    # the host path on any failure or when a region exceeds the buffer.
    resident_deskew: bool = True
    # With resident_deskew, don't ship the textline canvas to host at all:
    # the fused program returns the crop-masked ROW PROJECTION (all the
    # reading-order stage consumes, main.py:1809-1822) plus the resident
    # device handle, halving the big packed d2h transfer (~0.8 MB at
    # ~20 MB/s). Fallback paths fetch the full canvas lazily from the
    # handle when they need it (resident-deskew failure).
    textline_projection: bool = True
    # Static full-resolution crop buffer cap for the resident deskew
    # program (pages whose region crops exceed it use the host path).
    deskew_buf_max: int = 2816
    # Speculative resident deskew (raw single-page path): the deskew
    # program is enqueued directly behind the fused segmentation dispatch
    # reading DEVICE region boxes (CC top-k over the packed canvas,
    # ops/cc.component_boxes_topk) — before the packed blob fetch, whose
    # ~20 MB/s transfer plus host contour tracing used to gate the
    # dispatch (the r4 critical path). Host contour boxes are matched
    # against the device boxes BY VALUE at finalize; matched slots are
    # bit-exact with the ordinary dispatch, everything else falls back to
    # it (pipeline/deskew.py spec section; DEVIATIONS #16). MEASURED
    # (scripts/ab_spec.py, paired interleaved, byte-identical outputs
    # asserted): with 2 device-phase workers the pipeline is chip-EXEC
    # bound, and the speculative program's added chip time (CC ~70 ms +
    # 16 unconditionally-executed slots) loses to the dispatch latency it
    # removes — post-contours dispatch won 3/3 rounds (2.82-3.83 vs
    # 2.94-4.10 s per 8 pages). Default off; turn on for sequential /
    # latency-sensitive single-page serving where the chip is otherwise
    # idle during the blob fetch (the r5 timeline probe shows the fetch
    # fully overlapping speculative execution there).
    spec_deskew: bool = False
    # Slot count of the speculative program (first-k components in scan
    # order; regions beyond it fall back). One static shape: 16 covers
    # the bench corpus' ~12 regions/page with headroom; exec scales
    # ~12 ms/slot (PERF.md), all off the blocking path.
    deskew_spec_slots: int = 16
    # Pages folded into one fused segmentation dispatch by process_batch
    # (pages x tiles as the forward batch dim; SURVEY §2.4's data-parallel
    # pages). 1 disables grouping: on the single-chip serving tunnel,
    # per-page dispatches pipeline better against host post-processing
    # (interleaved A/B medians 0.73 vs 0.65 pages/s) and cut latency;
    # raise on hosts with more cores or real multi-chip meshes, where the
    # grouped program amortizes per-dispatch overhead across the mesh.
    pages_per_dispatch: int = 1
    # Device-phase worker threads in process_batch. A page's device phase
    # is a chain of ~6 latency-bound tunnel round trips (uploads,
    # dispatches, fetches) totalling ~0.5 s of which only ~0.3 s is chip
    # work; TWO workers overlap two pages' round-trip waits (the threads
    # block outside the GIL). Paired interleaved A/B on 8-page batches:
    # 2 workers won 3/3 rounds, 3.4-3.5 s vs 3.9-4.0 s (~12%). More than
    # 2 adds host contention on the 1-core serving VM for no further
    # latency to hide.
    device_phase_workers: int = 2
    # Auto-raise pages_per_dispatch to the mesh's data-axis size when the
    # models carry a multi-chip Mesh: the grouped fused program is the
    # whole point of a data axis (each chip takes ~1/N of the pages x
    # tiles batch), while the single-chip A/B above keeps 1 elsewhere.
    mesh_auto_group: bool = True
    # Single-page path: upload the ORIGINAL page (upload_raw) and let the
    # fused program materialize the working-resolution canvas on device
    # through exact INTER_NEAREST index maps — the ~10 MP host resize of
    # scale_image (main.py:196-214) never runs and the h2d transfer
    # shrinks ~30%. Bit-identical outputs (the index maps are the same
    # gather the host resize performs). Falls back to the standard path
    # on any failure.
    raw_upload: bool = True
    # Headless page box (raw-upload path only): the page-model forward AND
    # the border-box decision run as one fetch-free device dispatch
    # (runner.page_box_dev: forward -> dilate -> largest component ->
    # boundingRect -> exact nearest-upscale mapping, ops/cc.py); the (1,5)
    # box feeds the fused program on device and its bytes ride in the
    # packed blob. Deletes the small-label fetch round trip (~35-70 ms)
    # from every page's device chain. The tile grid then covers the full
    # working page (the box is unknown at dispatch time) — runtime box
    # masking keeps outputs identical to the box-sized grid. Component
    # areas are pixel counts, not contour polygon areas (DEVIATIONS #12).
    device_page_box: bool = False
    # Fully-fused page program (supersedes device_page_box when on): the
    # page-model input gather, page forward + box decision, AND the fused
    # dual segmentation run as ONE program from the resident raw page
    # (runner.predict_dual_tiled_resident_raw_fullfused). The device
    # chain collapses to raw upload -> one dispatch -> one blob fetch,
    # deleting the box dispatch round trip plus the host-side small
    # gather + upload of the headless path. Same full-page tile grid and
    # blob layout as device_page_box; same DEVIATIONS #12 box semantics.
    fused_page_box: bool = False
    # warm_up scope: False (default) warms only the programs the CURRENT
    # config's production paths dispatch; fallback-only programs (the
    # canvas-resident fused program when the raw path is primary, the
    # host-path deskew sweep when resident deskew is on) compile lazily
    # on first failure instead. The r3 bench paid 112 s of cold-start
    # compile for the canvas fallback alone on the 1-core serving host,
    # where concurrent warm threads' compiles serialize on the CPU.
    # True restores exhaustive warming (e.g. for hosts expecting flaky
    # primary paths).
    warm_fallback_programs: bool = False
    # Batched page-box stage for process_batch's raw single-page path
    # (pages_per_dispatch == 1): a prefetch thread gathers the page
    # model's small input for up to this many upcoming pages, runs ONE
    # (k, mh, mw, 3) forward dispatch + ONE packed fetch, and hands each
    # page its border box — replacing k per-page forward round trips + k
    # small-label fetches (~100-140 ms each on the serving tunnel) with
    # one pair per window. Windows are padded to this count so the whole
    # stream runs one compiled program. <= 1 disables (each page runs its
    # own small forward, the pre-r4 chain).
    page_box_batch: int = 8
    # Batch path: upload each page's margin-padded working image at the
    # START of the device phase (runner.upload_canvas) and let the fused
    # program slice the crop with runtime box offsets, instead of
    # uploading the padded crop right before the dispatch. Bit-identical
    # (tests/test_runner_resident.py); which is faster depends on whether
    # the serving transport overlaps transfers with compute.
    resident_upload: bool = True


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    resize: ResizePolicy = ResizePolicy()
    tiling: TilingConfig = TilingConfig()
    morphology: MorphologyConfig = MorphologyConfig()
    region: RegionConfig = RegionConfig()
    deskew: DeskewConfig = DeskewConfig()
    line_split: LineSplitConfig = LineSplitConfig()
    reading_order: ReadingOrderConfig = ReadingOrderConfig()
    model_names: ModelNames = ModelNames()
    pagexml: PageXmlConfig = PageXmlConfig()
    runtime: RuntimeConfig = RuntimeConfig()


DEFAULT_CONFIG = PipelineConfig()
