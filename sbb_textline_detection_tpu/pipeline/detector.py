"""Pipeline orchestrator — the equivalent of `textline_detector.run`
(upstream main.py:2056-2157), redesigned:

  * models load once per process (ModelBundle) instead of per page
    (the reference reloads each .h5 and tears down the TF session per stage,
    main.py:216-223/2065/2085/2104);
  * per-stage wall-clock timings are returned as a structured dict (the
    reference prints them, main.py:2144-2151);
  * the degrade-don't-crash contract is preserved: any failure after page
    extraction still produces a valid PAGE-XML (empty regions on total
    failure, main.py:2152-2156).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional

import numpy as np

from sbb_textline_detection_tpu.core import jaxenv
from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG, PipelineConfig
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.pagexml import writer as pagexml_writer
from sbb_textline_detection_tpu.pipeline import order as order_mod
from sbb_textline_detection_tpu.pipeline import stages
from sbb_textline_detection_tpu.pipeline.deskew import DeskewEngine


@dataclasses.dataclass
class PageResult:
    xml_tree: "object"
    contours: List[np.ndarray]
    slopes: List[float]
    textlines: List[List[np.ndarray]]
    page_coord: List[int]
    timings: Dict[str, float]

    def write(self, dir_out: str, f_name: str) -> str:
        return pagexml_writer.write_page_xml(self.xml_tree, dir_out, f_name)


class TextlineDetector:
    """Process-lifetime detector: holds the model bundle and deskew engine."""

    def __init__(self, models: ModelBundle,
                 config: PipelineConfig = DEFAULT_CONFIG):
        jaxenv.enable_compilation_cache()
        self.models = models
        self.config = config
        self.deskew = DeskewEngine(config.deskew,
                                   max_canvas=config.runtime.deskew_canvas)

    # -- public API --------------------------------------------------------
    def process_image(self, image: np.ndarray,
                      image_filename: str = "") -> PageResult:
        """Run the full cascade on an RGB uint8 page image."""
        cfg = self.config
        t: Dict[str, float] = {}
        t0 = time.time()

        scaled = stages.scale_image(image, cfg)
        image_page, page_coord, cont_page = stages.extract_page(
            scaled, self.models, cfg)
        t["page_extraction"] = time.time() - t0

        contours: List[np.ndarray] = []
        boxes: List[List[int]] = []
        slopes: List[float] = []
        textlines: List[List[np.ndarray]] = []
        order_of_texts: Optional[List[int]] = None
        id_of_texts: Optional[List[str]] = None
        all_box_coord: List[List[int]] = []

        try:
            t1 = time.time()
            try:
                region_labels = stages.extract_text_regions(
                    image_page, self.models, cfg)
                contours, boxes = stages.region_contours_and_boxes(
                    region_labels, cfg)
            except Exception:
                contours, boxes = [], []
            t["region_extraction"] = time.time() - t1

            if len(contours) > 0:
                t2 = time.time()
                textline_mask = stages.textline_mask_total(
                    image_page, self.models, cfg)
                t["textlines"] = time.time() - t2

                t3 = time.time()
                slopes, textlines = stages.slopes_and_lines(
                    contours, boxes, textline_mask, cfg, self.deskew)
                t["deskew"] = time.time() - t3

                t4 = time.time()
                indexes_sorted, matrix = order_mod.order_of_regions(
                    textline_mask, contours, cfg.reading_order)
                order_of_texts, id_of_texts = order_mod.order_and_id_of_texts(
                    contours, matrix, indexes_sorted)
                t["reading_order"] = time.time() - t4

                # all_box_coord = [y0, y1, x0, x1] per region (main.py:483-487)
                all_box_coord = [[b[1], b[1] + b[3], b[0], b[0] + b[2]]
                                 for b in boxes]
        except Exception:
            contours = []
            order_of_texts = None
            id_of_texts = None
            slopes = []
            textlines = []
            all_box_coord = []

        tree = pagexml_writer.build_page_xml(
            image_filename=image_filename,
            height_org=scaled.height_org,
            width_org=scaled.width_org,
            scale_x=scaled.scale_x,
            scale_y=scaled.scale_y,
            cont_page=cont_page,
            contours=contours,
            page_coord=page_coord,
            order_of_texts=order_of_texts,
            id_of_texts=id_of_texts,
            all_found_textline_polygons=textlines,
            all_box_coord=all_box_coord,
            cfg=cfg.pagexml,
        )
        t["total"] = time.time() - t0
        return PageResult(tree, contours, slopes, textlines, page_coord, t)

    def run_file(self, image_path: str, dir_out: str,
                 f_name: Optional[str] = None) -> str:
        """File-in, PAGE-XML-out (reference CLI semantics, main.py:2162-2171)."""
        if f_name is None:
            f_name = os.path.splitext(os.path.basename(image_path))[0]
        image = load_image(image_path)
        result = self.process_image(image, image_filename=image_path)
        return result.write(dir_out, f_name)


def load_image(path: str) -> np.ndarray:
    """Image loading (the reference uses cv2.imread, main.py:197; we use
    PIL to keep the product cv2-free). Returns RGB uint8 (H, W, 3)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))
