"""OCR-D processor facade tests (the framework-free parts; the full
workspace flow needs the optional `ocrd` package)."""

import json

import pytest

from sbb_textline_detection_tpu.ocrd import processor


def test_ocrd_tool_descriptor_loads():
    tool = processor.ocrd_tool()
    t = tool["tools"]["ocrd-sbb-textline-detector-tpu"]
    assert t["executable"] == "ocrd-sbb-textline-detector-tpu"
    assert t["categories"] == ["Layout analysis"]
    assert "layout/segmentation/region" in t["steps"]
    assert "layout/segmentation/line" in t["steps"]
    assert "model" in t["parameters"]


def _ocrd_available() -> bool:
    try:
        import ocrd  # noqa: F401
        import ocrd_modelfactory  # noqa: F401
        import ocrd_models  # noqa: F401
        import ocrd_utils  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _ocrd_available(),
                    reason="needs the real `ocrd` framework (CI installs "
                           "it; the baked local environment does not)")
def test_real_ocrd_workspace_roundtrip(tmp_path, monkeypatch):
    """Full processor.process() against a REAL ocrd Workspace (reference
    behavior at ocrd_cli.py:29-141): build a workspace from nothing, add
    a page image, run the processor with tiny models, and check the
    merged PAGE-XML lands in the output file group with Border /
    ReadingOrder / processing-step metadata."""
    import dataclasses
    import xml.etree.ElementTree as ET

    import numpy as np
    from ocrd import Resolver
    from PIL import Image

    from sbb_textline_detection_tpu.core.config import (
        DEFAULT_CONFIG, DeskewConfig, ModelNames, ResizePolicy,
        RuntimeConfig)
    from sbb_textline_detection_tpu.models import checkpoint, registry

    # tiny checkpoints under the default role names (spec rides in the
    # .npz, so from_dir loads them like production models)
    from tests.test_models import TINY

    model_dir = tmp_path / "models"
    model_dir.mkdir()
    names = ModelNames()
    for role in ("page", "region", "textline"):
        spec = registry.ModelSpec(getattr(names, role), "tpu_unet",
                                  TINY.input_height, TINY.input_width,
                                  TINY.n_classes, widths=TINY.widths)
        checkpoint.save(checkpoint.npz_path(str(model_dir), spec.name),
                        spec, registry.init_variables(spec, seed=0))
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        resize=ResizePolicy(300, 160, 1.0),
        deskew=DeskewConfig(coarse_steps=6, vertical_steps=4),
        runtime=RuntimeConfig(batch_buckets=(2, 4, 8), deskew_canvas=256))

    # a structured page: dark text-ish bars on white
    rng = np.random.default_rng(5)
    page = np.full((220, 170, 3), 235, np.uint8)
    for y in range(30, 190, 24):
        page[y:y + 10, 20:150] = np.where(
            rng.uniform(size=(10, 130, 3)) < 0.7, 30, 235).astype(np.uint8)

    ws_dir = tmp_path / "ws"
    workspace = Resolver().workspace_from_nothing(directory=str(ws_dir))
    img_grp_dir = ws_dir / "OCR-D-IMG"
    img_grp_dir.mkdir()
    img_path = img_grp_dir / "page_0001.png"
    Image.fromarray(page).save(str(img_path))
    workspace.add_file("OCR-D-IMG", ID="IMG_0001", mimetype="image/png",
                       pageId="PHYS_0001",
                       local_filename="OCR-D-IMG/page_0001.png")
    workspace.save_mets()

    monkeypatch.chdir(ws_dir)  # processor writes output_file_grp under cwd
    proc = processor.OcrdSbbTextlineDetectorRecognize(
        workspace=workspace, input_file_grp="OCR-D-IMG",
        output_file_grp="OCR-D-SEG", parameter={"model": str(model_dir)},
        config=cfg)
    proc.process()
    workspace.save_mets()

    outs = list(workspace.mets.find_files(fileGrp="OCR-D-SEG"))
    assert len(outs) == 1
    out_path = outs[0].local_filename
    root = ET.parse(str(ws_dir / out_path)).getroot()
    ns = {"p": root.tag.split("}")[0].strip("{")}
    assert root.tag.endswith("PcGts")
    page_el = root.find("p:Page", ns)
    assert page_el is not None
    assert page_el.find("p:Border", ns) is not None
    # processing-step provenance (reference add_metadata, ocrd_cli.py:132)
    steps = root.findall(".//p:MetadataItem", ns)
    assert any(m.get("type") == "processingStep" for m in steps)


def test_processor_requires_ocrd():
    try:
        import ocrd  # noqa: F401
        pytest.skip("ocrd installed; facade constructs for real")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="ocrd"):
        processor.OcrdSbbTextlineDetectorRecognize(
            workspace=None, input_file_grp="A", output_file_grp="B")
    with pytest.raises(ImportError, match="ocrd"):
        processor.ocrd_sbb_textline_detector_tpu()
