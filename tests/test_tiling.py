"""Tests for the overlapped-tile grid + stitching against a transcribed
numpy oracle of the reference's do_prediction index math (main.py:231-364)."""

import numpy as np
import pytest

from sbb_textline_detection_tpu.ops import tiling


def _oracle_stitch(img_h, img_w, tile_h, tile_w, tile_fn):
    """Direct transcription of the reference's loop: per-tile prediction via
    tile_fn(y0, x0) -> (tile_h, tile_w) labels, stitched with 9-case trims."""
    margin = int(0.1 * tile_w)
    width_mid = tile_w - 2 * margin
    height_mid = tile_h - 2 * margin
    nxf = img_w / float(width_mid)
    nyf = img_h / float(height_mid)
    nxf = int(nxf) + 1 if nxf > int(nxf) else int(nxf)
    nyf = int(nyf) + 1 if nyf > int(nyf) else int(nyf)
    out = np.zeros((img_h, img_w), dtype=np.int64)
    for i in range(nxf):
        for j in range(nyf):
            xd = i * width_mid
            xu = xd + tile_w
            yd = j * height_mid
            yu = yd + tile_h
            if xu > img_w:
                xu = img_w
                xd = img_w - tile_w
            if yu > img_h:
                yu = img_h
                yd = img_h - tile_h
            seg = tile_fn(yd, xd)
            m = margin
            if i == 0 and j == 0:
                out[yd:yu - m, xd:xu - m] = seg[0:tile_h - m, 0:tile_w - m]
            elif i == nxf - 1 and j == nyf - 1:
                out[yd + m:yu, xd + m:xu] = seg[m:, m:]
            elif i == 0 and j == nyf - 1:
                out[yd + m:yu, xd:xu - m] = seg[m:, 0:tile_w - m]
            elif i == nxf - 1 and j == 0:
                out[yd:yu - m, xd + m:xu] = seg[0:tile_h - m, m:]
            elif i == 0 and j != 0 and j != nyf - 1:
                out[yd + m:yu - m, xd:xu - m] = seg[m:tile_h - m, 0:tile_w - m]
            elif i == nxf - 1 and j != 0 and j != nyf - 1:
                out[yd + m:yu - m, xd + m:xu] = seg[m:tile_h - m, m:]
            elif i != 0 and i != nxf - 1 and j == 0:
                out[yd:yu - m, xd + m:xu - m] = seg[0:tile_h - m, m:tile_w - m]
            elif i != 0 and i != nxf - 1 and j == nyf - 1:
                out[yd + m:yu, xd + m:xu - m] = seg[m:, m:tile_w - m]
            else:
                out[yd + m:yu - m, xd + m:xu - m] = seg[m:tile_h - m, m:tile_w - m]
    return out


@pytest.mark.parametrize("img_hw,tile_hw", [
    ((2800, 2000), (448, 448)),
    ((1000, 700), (448, 448)),
    ((448, 448), (448, 448)),      # single tile
    ((500, 3000), (448, 448)),     # single tile row
    ((3000, 460), (448, 448)),     # single tile column
    ((900, 900), (224, 320)),      # non-square tiles
])
def test_stitch_matches_reference_oracle(img_hw, tile_hw):
    img_h, img_w = img_hw
    tile_h, tile_w = tile_hw
    rng = np.random.default_rng(img_h + img_w)
    field = rng.integers(0, 3, size=(img_h + tile_h, img_w + tile_w))

    def tile_fn(y0, x0):
        # deterministic pseudo-prediction depending on absolute position
        return field[y0:y0 + tile_h, x0:x0 + tile_w] + (y0 * 31 + x0 * 7) % 3

    ref = _oracle_stitch(img_h, img_w, tile_h, tile_w, tile_fn)

    grid = tiling.compute_grid(img_h, img_w, tile_h, tile_w)
    tiles = np.stack([
        tile_fn(int(grid.y0[t]), int(grid.x0[t])) for t in range(grid.num_tiles)
    ])
    ours = tiling.stitch_labels(tiles, grid)
    np.testing.assert_array_equal(ours, ref)


def test_extract_tiles_shapes():
    img = np.arange(600 * 500 * 3).reshape(600, 500, 3).astype(np.uint8)
    grid = tiling.compute_grid(600, 500, 448, 448)
    tiles = tiling.extract_tiles(img, grid)
    assert tiles.shape == (grid.num_tiles, 448, 448, 3)
    t0 = tiles[0]
    np.testing.assert_array_equal(t0, img[:448, :448])


def test_small_image_raises():
    with pytest.raises(ValueError):
        tiling.compute_grid(100, 100, 448, 448)
