"""Box-for-box parity of pipeline/lines.separate_lines against a literal
numpy transcription of the reference line separator.

`_oracle_separate_lines` is ported statement-by-statement from the
reference's `seperate_lines` (main.py:516-991) and `seperate_lines_vertical`
(main.py:993-1457), substituting scipy for scipy (identical), numpy for cv2
rotation matrices, and an independent point-in-polygon for
cv2.pointPolygonTest's `>= 0` sign. The only omission is the pair of
`return_contours_of_image`/`filter_contours_area_of_image` calls inside the
sigma-estimation try block (main.py:608-609 / 1089-1090): their results are
unused and they cannot raise for the 2-D uint8 patches this function
receives, so they do not affect observable behavior.

The property test sweeps randomized stripe masks, contours, and thetas over
both variants and asserts identical outcomes: same exception type on the
degrade paths, and exact (peaks, boxes) equality otherwise. A coverage
counter proves all four peak-count branches, the strong/weak multiplier
split, and the cluster-deletion wrap-around quirk (main.py:687 idx==0 ->
peaks[-1]) actually executed.

Variant-difference audit (closing the unified-transcription risk): a full
textual diff of seperate_lines (main.py:516-991) against
seperate_lines_vertical (main.py:993-1457) is 83 lines and contains
EXACTLY the hunks below; everything else — sigma estimation, 0.42 valley
pruning, cluster deletion incl. the idx==0 wrap, the 1.1/1.23/1.33/1.3/1.4
and 1/1.9-1/1.8-1/1.7 multipliers, the shape[0] clamp in the two-peak and
generic branches (NOT shape[1] in the vertical variant), and the emit-time
<0 clamps — is byte-identical between the two functions.

| # | horizontal (main.py)  | vertical (main.py)     | difference | oracle model |
|---|----------------------|------------------------|------------|--------------|
| 1 | 516 (def)            | 993-997: thetha += 90  | angle offset | `thetha + 90` when vertical |
| 2 | 539: sum(axis=1)     | 1020: sum(axis=0)      | projection axis | `axis=0 if vertical else 1` |
| 3 | 646: max over pos peaks | 1127: max over valleys | 0.42-pruning normalizer | `neg_peaks_max` branch |
| 4 | 698-713: commented-out plt calls | absent       | comments only — no behavior | omitted |
| 5 | 754/757: last-line point_down = y_max_cont-1 | 1220/1223: = x_max_cont-1 | last-line extent | `(x_max_cont if vertical else y_max_cont) - 1` |
| 6 | 793-796, 891-894, 958-961: corners (x_min/x_max, point_up/point_down) | 1259-1262, 1357-1360, 1424-1427: corners (point_up/point_down, y_min/y_max) | corner layout (axes swapped) | `corners_for()` |
| 7 | 832-835: single-peak corners from x/y_min/max | 1298-1301: reads point_up/point_down — never assigned | NameError (caught upstream -> no lines) | explicit raise NameError |

Any future divergence found between the functions must be added to this
table AND modeled in the oracle.
"""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter1d
from scipy.signal import find_peaks

from sbb_textline_detection_tpu.pipeline import lines

# The transcription inherits the reference's benign empty-slice/NaN warnings
# on degrade paths (np.mean of empty diffs inside the sigma try-block).
pytestmark = pytest.mark.filterwarnings("ignore::RuntimeWarning")


# ---------------------------------------------------------------------------
# Independent helpers (cv2 equivalents)
# ---------------------------------------------------------------------------

def _cv2_rotation_matrix(w, h, angle_deg):
    """cv2.getRotationMatrix2D((w//2, h//2), angle, 1.0)."""
    cx, cy = float(w // 2), float(h // 2)
    a = np.cos(np.deg2rad(angle_deg))
    b = np.sin(np.deg2rad(angle_deg))
    return np.array([[a, b, (1.0 - a) * cx - b * cy],
                     [-b, a, b * cx + (1.0 - a) * cy]])


def _ppt_nonneg(contour, px_arr, py):
    """sign(cv2.pointPolygonTest(contour, (px, py), True)) >= 0 per px:
    strictly inside (even-odd) or exactly on a polygon edge."""
    pts = np.asarray(contour, np.float64)
    x1, y1 = pts[:, 0], pts[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    px = np.asarray(px_arr, np.float64)[:, None]
    py = float(py)
    cross = (x2 - x1)[None] * (py - y1)[None] - (y2 - y1)[None] * (px - x1[None])
    on = ((cross == 0.0)
          & (px >= np.minimum(x1, x2)[None]) & (px <= np.maximum(x1, x2)[None])
          & (py >= np.minimum(y1, y2)) & (py <= np.maximum(y1, y2)))
    crosses = (y1[None] > py) != (y2[None] > py)
    denom = np.where(y2 == y1, 1.0, y2 - y1)
    xint = x1 + (py - y1) / denom * (x2 - x1)
    odd = ((crosses & (px < xint[None])).sum(axis=1) % 2) == 1
    return odd | on.any(axis=1)


def _delete_peak_clusters(peaks, peaks_neg, clusters):
    """main.py:680-716 / 585-601: replace each weak-valley cluster with the
    midpoint of its positive peaks; note peaks[idx-1] wraps at idx==0."""
    peaks_new = peaks[:]
    peaks_neg_new = peaks_neg[:]
    peaks_new_extra = []
    for m in range(len(clusters)):
        min_cluster = np.min(peaks[clusters[m]])
        max_cluster = np.max(peaks[clusters[m]])
        peaks_new_extra.append(int((min_cluster + max_cluster) / 2.0))
        for m1 in range(len(clusters[m])):
            peaks_new = peaks_new[peaks_new != peaks[clusters[m][m1] - 1]]
            peaks_new = peaks_new[peaks_new != peaks[clusters[m][m1]]]
            peaks_neg_new = peaks_neg_new[peaks_neg_new != peaks_neg[clusters[m][m1]]]
    peaks_new_tot = []
    for i1 in peaks_new:
        peaks_new_tot.append(i1)
    for i1 in peaks_new_extra:
        peaks_new_tot.append(i1)
    return np.sort(peaks_new_tot), peaks_neg_new


# ---------------------------------------------------------------------------
# The oracle: literal transcription of main.py:516-991 / 993-1457
# ---------------------------------------------------------------------------

def _oracle_separate_lines(img_patch, contour_text_interest, thetha,
                           vertical=False, info=None):
    if info is None:
        info = {}
    if vertical:
        thetha = thetha + 90          # main.py:996

    (h, w) = img_patch.shape[:2]
    M = _cv2_rotation_matrix(w, h, -thetha)      # main.py:518-519 / 999-1000
    x_d = M[0, 2]
    y_d = M[1, 2]

    thetha = thetha / 180. * np.pi
    rotation_matrix = np.array([[np.cos(thetha), -np.sin(thetha)],
                                [np.sin(thetha), np.cos(thetha)]])
    contour_text_interest_copy = np.asarray(contour_text_interest).copy()

    x_min_cont = 0
    x_max_cont = img_patch.shape[1]
    y_min_cont = 0
    y_max_cont = img_patch.shape[0]

    xv = np.linspace(x_min_cont, x_max_cont, 1000)   # main.py:537

    # main.py:539 sums axis=1; the vertical variant axis=0 (main.py:1020)
    y = img_patch.sum(axis=0 if vertical else 1)
    first_nonzero = 0
    y_padded = np.zeros(len(y) + 40)
    y_padded[20:len(y) + 20] = y
    x = np.array(range(len(y)))

    # --- sigma estimation (main.py:551-617) ---
    try:
        y_padded_smoothed_e = gaussian_filter1d(y_padded, 2)
        y_padded_up_to_down_e = -y_padded + np.max(y_padded)
        y_padded_up_to_down_padded_e = np.zeros(len(y_padded_up_to_down_e) + 40)
        y_padded_up_to_down_padded_e[20:len(y_padded_up_to_down_e) + 20] = \
            y_padded_up_to_down_e
        y_padded_up_to_down_padded_e = gaussian_filter1d(
            y_padded_up_to_down_padded_e, 2)

        peaks_e, _ = find_peaks(y_padded_smoothed_e, height=0)
        peaks_neg_e, _ = find_peaks(y_padded_up_to_down_padded_e, height=0)
        neg_peaks_max = np.max(y_padded_up_to_down_padded_e[peaks_neg_e])

        arg_neg_must_be_deleted = np.array(range(len(peaks_neg_e)))[
            y_padded_up_to_down_padded_e[peaks_neg_e] / float(neg_peaks_max) < 0.3]
        diff_arg_neg_must_be_deleted = np.diff(arg_neg_must_be_deleted)
        arg_diff = np.array(range(len(diff_arg_neg_must_be_deleted)))
        arg_diff_cluster = arg_diff[diff_arg_neg_must_be_deleted > 1]

        clusters_to_be_deleted = []
        if len(arg_diff_cluster) > 0:                  # main.py:577
            clusters_to_be_deleted.append(
                arg_neg_must_be_deleted[0:arg_diff_cluster[0] + 1])
            for i in range(len(arg_diff_cluster) - 1):
                clusters_to_be_deleted.append(
                    arg_neg_must_be_deleted[arg_diff_cluster[i] + 1:
                                            arg_diff_cluster[i + 1] + 1])
            clusters_to_be_deleted.append(
                arg_neg_must_be_deleted[arg_diff_cluster[-1] + 1:])

        if len(clusters_to_be_deleted) > 0:
            peaks_new_tot, _ = _delete_peak_clusters(
                peaks_e, peaks_neg_e, clusters_to_be_deleted)
        else:
            peaks_new_tot = peaks_e[:]

        # main.py:608-609 contour calls omitted: results unused, cannot raise
        y_diff_mean = np.mean(np.diff(peaks_new_tot))
        sigma_gaus = int(y_diff_mean * (7. / 40.0))
    except Exception:
        sigma_gaus = 12
    if sigma_gaus < 3:
        sigma_gaus = 3
    info["sigma"] = sigma_gaus

    # --- main smoothing + peak finding (main.py:621-629) ---
    y_padded_smoothed = gaussian_filter1d(y_padded, sigma_gaus)
    y_padded_up_to_down = -y_padded + np.max(y_padded)
    y_padded_up_to_down_padded = np.zeros(len(y_padded_up_to_down) + 40)
    y_padded_up_to_down_padded[20:len(y_padded_up_to_down) + 20] = \
        y_padded_up_to_down
    y_padded_up_to_down_padded = gaussian_filter1d(
        y_padded_up_to_down_padded, sigma_gaus)

    peaks, _ = find_peaks(y_padded_smoothed, height=0)
    peaks_neg, _ = find_peaks(y_padded_up_to_down_padded, height=0)

    # normalization quirk: horizontal uses max positive peak (main.py:646),
    # vertical uses max valley (main.py:1127)
    if vertical:
        neg_peaks_max = np.max(y_padded_up_to_down_padded[peaks_neg])
    else:
        neg_peaks_max = np.max(y_padded_smoothed[peaks])

    arg_neg_must_be_deleted = np.array(range(len(peaks_neg)))[
        y_padded_up_to_down_padded[peaks_neg] / float(neg_peaks_max) < 0.42]
    diff_arg_neg_must_be_deleted = np.diff(arg_neg_must_be_deleted)
    arg_diff = np.array(range(len(diff_arg_neg_must_be_deleted)))
    arg_diff_cluster = arg_diff[diff_arg_neg_must_be_deleted > 1]

    clusters_to_be_deleted = []
    if len(arg_diff_cluster) >= 2 and len(arg_diff_cluster) > 0:  # main.py:665
        clusters_to_be_deleted.append(
            arg_neg_must_be_deleted[0:arg_diff_cluster[0] + 1])
        for i in range(len(arg_diff_cluster) - 1):
            clusters_to_be_deleted.append(
                arg_neg_must_be_deleted[arg_diff_cluster[i] + 1:
                                        arg_diff_cluster[i + 1] + 1])
        clusters_to_be_deleted.append(
            arg_neg_must_be_deleted[arg_diff_cluster[-1] + 1:])
    elif len(arg_neg_must_be_deleted) >= 2 and len(arg_diff_cluster) == 0:
        clusters_to_be_deleted.append(arg_neg_must_be_deleted[:])
    if len(arg_neg_must_be_deleted) == 1:              # main.py:676
        clusters_to_be_deleted.append(arg_neg_must_be_deleted)

    if len(clusters_to_be_deleted) > 0:
        info["deleted_clusters"] = [c.tolist() for c in clusters_to_be_deleted]
        info["wraparound"] = any(0 in c for c in clusters_to_be_deleted)
        peaks, peaks_neg = _delete_peak_clusters(
            peaks, peaks_neg, clusters_to_be_deleted)

    mean_value_of_peaks = np.mean(y_padded_smoothed[peaks])
    std_value_of_peaks = np.std(y_padded_smoothed[peaks])
    peaks_values = y_padded_smoothed[peaks]

    peaks_neg = peaks_neg - 20 - 20
    peaks = peaks - 20
    for jj in range(len(peaks_neg)):                   # main.py:731-737
        if peaks_neg[jj] > len(x) - 1:
            peaks_neg[jj] = len(x) - 1
    for jj in range(len(peaks)):
        if peaks[jj] > len(x) - 1:
            peaks[jj] = len(x) - 1

    textline_boxes_rot = []

    def x_extent(jj):
        inside = _ppt_nonneg(contour_text_interest_copy, xv,
                             peaks[jj] + first_nonzero)
        xvinside = xv[inside]
        if len(xvinside) == 0:
            return x_min_cont, x_max_cont
        return np.min(xvinside), np.max(xvinside)

    def emit(corners):
        p1, p2, p3, p4 = [np.dot(rotation_matrix, [int(cx), int(cy)])
                          for cx, cy in corners]
        x_min_rot1, point_up_rot1 = p1[0] + x_d, p1[1] + y_d
        x_max_rot2, point_up_rot2 = p2[0] + x_d, p2[1] + y_d
        x_max_rot3, point_down_rot3 = p3[0] + x_d, p3[1] + y_d
        x_min_rot4, point_down_rot4 = p4[0] + x_d, p4[1] + y_d
        if x_min_rot1 < 0:
            x_min_rot1 = 0
        if x_min_rot4 < 0:
            x_min_rot4 = 0
        if point_up_rot1 < 0:
            point_up_rot1 = 0
        if point_up_rot2 < 0:
            point_up_rot2 = 0
        textline_boxes_rot.append(np.array(
            [[int(x_min_rot1), int(point_up_rot1)],
             [int(x_max_rot2), int(point_up_rot2)],
             [int(x_max_rot3), int(point_down_rot3)],
             [int(x_min_rot4), int(point_down_rot4)]]))

    def corners_for(jj, point_up, point_down):
        if vertical:   # main.py:1259-1262: (point, y) layout
            return [(point_up, y_min_cont), (point_down, y_min_cont),
                    (point_down, y_max_cont), (point_up, y_max_cont)]
        x_min, x_max = x_extent(jj)
        return [(x_min, point_up), (x_max, point_up),
                (x_max, point_down), (x_min, point_down)]

    if len(peaks_neg) == len(peaks) + 1 and len(peaks) >= 3:  # main.py:744
        info["case"] = "npeaks3"
        for jj in range(len(peaks)):
            dis_to_next_up = abs(peaks[jj] - peaks_neg[jj])
            dis_to_next_down = abs(peaks[jj] - peaks_neg[jj + 1])
            strong = peaks_values[jj] > mean_value_of_peaks - std_value_of_peaks / 2.
            info.setdefault("strengths", []).append(bool(strong))
            if jj == len(peaks) - 1:
                if strong:
                    point_up = peaks[jj] + first_nonzero - int(1.3 * dis_to_next_up)
                else:
                    point_up = peaks[jj] + first_nonzero - int(1.4 * dis_to_next_up)
                # last line runs to the patch end: y_max (main.py:754) or the
                # vertical variant's x_max (main.py:1220)
                point_down = (x_max_cont if vertical else y_max_cont) - 1
            else:
                if strong:
                    point_up = peaks[jj] + first_nonzero - int(1.1 * dis_to_next_up)
                    point_down = peaks[jj] + first_nonzero + int(1.1 * dis_to_next_down)
                else:
                    point_up = peaks[jj] + first_nonzero - int(1.23 * dis_to_next_up)
                    point_down = peaks[jj] + first_nonzero + int(1.33 * dis_to_next_down)
            emit(corners_for(jj, point_up, point_down))

    elif len(peaks) < 1:
        info["case"] = "none"

    elif len(peaks) == 1:
        info["case"] = "one"
        if vertical:
            # main.py:1298-1301: point_up/point_down unbound -> NameError
            raise NameError("point_up is unbound in the vertical single-peak "
                            "branch (main.py:1298)")
        emit([(x_min_cont, y_min_cont), (x_max_cont, y_min_cont),
              (x_max_cont, y_max_cont), (x_min_cont, y_max_cont)])

    elif len(peaks) == 2:
        info["case"] = "two"
        dis_to_next = np.abs(peaks[1] - peaks[0])
        for jj in range(len(peaks)):
            if jj == 0:
                point_up = 0
                if point_up < 0:
                    point_up = 1
                point_down = peaks[jj] + first_nonzero + int(1. / 1.8 * dis_to_next)
            elif jj == 1:
                point_down = peaks[jj] + first_nonzero + int(1. / 1.8 * dis_to_next)
                if point_down >= img_patch.shape[0]:  # h in BOTH variants
                    point_down = img_patch.shape[0] - 2
                point_up = peaks[jj] + first_nonzero - int(1. / 1.8 * dis_to_next)
            emit(corners_for(jj, point_up, point_down))

    else:
        info["case"] = "generic"
        for jj in range(len(peaks)):
            if jj == 0:
                dis_to_next = peaks[jj + 1] - peaks[jj]
                point_up = peaks[jj] + first_nonzero - int(1. / 1.9 * dis_to_next)
                if point_up < 0:
                    point_up = 1
                point_down = peaks[jj] + first_nonzero + int(1. / 1.9 * dis_to_next)
            elif jj == len(peaks) - 1:
                dis_to_next = peaks[jj] - peaks[jj - 1]
                point_down = peaks[jj] + first_nonzero + int(1. / 1.7 * dis_to_next)
                if point_down >= img_patch.shape[0]:  # h in BOTH variants
                    point_down = img_patch.shape[0] - 2
                point_up = peaks[jj] + first_nonzero - int(1. / 1.9 * dis_to_next)
            else:
                dis_to_next_down = peaks[jj + 1] - peaks[jj]
                dis_to_next_up = peaks[jj] - peaks[jj - 1]
                point_up = peaks[jj] + first_nonzero - int(1. / 1.9 * dis_to_next_up)
                point_down = peaks[jj] + first_nonzero + int(1. / 1.9 * dis_to_next_down)
            emit(corners_for(jj, point_up, point_down))

    return peaks, textline_boxes_rot


# ---------------------------------------------------------------------------
# Comparison machinery
# ---------------------------------------------------------------------------

def _outcome(fn, *args, **kwargs):
    try:
        peaks, boxes = fn(*args, **kwargs)
        return ("ok", np.asarray(peaks, np.int64), boxes)
    except Exception as e:
        return ("raised", type(e).__name__, None)


def _assert_match(img, contour, theta, vertical, info=None, label=""):
    got = _outcome(lines.separate_lines, img, contour, theta,
                   vertical=vertical)
    want = _outcome(_oracle_separate_lines, img, contour, theta,
                    vertical=vertical, info=info)
    assert got[0] == want[0], (
        f"{label}: engine {got[0]}/{got[1]}, oracle {want[0]}/{want[1]}")
    if got[0] == "raised":
        assert got[1] == want[1], (
            f"{label}: exception types differ: {got[1]} vs {want[1]}")
        return
    np.testing.assert_array_equal(got[1], want[1],
                                  err_msg=f"{label}: peaks differ")
    assert len(got[2]) == len(want[2]), (
        f"{label}: box counts {len(got[2])} vs {len(want[2])}")
    for i, (bg, bw) in enumerate(zip(got[2], want[2])):
        np.testing.assert_array_equal(
            bg, bw, err_msg=f"{label}: box {i} differs")


def _random_case(rng, vertical):
    """Randomized stripe mask + contour + theta. Stripes vary in thickness,
    extent (weak/strong peaks), and spacing (weak-valley clusters)."""
    h = int(rng.integers(60, 400))
    w = int(rng.integers(60, 400))
    img = np.zeros((h, w), np.uint8)
    span = w if vertical else h
    n_stripes = int(rng.integers(0, 9))
    pos = 0
    for _ in range(n_stripes):
        pos += int(rng.integers(4, max(6, span // 5)))
        t = int(rng.integers(2, 12))
        if pos + t >= span:
            break
        lo = int(rng.integers(0, (h if vertical else w) // 3))
        hi = int(rng.integers(2 * (h if vertical else w) // 3,
                              (h if vertical else w)))
        if vertical:
            img[lo:hi, pos:pos + t] = 1
        else:
            img[pos:pos + t, lo:hi] = 1
        pos += t
    margin_x = int(rng.integers(0, w // 4))
    margin_y = int(rng.integers(0, h // 4))
    contour = np.array([[margin_x, margin_y], [w - margin_x, margin_y],
                        [w - margin_x, h - margin_y], [margin_x, h - margin_y]])
    theta = float(rng.uniform(-20, 20))
    return img, contour, theta


def test_oracle_parity_randomized_all_branches():
    rng = np.random.default_rng(42)
    cases_seen = set()
    strengths_seen = set()
    for i in range(70):
        vertical = i % 3 == 2
        img, contour, theta = _random_case(rng, vertical)
        info = {}
        _assert_match(img, contour, theta, vertical, info=info,
                      label=f"case {i} (vertical={vertical})")
        if "case" in info:
            cases_seen.add((info["case"], vertical))
        strengths_seen.update(info.get("strengths", []))
    horizontal_cases = {c for c, v in cases_seen if not v}
    assert {"npeaks3", "two"} <= horizontal_cases, cases_seen
    assert any(v for _, v in cases_seen), "no vertical branch executed"
    assert strengths_seen == {True, False}, (
        "strong/weak multiplier split not exercised")


def test_oracle_parity_generic_branch():
    """The generic (else) branch needs len(peaks) >= 3 with a broken
    peaks/valleys interleave — reachable only through overlapping cluster
    deletions. Thin sparse stripes produce it; parity is asserted on every
    trial along the way."""
    rng = np.random.default_rng(0)
    found = False
    for trial in range(1200):
        vertical = trial % 2 == 0
        h = int(rng.integers(50, 300))
        w = int(rng.integers(50, 300))
        img = np.zeros((h, w), np.uint8)
        span = w if vertical else h
        pos = int(rng.integers(0, 6))
        while pos < span - 3:
            tk = int(rng.integers(1, 6))
            lo = int(rng.integers(0, (h if vertical else w) // 2))
            hi = int(rng.integers(lo + 3, (h if vertical else w)))
            if vertical:
                img[lo:hi, pos:pos + tk] = 1
            else:
                img[pos:pos + tk, lo:hi] = 1
            pos += tk + int(rng.integers(2, max(3, span // 6)))
        contour = np.array([[0, 0], [w, 0], [w, h], [0, h]])
        theta = float(rng.uniform(-10, 10))
        info = {}
        _assert_match(img, contour, theta, vertical, info=info,
                      label=f"generic trial {trial}")
        if info.get("case") == "generic":
            found = True
            break
    assert found, "no trial reached the generic branch"


def test_oracle_parity_single_peak_horizontal():
    img = np.zeros((120, 150), np.uint8)
    img[50:70, 10:140] = 1
    contour = np.array([[0, 0], [149, 0], [149, 119], [0, 119]])
    info = {}
    _assert_match(img, contour, 1.5, False, info=info, label="single-peak")
    assert info["case"] == "one"


def test_oracle_parity_single_peak_vertical_raises_namerror():
    img = np.zeros((150, 120), np.uint8)
    img[10:140, 50:70] = 1
    contour = np.array([[0, 0], [119, 0], [119, 149], [0, 149]])
    got = _outcome(lines.separate_lines, img, contour, 88.0, vertical=True)
    want = _outcome(_oracle_separate_lines, img, contour, 88.0, vertical=True)
    assert got[0] == want[0] == "raised"
    assert got[1] == want[1] == "NameError"


def test_oracle_parity_cluster_wraparound():
    """A weak valley at index 0 puts 0 in a deleted cluster; main.py:687
    then removes peaks[-1] (numpy wrap-around). Index 0 goes weak when the
    smoothing sigma swallows the pad valleys and the first interior gap is
    shallow (partial ink), so the generator mixes thick stripes with
    partially-inked gaps. Engine and oracle must agree box-for-box."""
    rng = np.random.default_rng(1)
    hits = 0
    for trial in range(60):
        h = int(rng.integers(200, 500))
        w = int(rng.integers(100, 300))
        img = np.zeros((h, w), np.uint8)
        pos = int(rng.integers(0, 4))
        while pos < h - 20:
            sw = int(rng.integers(20, 90))
            img[pos:pos + sw, :] = 1
            pos += sw
            gap = int(rng.integers(5, 200))
            if rng.uniform() < 0.4:   # shallow gap: partial ink remains
                frac = rng.uniform(0.3, 0.8)
                img[pos:pos + gap, :int(w * frac)] = 1
            pos += gap
        contour = np.array([[0, 0], [w, 0], [w, h], [0, h]])
        info = {}
        _assert_match(img, contour, 0.5, False,
                      info=info, label=f"wrap trial {trial}")
        if info.get("wraparound"):
            hits += 1
    assert hits >= 3, "the idx==0 wrap-around deletion was barely exercised"


def test_oracle_parity_empty_patch():
    img = np.zeros((90, 90), np.uint8)
    contour = np.array([[0, 0], [89, 0], [89, 89], [0, 89]])
    _assert_match(img, contour, 0.0, False, label="empty patch")


@pytest.mark.parametrize("scale", [1, 255])
def test_oracle_parity_mask_scale_invariance(scale):
    """The pipeline feeds 0/1 masks; the reference historically used 0/255.
    All thresholds are ratio-based, so both must match the oracle exactly."""
    img = np.zeros((200, 260), np.uint8)
    for k in range(4):
        img[30 + 42 * k:38 + 42 * k, 20:240] = scale
    contour = np.array([[10, 10], [250, 10], [250, 190], [10, 190]])
    _assert_match(img, contour, -2.0, False, label=f"scale={scale}")
