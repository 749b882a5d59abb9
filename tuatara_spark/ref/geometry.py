"""Detection post-processing geometry (reference tuatara.cpp:119-274).

Pure NumPy re-implementations of the OpenCV primitives the reference
delegates to, with the reference's exact call semantics:

* connected-component labeling with stats, 4-connectivity, labels numbered
  in raster order of each component's first pixel
  (cv::connectedComponentsWithStats, tuatara.cpp:139-142);
* size-adaptive binary dilation with a rect kernel inside an ROI
  (cv::getStructuringElement + cv::dilate, tuatara.cpp:162-174);
* minimum-area rotated rectangle via convex hull + rotating calipers
  (cv::minAreaRect, tuatara.cpp:176-181, 248);
* coordinate rescale + re-fit (adjust_result_coordinates, tuatara.cpp:236-253);
* RotatedRect::boundingRect integer rule (used by the crop at tuatara.cpp:416);
* bbox output with half-away-from-zero rounding (std::round, quirk Q7,
  tuatara.cpp:256-274).

These are clean-room implementations from the public algorithm definitions;
no reference code is copied (the reference delegates all of this to OpenCV).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Connected components (S9)
# ---------------------------------------------------------------------------

def connected_components_with_stats(binary: np.ndarray):
    """4-connectivity CCL with stats, mirroring the reference's use of
    cv::connectedComponentsWithStats (tuatara.cpp:142).

    binary: 2D array, nonzero = foreground.

    Returns (n_labels, labels, stats) where
      labels: (H, W) int32, 0 = background; component labels 1..n_labels-1
              are numbered in raster order of each component's first pixel
              (quirk Q5 — downstream output order depends on this);
      stats:  (n_labels, 5) int64 columns [left, top, width, height, area]
              (same column meaning as cv::CC_STAT_*; row 0 = background, its
              stats are not computed — the reference never reads them).

    Implementation: run-length two-pass union-find (rows decomposed into
    runs; runs unioned across adjacent rows on column-interval overlap).
    Vectorized run extraction; the union sweep loops over runs, whose count
    is small (O(#ink transitions), not O(pixels)).
    """
    b = np.asarray(binary) != 0
    H, W = b.shape
    # --- run extraction (vectorized) ---
    padded = np.zeros((H, W + 2), dtype=np.int8)
    padded[:, 1:-1] = b
    d = np.diff(padded, axis=1)
    starts = np.argwhere(d == 1)   # raster order (row-major)
    ends_rc = np.argwhere(d == -1)
    run_row = starts[:, 0].astype(np.int64)
    run_s = starts[:, 1].astype(np.int64)        # inclusive start col
    run_e = ends_rc[:, 1].astype(np.int64)       # exclusive end col
    nruns = run_row.shape[0]
    labels = np.zeros((H, W), dtype=np.int32)
    if nruns == 0:
        return 1, labels, np.zeros((1, 5), dtype=np.int64)

    # --- union-find across adjacent rows ---
    parent = np.arange(nruns, dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # per-row run index ranges
    counts = np.bincount(run_row, minlength=H)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    for r in range(1, H):
        c0, c1 = offsets[r], offsets[r + 1]
        if c1 == c0:
            continue
        p0, p1 = offsets[r - 1], offsets[r]
        if p1 == p0:
            continue
        j = p0
        for i in range(c0, c1):
            si, ei = run_s[i], run_e[i]
            # advance past prev-row runs ending at or before si (4-conn:
            # strict column overlap required)
            while j < p1 and run_e[j] <= si:
                j += 1
            k = j
            while k < p1 and run_s[k] < ei:
                ra, rb = find(i), find(k)
                if ra != rb:
                    # point larger root at smaller → root is the earliest
                    # (raster-first) run of the component
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
                k += 1
            if k > p0:
                j = k - 1  # last overlapping run may also overlap next run

    # full path compression (vectorized fixpoint)
    while True:
        nxt = parent[parent]
        if np.array_equal(nxt, parent):
            break
        parent = nxt

    # --- label numbering: raster order of first pixel == root run index ---
    roots, root_inverse = np.unique(parent, return_inverse=True)
    # np.unique sorts roots ascending == raster order of first run ✓
    n_comp = roots.shape[0]
    run_labels = (root_inverse + 1).astype(np.int32)  # 1-based

    # --- paint label image (vectorized scatter) ---
    lengths = run_e - run_s
    total = int(lengths.sum())
    flat_starts = run_row * W + run_s
    cum = np.cumsum(lengths) - lengths
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(cum, lengths)
           + np.repeat(flat_starts, lengths))
    labels.ravel()[pos] = np.repeat(run_labels, lengths)

    # --- stats (segmented min/max/sum via stable sort + reduceat) ---
    order = np.argsort(run_labels, kind="stable")
    sl = run_labels[order]
    seg = np.flatnonzero(np.diff(sl)) + 1
    seg_starts = np.concatenate(([0], seg))
    left = np.minimum.reduceat(run_s[order], seg_starts)
    right = np.maximum.reduceat(run_e[order], seg_starts) - 1
    top = np.minimum.reduceat(run_row[order], seg_starts)
    bot = np.maximum.reduceat(run_row[order], seg_starts)
    area = np.add.reduceat(lengths[order], seg_starts)
    stats = np.zeros((n_comp + 1, 5), dtype=np.int64)
    stats[1:, 0] = left
    stats[1:, 1] = top
    stats[1:, 2] = right - left + 1
    stats[1:, 3] = bot - top + 1
    stats[1:, 4] = area
    return n_comp + 1, labels, stats


# ---------------------------------------------------------------------------
# Dilation (S13)
# ---------------------------------------------------------------------------

def dilate_binary(img: np.ndarray, ksize: int) -> np.ndarray:
    """Binary dilation with a ksize×ksize rect kernel, OpenCV default anchor
    (k//2, k//2): dst(p) = max over offsets o in [-(k//2), k-1-k//2] of
    src(p+o), out-of-bounds treated as 0 (equivalent to cv::dilate's
    -inf constant border for non-negative data). Mirrors tuatara.cpp:173-174.

    Separable sliding max via shift-accumulate (k is small: the reference's
    niter is O(sqrt(component size))).
    """
    k = int(ksize)
    if k <= 1:
        return img.copy()
    a = k // 2
    src = np.asarray(img)
    H, W = src.shape
    # rows pass
    tmp = np.zeros_like(src)
    for o in range(-a, k - a):
        lo_d, hi_d = max(0, -o), min(H, H - o)
        lo_s, hi_s = max(0, o), min(H, H + o)
        np.maximum(tmp[lo_d:hi_d], src[lo_s:hi_s], out=tmp[lo_d:hi_d])
    out = np.zeros_like(src)
    for o in range(-a, k - a):
        lo_d, hi_d = max(0, -o), min(W, W - o)
        lo_s, hi_s = max(0, o), min(W, W + o)
        np.maximum(out[:, lo_d:hi_d], tmp[:, lo_s:hi_s], out=out[:, lo_d:hi_d])
    return out


def dilation_niter(size: int, w: int, h: int) -> int:
    """Size-adaptive dilation radius, quirk Q2: the ×2 is INSIDE the sqrt —
    ``int(sqrt(size * min(w,h) / (w*h) * 2))`` (tuatara.cpp:166; C++ int
    arithmetic: size*min(w,h) is integer, / (w*h) is integer division before
    the float sqrt? No — C++ promotes: size*min(w,h)/(w*h)*2 is ALL integer
    arithmetic (int*int/int*int), THEN sqrt of the int result).
    """
    # C++: all-int expression evaluated left-to-right with integer division,
    # then std::sqrt(int) -> double, truncated back to int.
    v = size * min(w, h) // (w * h) * 2
    return int(np.sqrt(v))


# ---------------------------------------------------------------------------
# Min-area rotated rect (S14) — convex hull + rotating calipers
# ---------------------------------------------------------------------------

def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull, CCW, no collinear points kept.

    points: (N, 2) array of (x, y). Returns (H, 2) float64.

    Implementation notes: lexicographic dedup via np.lexsort (equivalent to
    np.unique(axis=0) but ~5x faster), and the chain loop runs on plain
    Python floats — same float64 IEEE arithmetic, far less per-element
    overhead than NumPy scalars for the small point sets this sees.
    """
    arr = np.asarray(points, dtype=np.float64)
    order = np.lexsort((arr[:, 1], arr[:, 0]))
    srt = arr[order]
    keep = np.ones(srt.shape[0], dtype=bool)
    keep[1:] = (srt[1:] != srt[:-1]).any(axis=1)
    pts = srt[keep]
    n = pts.shape[0]
    if n <= 2:
        return pts
    seq = [(float(x), float(y)) for x, y in pts]

    def half(s):
        out: list[tuple[float, float]] = []
        for px, py in s:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (py - oy) - (ay - oy) * (px - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append((px, py))
        return out

    lower = half(seq)
    upper = half(seq[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect(points: np.ndarray) -> np.ndarray:
    """Minimum-area bounding rectangle of a point set (cv::minAreaRect
    semantics as used at tuatara.cpp:179 and 248). Returns the 4 corners,
    (4, 2) float32.

    Corner order is a deterministic function of the winning hull edge
    (NOT OpenCV's bl/tl/tr/br convention); every reference use site only
    takes min/max over the corners or an axis-aligned bounding rect, so
    corner order never affects output (see tuatara.cpp:256-274, 416).

    Rotating calipers over hull-edge directions; ties broken by first
    (lowest-index) edge with strictly smaller area — deterministic.
    """
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim != 2 or pts.shape[1] != 2:
        raise ValueError("points must be (N, 2)")
    hull = convex_hull(pts)
    h = hull.shape[0]
    if h == 1:
        return np.repeat(hull, 4, axis=0).astype(np.float32)
    if h == 2:
        p0, p1 = hull
        return np.asarray([p0, p1, p1, p0], dtype=np.float32)
    edges = np.roll(hull, -1, axis=0) - hull          # (h, 2)
    lens = np.hypot(edges[:, 0], edges[:, 1])
    good = lens > 0
    dirs = edges[good] / lens[good, None]             # (m, 2) unit dirs
    normals = np.stack([-dirs[:, 1], dirs[:, 0]], 1)  # (m, 2)
    pd = dirs @ hull.T                                # (m, h) projections
    pn = normals @ hull.T
    d0, d1 = pd.min(1), pd.max(1)
    n0, n1 = pn.min(1), pn.max(1)
    areas = (d1 - d0) * (n1 - n0)
    i = int(np.argmin(areas))                         # first strict min
    d, nrm = dirs[i], normals[i]
    corners = np.asarray([
        d * d0[i] + nrm * n0[i],
        d * d1[i] + nrm * n0[i],
        d * d1[i] + nrm * n1[i],
        d * d0[i] + nrm * n1[i],
    ], dtype=np.float32)
    return corners


# ---------------------------------------------------------------------------
# Square override + corner canonicalization (S15, S16)
# ---------------------------------------------------------------------------

def square_override(corners: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Axis-align near-square boxes (tuatara.cpp:183-195): if the rect's
    aspect ratio is within 10% of square, replace corners with the
    axis-aligned extremes of the component pixels.

    NOTE (parity honesty): in the reference, the resulting corner array is
    computed and then DISCARDED — ``det`` receives the RotatedRect, not the
    corners (tuatara.cpp:200) — so this function never affects reference
    output. Implemented + tested for stage parity; the pipeline calls it
    only in debug mode.
    """
    c = np.asarray(corners, dtype=np.float64)
    box_w = float(np.hypot(*(c[0] - c[1])))
    box_h = float(np.hypot(*(c[1] - c[2])))
    box_ratio = max(box_w, box_h) / (min(box_w, box_h) + 1e-5)
    if abs(1 - box_ratio) <= 0.1:
        pts = np.asarray(points)
        l, t = pts[:, 0].min(), pts[:, 1].min()
        r, b = pts[:, 0].max(), pts[:, 1].max()
        return np.asarray([[l, t], [r, t], [r, b], [l, b]], dtype=np.float32)
    return np.asarray(c, dtype=np.float32)


def canonicalize_corners(corners: np.ndarray) -> np.ndarray:
    """Rotate the 4 corners so the one minimizing x+y comes first
    (tuatara.cpp:197-198). Also output-neutral in the reference (see
    square_override note)."""
    c = np.asarray(corners)
    start = int(np.argmin(c[:, 0] + c[:, 1]))
    return np.roll(c, -start, axis=0)


# ---------------------------------------------------------------------------
# Rescale, bounding rect, bbox output (S17, S18 helper, S26)
# ---------------------------------------------------------------------------

def adjust_result_coordinates(corner_list: list[np.ndarray], ratio_w: float,
                              ratio_h: float, ratio_net: float = 2.0) -> list[np.ndarray]:
    """Scale box corners from half-res heatmap space back to source-image
    space and re-fit a min-area rect over the scaled corners
    (adjust_result_coordinates, tuatara.cpp:236-253).

    Fast path: with equal x/y ratios (always true in the reference —
    tuatara.cpp:360-361 sets both to 1/target_ratio) a uniformly scaled
    rectangle IS its own min-area rect, so the re-fit is the identity on
    the corner set and is skipped; every reference consumer of the result
    takes only corner min/max (crop boundingRect at 416, bbox output at
    256-274), so outputs are unchanged. Unequal ratios take the full
    re-fit path.
    """
    uniform = ratio_w == ratio_h
    out = []
    for corners in corner_list:
        c = np.asarray(corners, dtype=np.float64).copy()
        c[:, 0] *= ratio_w * ratio_net
        c[:, 1] *= ratio_h * ratio_net
        out.append(c.astype(np.float32) if uniform else min_area_rect(c))
    return out


def bounding_rect(corners: np.ndarray) -> tuple[int, int, int, int]:
    """cv::RotatedRect::boundingRect integer rule (used by the crop at
    tuatara.cpp:416): x = floor(min_x), y = floor(min_y),
    w = ceil(max_x) - x + 1, h = ceil(max_y) - y + 1."""
    c = np.asarray(corners, dtype=np.float64)
    x = int(np.floor(c[:, 0].min()))
    y = int(np.floor(c[:, 1].min()))
    w = int(np.ceil(c[:, 0].max())) - x + 1
    h = int(np.ceil(c[:, 1].max())) - y + 1
    return x, y, w, h


def round_half_away(x: np.ndarray) -> np.ndarray:
    """std::round semantics — half away from zero (quirk Q7; np.round is
    half-to-even and would differ at .5 boundaries)."""
    x = np.asarray(x)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def rect_to_tesseract_bbox(corners: np.ndarray) -> np.ndarray:
    """Rotated-rect corners → axis-aligned [min_x, min_y, max_x, max_y],
    rounded half-away-from-zero, float32 (tuatara.cpp:256-274)."""
    c = np.asarray(corners, dtype=np.float64)
    vals = np.asarray([c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max()])
    return round_half_away(vals).astype(np.float32)
