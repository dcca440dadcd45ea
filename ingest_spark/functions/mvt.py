"""Mapbox-Vector-Tile-style geometry kernels: Douglas-Peucker
simplification, rectangle clipping, tile-local quantization, and the
MVT 2.1 command/zigzag geometry encoding.

All algorithms are re-implemented from the PUBLIC specs/papers:

- geometry encoding: the Mapbox Vector Tile spec 2.1 (MoveTo=1,
  LineTo=2, ClosePath=7; ``command_integer = (id & 0x7) | (count << 3)``;
  coordinates are cursor-relative zigzag-varint deltas);
- simplification: Douglas & Peucker (1973) — iterative stack form,
  per-segment distance math vectorized in numpy;
- line clipping: Liang-Barsky parametric clipping, vectorized over all
  segments of a polyline at once;
- ring clipping: Sutherland-Hodgman against the four half-planes of the
  tile rectangle, each pass vectorized over the ring.

These kernels run batched inside Arrow UDFs (operators/tiling.py
``mvt_tiles``); per-geometry Python loops only walk the *parts* of one
geometry, never rows of a DataFrame. The reference's analog surface is
its georender payload writer (src/encoder.rs via georender-pack) — the
tile payload here is the web-map interchange twin of that storage
payload.
"""

from __future__ import annotations

import numpy as np

from . import varint

MOVE_TO = 1
LINE_TO = 2
CLOSE_PATH = 7


# ----------------------------------------------------------- zigzag

def zigzag(v):
    """Signed int array → unsigned zigzag (MVT spec §4.3.2)."""
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def unzigzag(u):
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


# ----------------------------------------- Douglas-Peucker simplify

def simplify_dp(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for the classic Douglas-Peucker simplification
    with perpendicular tolerance ``tol`` (same units as the coords).

    Iterative stack form; the farthest-point search for each segment is
    a vectorized numpy reduction. Endpoints are always kept. Output
    points are a subsequence of the input (property-tested)."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    tol2 = float(tol) * float(tol)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        px = xs[i + 1:j]
        py = ys[i + 1:j]
        ax, ay = xs[i], ys[i]
        bx, by = xs[j], ys[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            # degenerate segment: plain point distance to the anchor
            d2 = (px - ax) ** 2 + (py - ay) ** 2
        else:
            # squared perpendicular distance to the infinite line —
            # DP uses the line, not the clamped segment
            cross = (px - ax) * dy - (py - ay) * dx
            d2 = cross * cross / seg2
        k = int(np.argmax(d2))
        if d2[k] > tol2:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


# --------------------------------------------- Liang-Barsky line clip

def clip_polyline(xs, ys, x0, y0, x1, y1, eps=1e-9):
    """Clip a polyline to the rectangle [x0,x1]×[y0,y1].

    Returns a list of (xs, ys) float64 part arrays — a line that exits
    and re-enters the box splits into multiple parts. All segments are
    clipped in ONE vectorized Liang-Barsky pass; the Python loop only
    stitches consecutive surviving segments."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) < 2:
        return []
    ax, ay = xs[:-1], ys[:-1]
    dx, dy = np.diff(xs), np.diff(ys)

    t0 = np.zeros(len(dx))
    t1 = np.ones(len(dx))
    ok = np.ones(len(dx), dtype=bool)
    for p, q in (
        (-dx, ax - x0),
        (dx, x1 - ax),
        (-dy, ay - y0),
        (dy, y1 - ay),
    ):
        par = p == 0.0
        ok &= ~(par & (q < 0.0))  # parallel and fully outside
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(par, 0.0, q / np.where(par, 1.0, p))
        enter = (p < 0.0) & ~par
        leave = (p > 0.0) & ~par
        t0 = np.where(enter, np.maximum(t0, t), t0)
        t1 = np.where(leave, np.minimum(t1, t), t1)
    ok &= t0 <= t1

    parts: list[tuple[np.ndarray, np.ndarray]] = []
    cx: list[float] = []
    cy: list[float] = []
    for i in range(len(dx)):
        if not ok[i]:
            if len(cx) >= 2:
                parts.append((np.array(cx), np.array(cy)))
            cx, cy = [], []
            continue
        sx = ax[i] + t0[i] * dx[i]
        sy = ay[i] + t0[i] * dy[i]
        ex = ax[i] + t1[i] * dx[i]
        ey = ay[i] + t1[i] * dy[i]
        if cx and abs(cx[-1] - sx) <= eps and abs(cy[-1] - sy) <= eps:
            cx.append(ex)
            cy.append(ey)
        else:
            if len(cx) >= 2:
                parts.append((np.array(cx), np.array(cy)))
            cx, cy = [sx, ex], [sy, ey]
        if t1[i] < 1.0:  # left the box: close the running part
            if len(cx) >= 2:
                parts.append((np.array(cx), np.array(cy)))
            cx, cy = [], []
    if len(cx) >= 2:
        parts.append((np.array(cx), np.array(cy)))
    return parts


# ---------------------------------------- Sutherland-Hodgman ring clip

def clip_ring(xs, ys, x0, y0, x1, y1):
    """Clip a closed ring (first point NOT repeated) to the rectangle.

    Four vectorized half-plane passes (Sutherland-Hodgman). Returns
    (xs, ys) of the clipped ring (possibly empty). Concave rings that
    wrap a corner gain collinear boundary vertices — standard for tile
    clipping and harmless to the encoder."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    for axis, bound, keep_ge in (
        (0, x0, True), (0, x1, False), (1, y0, True), (1, y1, False),
    ):
        if len(xs) == 0:
            return xs, ys
        v = xs if axis == 0 else ys
        inside = v >= bound if keep_ge else v <= bound
        if inside.all():
            continue
        if not inside.any():
            return np.empty(0), np.empty(0)
        nv = np.roll(v, -1)
        nxs, nys = np.roll(xs, -1), np.roll(ys, -1)
        n_inside = np.roll(inside, -1)
        crosses = inside != n_inside
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            t = np.where(crosses, (bound - v) / np.where(nv == v, 1.0, nv - v), 0.0)
        ix = xs + t * (nxs - xs)
        iy = ys + t * (nys - ys)
        if axis == 0:
            ix = np.where(crosses, bound, ix)
        else:
            iy = np.where(crosses, bound, iy)
        out_x: list[float] = []
        out_y: list[float] = []
        for i in range(len(xs)):
            if inside[i]:
                out_x.append(xs[i])
                out_y.append(ys[i])
            if crosses[i]:
                out_x.append(ix[i])
                out_y.append(iy[i])
        xs = np.array(out_x)
        ys = np.array(out_y)
    return xs, ys


# -------------------------------------------------------- quantization

def quantize(xs, ys):
    """Round float tile-local coords to integer grid coords and drop
    consecutive duplicates. floor(x+0.5) = deterministic half-up."""
    qx = np.floor(np.asarray(xs, dtype=np.float64) + 0.5).astype(np.int64)
    qy = np.floor(np.asarray(ys, dtype=np.float64) + 0.5).astype(np.int64)
    if len(qx) == 0:
        return qx, qy
    same = np.zeros(len(qx), dtype=bool)
    same[1:] = (qx[1:] == qx[:-1]) & (qy[1:] == qy[:-1])
    return qx[~same], qy[~same]


def _ring_area2(qx, qy) -> int:
    """Twice the signed shoelace area of an integer ring (int64)."""
    x2, y2 = np.roll(qx, -1), np.roll(qy, -1)
    return int(np.sum(qx * y2 - x2 * qy))


def _ring_area2_f(xs, ys) -> float:
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    return float(np.sum(xs * y2 - x2 * ys))


def _orient(xs, ys, positive: bool):
    """Enforce ring winding: positive (exterior, MVT spec §4.3.4.4 —
    surveyor's-formula area > 0 in the y-down tile frame) or negative
    (interior). Reversal keeps the vertex set; callers re-anchor the
    start vertex afterwards."""
    a = _ring_area2_f(xs, ys)
    if (a < 0) == positive and a != 0:
        return xs[::-1].copy(), ys[::-1].copy()
    return xs, ys


# --------------------------------------------------- geometry encoding

def _emit(cmds: list[int], cmd_id: int, count: int):
    cmds.append((cmd_id & 0x7) | (count << 3))


def encode_geometry(gtype: str, parts, cursor=(0, 0)) -> bytes:
    """MVT-spec command-stream encoding of one geometry.

    ``parts`` is a list of (qx, qy) integer arrays: one entry per line
    part or polygon ring (rings unclosed, ≥3 points, outer first).
    Points pass a single part holding all points (MultiPoint). Deltas
    are cursor-relative across parts, zigzag + LEB128 varint encoded."""
    ints: list[int] = []
    cx, cy = cursor
    for qx, qy in parts:
        qx = np.asarray(qx, dtype=np.int64)
        qy = np.asarray(qy, dtype=np.int64)
        n = len(qx)
        if n == 0:
            continue
        dx = np.empty(n, dtype=np.int64)
        dy = np.empty(n, dtype=np.int64)
        dx[0], dy[0] = qx[0] - cx, qy[0] - cy
        dx[1:], dy[1:] = np.diff(qx), np.diff(qy)
        zz = np.empty(2 * n, dtype=np.uint64)
        zz[0::2], zz[1::2] = zigzag(dx), zigzag(dy)
        if gtype == "point":
            _emit(ints, MOVE_TO, n)
            ints.extend(int(z) for z in zz)
        elif gtype == "line":
            _emit(ints, MOVE_TO, 1)
            ints.extend((int(zz[0]), int(zz[1])))
            _emit(ints, LINE_TO, n - 1)
            ints.extend(int(z) for z in zz[2:])
        elif gtype == "polygon":
            _emit(ints, MOVE_TO, 1)
            ints.extend((int(zz[0]), int(zz[1])))
            _emit(ints, LINE_TO, n - 1)
            ints.extend(int(z) for z in zz[2:])
            _emit(ints, CLOSE_PATH, 1)
        else:
            raise ValueError(f"unknown gtype {gtype!r}")
        cx, cy = int(qx[-1]), int(qy[-1])
    return b"".join(varint.encode(i) for i in ints)


def decode_geometry(gtype: str, buf: bytes):
    """Inverse of encode_geometry → list of (qx, qy) int64 arrays."""
    pos = 0
    cx = cy = 0
    parts = []
    cur_x: list[int] = []
    cur_y: list[int] = []

    def _flush():
        nonlocal cur_x, cur_y
        if cur_x:
            parts.append((np.array(cur_x, dtype=np.int64),
                          np.array(cur_y, dtype=np.int64)))
        cur_x, cur_y = [], []

    while pos < len(buf):
        used, cmd = varint.decode(buf, pos)
        pos += used
        cmd_id, count = cmd & 0x7, cmd >> 3
        if cmd_id == CLOSE_PATH:
            _flush()
            continue
        if cmd_id == MOVE_TO and gtype != "point":
            _flush()
        for _ in range(count):
            used, zx = varint.decode(buf, pos)
            pos += used
            used, zy = varint.decode(buf, pos)
            pos += used
            cx += int(unzigzag(np.array([zx], dtype=np.uint64))[0])
            cy += int(unzigzag(np.array([zy], dtype=np.uint64))[0])
            cur_x.append(cx)
            cur_y.append(cy)
    _flush()
    return parts


# ----------------------------------------------- per-geometry pipeline

def _process_ring(xs, ys, positive, lo, hi, tol):
    """Clip → orient (MVT winding) → lex-min re-anchor → DP → quantize
    one ring; returns (qx, qy) or None if it degenerates."""
    cx, cy = clip_ring(xs, ys, lo, lo, hi, hi)
    if len(cx) < 3:
        return None
    cx, cy = _orient(cx, cy, positive)
    # rotate the ring to start at its lexicographic-min vertex: DP
    # always keeps its two endpoints, so anchoring at an extreme point
    # protects a true corner and makes the result independent of the
    # input ring's starting vertex
    start = int(np.lexsort((cy, cx))[0])
    cx, cy = np.roll(cx, -start), np.roll(cy, -start)
    if tol > 0.0 and len(cx) > 4:
        k = simplify_dp(np.append(cx, cx[0]), np.append(cy, cy[0]), tol)
        cx, cy = cx[k[:-1]], cy[k[:-1]]
    qx, qy = quantize(cx, cy)
    if len(qx) >= 3 and qx[0] == qx[-1] and qy[0] == qy[-1]:
        qx, qy = qx[:-1], qy[:-1]
    if len(qx) < 3:
        return None
    a2 = _ring_area2(qx, qy)
    # quantization may collapse the ring (or, for slivers, flip its
    # sign); only emit rings whose final winding matches their role
    if a2 == 0 or (a2 > 0) != positive:
        return None
    return qx, qy


def tile_geometry(gtype, xs, ys, extent=4096, buf=64, tol=1.0, holes=None):
    """Full per-(geometry, tile) chain on tile-local FLOAT coords
    (0..extent inside the tile): clip to the buffered tile square,
    Douglas-Peucker simplify at ``tol`` tile units, quantize, drop
    degenerates. ``holes`` (polygons only) is a list of (hxs, hys)
    interior rings; exterior rings are emitted with positive
    surveyor's-formula area and interiors negative, per MVT §4.3.4.4.
    Returns the encoded parts list (possibly empty)."""
    lo, hi = -float(buf), float(extent) + float(buf)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    parts = []
    if gtype == "point":
        m = (xs >= lo) & (xs <= hi) & (ys >= lo) & (ys <= hi)
        if m.any():
            qx, qy = np.floor(xs[m] + 0.5).astype(np.int64), np.floor(ys[m] + 0.5).astype(np.int64)
            parts.append((qx, qy))
        return parts
    if gtype == "line":
        for px, py in clip_polyline(xs, ys, lo, lo, hi, hi):
            if tol > 0.0 and len(px) > 2:
                k = simplify_dp(px, py, tol)
                px, py = px[k], py[k]
            qx, qy = quantize(px, py)
            if len(qx) >= 2:
                parts.append((qx, qy))
        return parts
    if gtype == "polygon":
        outer = _process_ring(xs, ys, True, lo, hi, tol)
        if outer is None:
            return parts
        parts.append(outer)
        for hxs, hys in holes or ():
            hole = _process_ring(np.asarray(hxs, dtype=np.float64),
                                 np.asarray(hys, dtype=np.float64),
                                 False, lo, hi, tol)
            if hole is not None:
                parts.append(hole)
        return parts
    raise ValueError(f"unknown gtype {gtype!r}")
