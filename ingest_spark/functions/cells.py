"""Spatial cell indexing: S2 cells + hexagonal grid (H3-analog).

north_rule requires H3 res-8 + S2 level-12 cell assignment via batched
vectorized encoders. Everything here is numpy-vectorized (no per-row
Python) and wrapped by pandas UDFs in operators/spatial.py.

**S2**: a faithful implementation of the public S2 geometry cell-id
scheme (s2geometry.io; quadratic ST projection, Hilbert curve via
4-bit lookup tables, 64-bit cell ids: 3 face bits + 2·level position
bits + trailing 1). Implemented from the published algorithm — no S2
library is available in this environment.

**Hex cells**: the public encoder (``hex_cell``/``h3_cell``) emits
H3-spec-derived ids (parity-gated against the published H3 spec; see h3core.py scope note) by default — the full icosahedral algorithm implemented
from the published spec in pure numpy (functions/h3core.py; no `h3`
wheel needed; gated library arbitration kept via SPARK_GRAFT_USE_H3).
A deterministic PLANAR axial grid (``hex_cell_id``; aperture-7 edge
scaling matched to H3's res-8 mean edge ≈ 461 m) remains first-class
as the RING-MATH grid: kNN k_ring expansion and bbox covers key on it
explicitly (its planar geometry is what the ring-distance guarantee is
proven on), and ``SPARK_GRAFT_PLANAR_HEX=1`` routes the public
encoder to it as a fallback.

Reference parity: cell assignment generalizes the reference's
grid-bucket assignment (src/lib.rs:427-444 grid, src/divide.rs:43-52
max-overlap); the quadtree itself lives in operators/tiling.py.
"""

from __future__ import annotations

import math
import os

import numpy as np

# ------------------------------------------------------------------ S2

_LOOKUP_BITS = 4
_SWAP_MASK = 0x01
_INVERT_MASK = 0x02

_POS_TO_ORIENTATION = (_SWAP_MASK, 0, 0, _INVERT_MASK + _SWAP_MASK)
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped & inverted
)

_MAX_LEVEL = 30
_POS_BITS = 2 * _MAX_LEVEL + 1


def _build_lookups():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)

    def init_cell(level, i, j, orig_orientation, pos, orientation):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            ij = r[index]
            init_cell(
                level,
                i + (ij >> 1),
                j + (ij & 1),
                orig_orientation,
                pos + index,
                orientation ^ _POS_TO_ORIENTATION[index],
            )

    for orientation in range(4):
        init_cell(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()


def _xyz_from_lonlat(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(lat)
    theta = np.radians(lon)
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    face = face + np.where(
        np.choose(face, [x, y, z]) < 0, 3, 0
    )
    # u/v per face — inverse of the canonical S2 FaceUVtoXYZ axes:
    #   f0:( 1, u, v) f1:(-u, 1, v) f2:(-u,-v, 1)
    #   f3:(-1,-v,-u) f4:( v,-1,-u) f5:( v, u,-1)
    u = np.empty_like(x)
    v = np.empty_like(x)
    table = (
        lambda s: (y[s] / x[s], z[s] / x[s]),     # f0: u= y/x, v= z/x
        lambda s: (-x[s] / y[s], z[s] / y[s]),    # f1: u=-x/y, v= z/y
        lambda s: (-x[s] / z[s], -y[s] / z[s]),   # f2: u=-x/z, v=-y/z
        lambda s: (z[s] / x[s], y[s] / x[s]),     # f3: u= z/x, v= y/x
        lambda s: (z[s] / y[s], -x[s] / y[s]),    # f4: u= z/y, v=-x/y
        lambda s: (-y[s] / z[s], -x[s] / z[s]),   # f5: u=-y/z, v=-x/z
    )
    for f in range(6):
        sel = face == f
        if sel.any():
            u[sel], v[sel] = table[f](sel)
    return face, u, v


def _st_from_uv(u):
    """S2 quadratic projection uv→st (the library default)."""
    s = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0, s, 1.0 - s)


def s2_cell_id(lon, lat, level: int = 12) -> np.ndarray:
    """Vectorized (lon, lat) → S2 cell id at ``level`` (int64 view of the
    canonical uint64 id)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv(x, y, z)

    max_size = 1 << _MAX_LEVEL
    i = np.clip((_st_from_uv(u) * max_size).astype(np.int64), 0, max_size - 1)
    j = np.clip((_st_from_uv(v) * max_size).astype(np.int64), 0, max_size - 1)

    # Hilbert: 8 chunks of 4 bits, MSB first
    n = np.asarray(face, dtype=np.uint64) << np.uint64(_POS_BITS - 1)
    bits = (np.asarray(face, dtype=np.uint64) & np.uint64(_SWAP_MASK))
    i = i.astype(np.uint64)
    j = j.astype(np.uint64)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        shift = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> shift) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> shift) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)

    id_l30 = n * np.uint64(2) + np.uint64(1)
    if level < _MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
        id_l30 = (id_l30 & ~(lsb - np.uint64(1))) | lsb
    return id_l30.view(np.int64)


def s2_level(cell_id) -> np.ndarray:
    """Level of (u)int64 S2 cell ids (position of lowest set bit)."""
    cid = np.asarray(cell_id).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return (_MAX_LEVEL - (np.log2(lsb.astype(np.float64)).astype(np.int64) >> 1)).astype(
        np.int64
    )


def s2_parent(cell_id, level: int) -> np.ndarray:
    cid = np.asarray(cell_id).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return ((cid & ~(lsb - np.uint64(1))) | lsb).view(np.int64)


# ------------------------------------------------------------ hex grid

# aperture-7 scaling calibrated to H3: res-8 mean hex edge ≈ 461.354 m
# ≈ 0.0041444° at the equator ⇒ edge(res) = _EDGE0_DEG / √7^res
_SQRT7 = math.sqrt(7.0)
_EDGE0_DEG = 0.0041444 * _SQRT7**8
_SQRT3 = math.sqrt(3.0)

_AXIAL_OFFSET = 1 << 27  # bias so q/r pack as non-negative 28-bit ints


def hex_edge_deg(res: int) -> float:
    return _EDGE0_DEG / _SQRT7**res


def _axial_round(qf: np.ndarray, rf: np.ndarray):
    """Cube-rounding of fractional axial coords (standard hex math)."""
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_axial(lon, lat, res: int = 8):
    """(lon, lat) → integer axial coords (q, r) on a pointy-top hex grid
    of edge ``hex_edge_deg(res)`` in degree space."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    size = hex_edge_deg(res)
    qf = (_SQRT3 / 3.0 * lon - lat / 3.0) / size
    rf = (2.0 / 3.0 * lat) / size
    return _axial_round(qf, rf)


def hex_cell_id(lon, lat, res: int = 8) -> np.ndarray:
    """Vectorized (lon, lat) → int64 hex cell id:
    ``res(7 bits) | q+2^27 (28 bits) | r+2^27 (28 bits)``."""
    q, r = hex_axial(lon, lat, res)
    return (
        (np.int64(res) << np.int64(56))
        | ((q + _AXIAL_OFFSET) << np.int64(28))
        | (r + _AXIAL_OFFSET)
    )


def hex_unpack(cell_id):
    cid = np.asarray(cell_id, dtype=np.int64)
    res = (cid >> np.int64(56)) & np.int64(0x7F)
    q = ((cid >> np.int64(28)) & np.int64((1 << 28) - 1)) - _AXIAL_OFFSET
    r = (cid & np.int64((1 << 28) - 1)) - _AXIAL_OFFSET
    return res, q, r


def hex_center(cell_id):
    """Cell id → (lon, lat) of the hex center."""
    res, q, r = hex_unpack(cell_id)
    size = _EDGE0_DEG / _SQRT7 ** res.astype(np.float64)
    lon = size * _SQRT3 * (q.astype(np.float64) + r.astype(np.float64) / 2.0)
    lat = size * 1.5 * r.astype(np.float64)
    return lon, lat


_HEX_DIRS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def hex_ring(cell_id: int, k: int) -> list[int]:
    """Cell ids exactly ``k`` rings away (k=0 → [cell]); deterministic
    enumeration order (the kNN expansion path, SURVEY §2.3 note)."""
    res, q, r = hex_unpack(np.asarray([cell_id]))
    res, q, r = int(res[0]), int(q[0]), int(r[0])
    if k == 0:
        return [int(cell_id)]
    out = []
    cq, cr = q + _HEX_DIRS[4][0] * k, r + _HEX_DIRS[4][1] * k
    for side in range(6):
        dq, dr = _HEX_DIRS[side]
        for _ in range(k):
            out.append(
                (res << 56) | ((cq + _AXIAL_OFFSET) << 28) | (cr + _AXIAL_OFFSET)
            )
            cq += dq
            cr += dr
    return out


def hex_k_ring(cell_id: int, k: int) -> list[int]:
    """All cells within ``k`` rings (1 + 3k(k+1) cells)."""
    out = []
    for ring in range(k + 1):
        out.extend(hex_ring(cell_id, ring))
    return out


# --------------------------------------------------- real H3 (default)

from . import h3core as _h3core  # noqa: E402  (real H3 in pure numpy)

_USE_PLANAR_HEX = os.environ.get("SPARK_GRAFT_PLANAR_HEX") == "1"
_USE_REAL_H3 = os.environ.get("SPARK_GRAFT_USE_H3") == "1"
try:  # pragma: no cover - not installed in this environment
    import h3 as _h3  # type: ignore

    _HAVE_H3 = True
except ImportError:
    _h3 = None
    _HAVE_H3 = False


def use_real_h3() -> bool:
    """True unless the planar fallback flag is set: the interop cell
    surface (``hex_cell`` / with_cells) emits H3-spec-derived ids (parity-gated against the published H3 spec; see h3core.py scope note) by default
    since round 4 (functions/h3core.py, pure numpy — no library
    needed). Callers with a JVM-expression twin of the PLANAR grid must
    use the Python kernel whenever this is True."""
    return not _USE_PLANAR_HEX


def h3_cell(lon, lat, res: int = 8) -> np.ndarray:
    """Real H3 cell ids (int64). Default: the in-repo pure-numpy
    implementation (h3core.latlng_to_cell — validated against embedded
    public vectors). With SPARK_GRAFT_USE_H3=1 and the `h3` wheel
    importable, routes through the library instead (the original
    parity gate, kept so the wheel can arbitrate if ever present)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if _USE_REAL_H3 and _HAVE_H3:  # pragma: no cover - wheel absent here
        return np.asarray(
            [_h3.str_to_int(_h3.latlng_to_cell(la, lo, res)) for lo, la in zip(lon, lat)],
            dtype=np.int64,
        )
    return _h3core.latlng_to_cell(lon, lat, res)


def hex_cell(lon, lat, res: int = 8) -> np.ndarray:
    """Public hex encoder — H3-spec-derived res-`res` ids by default (parity-gated; h3core.py scope note); the
    planar builtin grid only with SPARK_GRAFT_PLANAR_HEX=1 (the grid
    itself stays first-class for ring math: kNN k_ring expansion and
    bbox covers key on it explicitly via hex_cell_id)."""
    if _USE_PLANAR_HEX:
        return hex_cell_id(lon, lat, res)
    return h3_cell(lon, lat, res)


def hex_cover_size(x0: float, y0: float, x1: float, y1: float, res: int = 8) -> int:
    """Upper-bound count of hex_cover_bbox without enumerating —
    callers use it to fall back to a plain scan for huge boxes."""
    size = hex_edge_deg(res)
    pad = 2.0 * size
    rows = int(math.ceil((y1 - y0 + 2 * pad) * 2.0 / 3.0 / size)) + 2
    cols = int(math.ceil((x1 - x0 + 2 * pad) / (_SQRT3 * size))) + 2
    return max(rows, 0) * max(cols, 0)


def hex_cover_bbox(x0: float, y0: float, x1: float, y1: float, res: int = 8) -> list[int]:
    """All hex cells whose center could own a point in the bbox —
    the covering set for an indexed bbox read (eyros tree-descent
    analog: turns a spatial predicate into a cell-id IN-list that
    prunes a (cell-sorted) table's row groups). Padded by one cell so
    boundary points binned to a neighboring center are included."""
    size = hex_edge_deg(res)
    pad = 2.0 * size
    qs, rs = [], []
    # enumerate axial rows covering the padded lat range, then q range
    # per row from the lon range (pointy-top axial geometry)
    r_min = int(math.floor((y0 - pad) * 2.0 / 3.0 / size))
    r_max = int(math.ceil((y1 + pad) * 2.0 / 3.0 / size))
    out = []
    for r in range(r_min, r_max + 1):
        # lon = size*sqrt(3)*(q + r/2) → q bounds from lon bounds
        q_min = int(math.floor(((x0 - pad) / (_SQRT3 * size)) - r / 2.0))
        q_max = int(math.ceil(((x1 + pad) / (_SQRT3 * size)) - r / 2.0))
        for q in range(q_min, q_max + 1):
            out.append(
                (res << 56) | ((q + _AXIAL_OFFSET) << 28) | (r + _AXIAL_OFFSET)
            )
    return out


def h3_cover_bbox(x0: float, y0: float, x1: float, y1: float, res: int = 8) -> list[int]:
    """All REAL-H3 cells whose center could own a point inside the bbox
    — the covering IN-list for an indexed bbox read over a table keyed
    by `hex_cell` (H3 ids). Derived by GUARANTEED-HIT sampling:
    a cell owning a bbox point has its center within one cell diameter
    of the box, so with the box padded by 2.5 edge-lengths the whole
    hex lies inside the padded region, and a sample grid with step
    ≤ 0.55·edge lands at least one probe in it: the farthest grid
    point from any location is step·√2/2 ≈ 0.39·edge_mean, under the
    smallest real cells' inradius even with the ~2x area variation and
    icosa-vertex distortion of the real grid (0.87·edge_min with
    edge_min ≥ 0.5·edge_mean — round-5 ADVICE: the previous 0.8·edge
    step was calibrated on the MEAN edge only and could in principle
    miss a worst-case minimum cell). The h3_cover_size budget guard
    bounds the probe count, so the denser grid costs only a constant
    factor. (The lon step is NOT widened by 1/cos(lat): H3 cells get
    WIDER in lon-degrees toward the poles, so the unscaled grid is
    strictly denser than required — conservative, never lossy.)"""
    edge = _h3core.h3_edge_deg(res)
    pad = 2.5 * edge
    step = 0.55 * edge
    lats = np.arange(max(y0 - pad, -90.0), min(y1 + pad, 90.0) + step, step)
    lons = np.arange(x0 - pad, x1 + pad + step, step)
    glon, glat = np.meshgrid(lons, lats)
    ids = h3_cell(glon.ravel(), np.clip(glat.ravel(), -90.0, 90.0), res)
    return np.unique(ids).tolist()


def h3_cover_size(x0: float, y0: float, x1: float, y1: float, res: int = 8) -> int:
    """Upper-bound PROBE count of h3_cover_bbox without running it —
    callers fall back to a plain scan for huge boxes (same contract as
    hex_cover_size)."""
    edge = _h3core.h3_edge_deg(res)
    step = 0.55 * edge  # keep in sync with h3_cover_bbox's step
    rows = int(math.ceil((min(y1, 90.0) - max(y0, -90.0) + 5 * edge) / step)) + 2
    cols = int(math.ceil((x1 - x0 + 5 * edge) / step)) + 2
    return max(rows, 0) * max(cols, 0)


def _poly_intersects_bbox(verts, x0, y0, x1, y1) -> bool:
    """Convex-ish polygon (lon, lat vertex list) vs axis-aligned bbox
    intersection: any vertex in the box, any box corner in the polygon
    (even-odd ray cast), or any edge pair crossing.

    Boundary lons are unwrapped relative to the bbox center first: a
    cell straddling the antimeridian yields raw lons jumping ~360°,
    which planar tests read as a garbage polygon (round-5 ADVICE). A
    pole-containing cell (lon span ≥ 180° even after unwrap — its
    boundary winds around the pole) is handled by the latitude test
    alone: such a cell covers every longitude poleward of its boundary
    ring, so it intersects iff the bbox reaches its latitude band."""
    ys = verts[:, 1]
    cx = (x0 + x1) / 2.0
    xs = (verts[:, 0] - cx + 180.0) % 360.0 + cx - 180.0
    if xs.max() - xs.min() >= 180.0:
        # winds around a pole: covers all lons poleward of the ring
        if ys.mean() > 0:
            return y1 >= ys.min()
        return y0 <= ys.max()
    if ((xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)).any():
        return True
    # box corner inside polygon (even-odd rule)
    n = len(verts)
    for cx, cy in ((x0, y0), (x0, y1), (x1, y0), (x1, y1)):
        inside = False
        for i in range(n):
            ax, ay = xs[i], ys[i]
            bx, by = xs[(i + 1) % n], ys[(i + 1) % n]
            if (ay > cy) != (by > cy):
                t = (cy - ay) / (by - ay)
                if cx < ax + t * (bx - ax):
                    inside = not inside
        if inside:
            return True
    # polygon edge crosses a box edge
    box_edges = (((x0, y0), (x1, y0)), ((x1, y0), (x1, y1)),
                 ((x1, y1), (x0, y1)), ((x0, y1), (x0, y0)))
    def _seg_cross(p, q, r, t):
        d1 = (q[0]-p[0])*(r[1]-p[1]) - (q[1]-p[1])*(r[0]-p[0])
        d2 = (q[0]-p[0])*(t[1]-p[1]) - (q[1]-p[1])*(t[0]-p[0])
        d3 = (t[0]-r[0])*(p[1]-r[1]) - (t[1]-r[1])*(p[0]-r[0])
        d4 = (t[0]-r[0])*(q[1]-r[1]) - (t[1]-r[1])*(q[0]-r[0])
        return (d1 * d2 < 0) and (d3 * d4 < 0)
    for i in range(n):
        a = (xs[i], ys[i])
        b = (xs[(i + 1) % n], ys[(i + 1) % n])
        for r, t in box_edges:
            if _seg_cross(a, b, r, t):
                return True
    return False


def h3_cover_bbox_exact(x0: float, y0: float, x1: float, y1: float, res: int = 8) -> list[int]:
    """PROVABLY-COMPLETE bbox cover: exactly the cells whose boundary
    polygon intersects the bbox, found by BFS over `h3core.grid_disk`
    neighbors from seed cells inside the box. Completeness argument:
    the set of cells intersecting a convex box is edge-connected (any
    two intersecting cells are joined by a cell path along the box
    region), and BFS only stops at cells that do NOT intersect — so
    every intersecting cell is reached from any interior seed. No
    sampling-step/min-edge calibration involved (round-5 ADVICE: the
    sampled cover's guarantee rests on a worst-case-cell argument; this
    variant is the proof-grade reference the sampled cover is tested
    against, and the right choice when the cover is small). Assumes a
    bbox that does not cross the antimeridian (same contract as
    h3_cover_bbox)."""
    import numpy as _np

    seeds_lon = _np.array([x0, x1, x0, x1, (x0 + x1) / 2])
    seeds_lat = _np.clip(_np.array([y0, y0, y1, y1, (y0 + y1) / 2]), -90, 90)
    seed_cells = set(_h3core.latlng_to_cell(seeds_lon, seeds_lat, res).tolist())
    out: set[int] = set()
    frontier = list(seed_cells)
    seen: set[int] = set(frontier)
    while frontier:
        nxt = []
        for c in frontier:
            verts = _h3core.cell_to_boundary(int(c))
            if _poly_intersects_bbox(verts, x0, y0, x1, y1):
                out.add(int(c))
                for nb in _h3core._neighbors(int(c)):
                    if nb not in seen:
                        seen.add(nb)
                        nxt.append(nb)
        frontier = nxt
    return sorted(out)
