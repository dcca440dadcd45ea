"""Regenerate h3core._PENTAGON_FIT by tiling-consistency search.

For each of the 12 pentagon base cells, exhaustively search all 6^4
per-face ccwRot60 assignments x 2^5 cw-offset subsets and keep the one
maximizing id-agreement of near-coincident point pairs that straddle
icosa-face seams (collision-free micro-buckets; far-from-vertex pairs
only — near-vertex pairs agree under many wrong assignments because
the all-zero digit path is rotation-invariant). The winner is unique
per pentagon (~0.9 raw agreement; residual = genuine cell-boundary
pairs) and reproduces the published cell counts.

Usage: python3 jobs/h3_pentagon_fit.py   (~20-40 min, pure numpy)
Prints one line per pentagon; compare against h3core._PENTAGON_FIT.

Canonical-interop status of the fitted frames: the unique-winner fit
pins each pentagon frame RELATIVE to its member faces; the round-6
structural argument (jobs/h3_ambiguity_audit.py) shows the frames are
pinned ABSOLUTELY as well — the deleted K axis is observable structure
(no rotate60 power fixes K), so a frame rotated against canonical
uber/h3 would emit ids canonical H3 rejects, not relabeled ones. The
per-base-cell relabeling ambiguity therefore remains only on the 109
hexagon base cells without embedded public vectors; see the audit for
the exact enumeration.
"""
import json
import math
import sys
from itertools import combinations, product

import numpy as np

sys.path.insert(0, ".")

from ingest_spark.functions import h3core as h  # noqa: E402

RES = 3
TARGET = 5 * (7**RES - 1) // 6 + 1  # 286
rng = np.random.default_rng(7)


def sample_cap(center_xyz, ang, n):
    z = rng.uniform(np.cos(ang), 1.0, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = np.sqrt(1 - z**2)
    local = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)
    c = np.asarray(center_xyz)
    zax = np.array([0.0, 0.0, 1.0])
    v = np.cross(zax, c)
    s = np.linalg.norm(v)
    d = np.dot(zax, c)
    if s < 1e-12:
        R = np.eye(3) if d > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R = np.eye(3) + vx + vx @ vx * ((1 - d) / s**2)
    return local @ R.T


def precompute(plng, plat, res):
    """latlng_to_cell up to (face, pre-rotation digits, base cell)."""
    lon = np.asarray(plng, float)
    lat = np.asarray(plat, float)
    phi = np.radians(lat)
    lam = np.radians(lon)
    cp = np.cos(phi)
    px, py, pz = cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)
    sqd_all = (
        (px[:, None] - h._FACE_CENTER_XYZ[None, :, 0]) ** 2
        + (py[:, None] - h._FACE_CENTER_XYZ[None, :, 1]) ** 2
        + (pz[:, None] - h._FACE_CENTER_XYZ[None, :, 2]) ** 2
    )
    face = np.argmin(sqd_all, axis=1)
    sqd = sqd_all[np.arange(len(face)), face]
    r = np.arccos(np.clip(1.0 - sqd / 2.0, -1, 1))
    az = np.arctan2(
        np.cos(phi) * np.sin(lam - h.FACE_CENTER_GEO[face, 1]),
        np.cos(h.FACE_CENTER_GEO[face, 0]) * np.sin(phi)
        - np.sin(h.FACE_CENTER_GEO[face, 0]) * np.cos(phi)
        * np.cos(lam - h.FACE_CENTER_GEO[face, 1]),
    )
    theta = h._pos_angle(h.FACE_AXES_AZ_I[face] - h._pos_angle(az))
    if res % 2 == 1:
        theta = h._pos_angle(theta - h.M_AP7_ROT_RADS)
    rs = np.tan(r) / h.RES0_U_GNOMONIC * (h.M_SQRT7**res)
    hx = rs * np.cos(theta)
    hy = rs * np.sin(theta)
    i, j, k = h._hex2d_to_ijk_vec(hx, hy)
    digits = np.zeros((len(i), res), dtype=np.int64)
    for rr in range(res - 1, -1, -1):
        class3 = (rr + 1) % 2 == 1
        li, lj, lk = i, j, k
        i, j, k = h._up_ap7_vec(i, j, k, rotrev=not class3)
        ci, cj, ck = h._down_ap7_vec(i, j, k, rotrev=not class3)
        di, dj, dk = h._ijk_normalize_vec(li - ci, lj - cj, lk - ck)
        digits[:, rr] = 4 * di + 2 * dj + dk
    bc = h._BC_CELL[face, i, j, k]
    return face, digits, bc, np.stack([px, py, pz], axis=1)


def finalize(digits, face, rot_of_face, cw):
    """Apply K-fix + canonical rotations for a candidate assignment."""
    d = digits.copy()
    lead = h._leading_nonzero(d)
    fix = lead == h._K
    if fix.any():
        is_cw = np.isin(face, list(cw))
        d[fix & is_cw] = h._ROT_CW[d[fix & is_cw]]
        d[fix & ~is_cw] = h._ROT_CCW[d[fix & ~is_cw]]
    rot = rot_of_face[face]
    for t in range(1, 6):
        m = rot >= t
        if not m.any():
            continue
        d[m] = h._ROT_CCW[d[m]]
        lead = h._leading_nonzero(d)
        again = m & (lead == h._K)
        if again.any():
            d[again] = h._ROT_CCW[d[again]]
    return d


def fit_pentagon(cid):
    hf, hijk, _ = h._BASE_DATA[cid]
    x, y = h._ijk_to_hex2d(*hijk)
    lat, lng = h._hex2d_to_geo(hf, x, y, 0)
    v = np.array(h._geo_to_xyz(lat, lng))
    pts = sample_cap(v, 0.5, 900_000)
    plat = np.degrees(np.arcsin(np.clip(pts[:, 2], -1, 1)))
    plng = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    face, digits, bc, X = precompute(plng, plat, RES)
    sel = bc == cid
    face, digits, X = face[sel], digits[sel], X[sel]
    faces = sorted(set(face.tolist()))
    dv = np.linalg.norm(X - v, axis=1)
    # collision-free micro-buckets (lexsort, NOT a hash: XOR-hash keys
    # collide heavily near equatorial vertices and create phantom pairs)
    q = np.round(X / 0.0025).astype(np.int64)
    order = np.lexsort((q[:, 2], q[:, 1], q[:, 0]))
    qs = q[order]
    newgrp = np.any(np.diff(qs, axis=0) != 0, axis=1)
    starts = np.r_[0, np.nonzero(newgrp)[0] + 1, len(qs)]
    pa, pb = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        if e - s < 2:
            continue
        idxs = order[s:e]
        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                if face[idxs[a]] != face[idxs[b]]:
                    pa.append(idxs[a])
                    pb.append(idxs[b])
    pa = np.array(pa)
    pb = np.array(pb)
    far = np.minimum(dv[pa], dv[pb]) > 0.05
    pa, pb = pa[far], pb[far]
    used = np.unique(np.r_[pa, pb])
    remap = -np.ones(len(face), dtype=np.int64)
    remap[used] = np.arange(len(used))
    pa2, pb2 = remap[pa], remap[pb]
    fu, du = face[used], digits[used]
    others = [f for f in faces if f != hf]

    best = (-1.0, None, None)
    for rc in product(range(6), repeat=4):
        rot_of_face = np.zeros(20, dtype=np.int64)
        for f, r in zip(others, rc):
            rot_of_face[f] = r
        for kk in range(6):
            for sub in combinations(faces, kk):
                dd = finalize(du, fu, rot_of_face, set(sub))
                agree = float((dd[pa2] == dd[pb2]).all(axis=1).mean())
                if agree > best[0]:
                    best = (agree, dict(zip(others, rc)), sub)
    agree, rots, cw = best
    rot_of_face = np.zeros(20, dtype=np.int64)
    for f, r in rots.items():
        rot_of_face[f] = r
    dd = finalize(digits, face, rot_of_face, set(cw))
    uniq = len(set(tuple(z) for z in dd))
    return {f: int(rot_of_face[f]) for f in faces}, tuple(sorted(cw)), agree, uniq


if __name__ == "__main__":
    out = {}
    for cid in h.PENTAGON_CELLS:
        rots, cw, agree, uniq = fit_pentagon(cid)
        match = (
            rots == h._PENTAGON_FIT[cid]["rots"]
            and cw == tuple(h._PENTAGON_FIT[cid]["cw"])
        )
        print(
            f"pentagon {cid}: rots={rots} cw={cw} agree={agree:.4f} "
            f"distinct={uniq}/{TARGET} embedded-match={match}",
            flush=True,
        )
        out[cid] = {"rots": rots, "cw": list(cw), "agree": agree}
    json.dump(out, open("/tmp/h3_pentagon_fit.json", "w"), indent=1)
