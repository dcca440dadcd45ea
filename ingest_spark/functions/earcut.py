"""Deterministic ear-clipping polygon triangulation.

A faithful pure-Python port of the public mapbox/earcut algorithm
(ISC license, https://github.com/mapbox/earcut), the same algorithm the
reference consumes through the `earcutr` crate (its golden test
recomputes cells with `earcutr::earcut(&positions, &vec![], 2)` —
/root/reference/tests/ingest.rs:52-53 — and hard-codes the hole-polygon
cells [0,1,4,5,...] at tests/ingest.rs:71).

Determinism is a correctness requirement: tile/feature goldens embed
triangle indices, so the triangulation must be bit-stable across runs
and across partitions. This port is dependency-free and is executed
batched inside pandas UDFs (one call per polygon, many polygons per
Arrow batch).

API matches earcut.js: ``earcut(data, hole_indices, dim) -> list[int]``
where ``data`` is a flat coordinate array and the returned list holds
vertex indices in triples.
"""

from __future__ import annotations

import math


class _Node:
    __slots__ = ("i", "x", "y", "prev", "next", "z", "prevZ", "nextZ", "steiner")

    def __init__(self, i: int, x: float, y: float) -> None:
        self.i = i
        self.x = x
        self.y = y
        self.prev = None
        self.next = None
        self.z = 0
        self.prevZ = None
        self.nextZ = None
        self.steiner = False


def earcut(data, hole_indices=None, dim: int = 2) -> list[int]:
    has_holes = bool(hole_indices)
    outer_len = hole_indices[0] * dim if has_holes else len(data)
    outer_node = _linked_list(data, 0, outer_len, dim, True)
    triangles: list[int] = []

    if not outer_node or outer_node.next is outer_node.prev:
        return triangles

    min_x = min_y = inv_size = 0.0

    if has_holes:
        outer_node = _eliminate_holes(data, hole_indices, outer_node, dim)

    # z-order curve hash speedup kicks in for large polygons
    if len(data) > 80 * dim:
        min_x = max_x = data[0]
        min_y = max_y = data[1]
        for i in range(dim, outer_len, dim):
            x = data[i]
            y = data[i + 1]
            if x < min_x:
                min_x = x
            if y < min_y:
                min_y = y
            if x > max_x:
                max_x = x
            if y > max_y:
                max_y = y
        inv_size = max(max_x - min_x, max_y - min_y)
        inv_size = 32767.0 / inv_size if inv_size != 0 else 0.0

    _earcut_linked(outer_node, triangles, dim, min_x, min_y, inv_size, 0)
    return triangles


def _linked_list(data, start: int, end: int, dim: int, clockwise: bool):
    last = None
    if clockwise == (_signed_area(data, start, end, dim) > 0):
        for i in range(start, end, dim):
            last = _insert_node(i, data[i], data[i + 1], last)
    else:
        for i in range(end - dim, start - dim, -dim):
            last = _insert_node(i, data[i], data[i + 1], last)

    if last and _equals(last, last.next):
        _remove_node(last)
        last = last.next
    return last


def _filter_points(start, end=None):
    if not start:
        return start
    if not end:
        end = start

    p = start
    while True:
        again = False
        if not p.steiner and (_equals(p, p.next) or _area(p.prev, p, p.next) == 0):
            _remove_node(p)
            p = end = p.prev
            if p is p.next:
                break
            again = True
        else:
            p = p.next
        if not (again or p is not end):
            break
    return end


def _earcut_linked(ear, triangles, dim, min_x, min_y, inv_size, pass_: int) -> None:
    if not ear:
        return

    if not pass_ and inv_size:
        _index_curve(ear, min_x, min_y, inv_size)

    stop = ear
    while ear.prev is not ear.next:
        prev = ear.prev
        nxt = ear.next

        is_ear = (
            _is_ear_hashed(ear, min_x, min_y, inv_size) if inv_size else _is_ear(ear)
        )
        if is_ear:
            triangles.append(prev.i // dim)
            triangles.append(ear.i // dim)
            triangles.append(nxt.i // dim)

            _remove_node(ear)

            ear = nxt.next
            stop = nxt.next
            continue

        ear = nxt

        if ear is stop:
            if not pass_:
                _earcut_linked(
                    _filter_points(ear), triangles, dim, min_x, min_y, inv_size, 1
                )
            elif pass_ == 1:
                ear = _cure_local_intersections(_filter_points(ear), triangles, dim)
                _earcut_linked(ear, triangles, dim, min_x, min_y, inv_size, 2)
            elif pass_ == 2:
                _split_earcut(ear, triangles, dim, min_x, min_y, inv_size)
            break


def _is_ear(ear) -> bool:
    a = ear.prev
    b = ear
    c = ear.next

    if _area(a, b, c) >= 0:
        return False  # reflex, can't be an ear

    p = ear.next.next
    while p is not ear.prev:
        if _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, p.x, p.y) and _area(
            p.prev, p, p.next
        ) >= 0:
            return False
        p = p.next
    return True


def _is_ear_hashed(ear, min_x, min_y, inv_size) -> bool:
    a = ear.prev
    b = ear
    c = ear.next

    if _area(a, b, c) >= 0:
        return False

    # triangle bbox
    x0 = min(a.x, b.x, c.x)
    y0 = min(a.y, b.y, c.y)
    x1 = max(a.x, b.x, c.x)
    y1 = max(a.y, b.y, c.y)

    min_z = _z_order(x0, y0, min_x, min_y, inv_size)
    max_z = _z_order(x1, y1, min_x, min_y, inv_size)

    p = ear.prevZ
    n = ear.nextZ

    while p and p.z >= min_z and n and n.z <= max_z:
        if (
            p is not ear.prev
            and p is not ear.next
            and _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, p.x, p.y)
            and _area(p.prev, p, p.next) >= 0
        ):
            return False
        p = p.prevZ

        if (
            n is not ear.prev
            and n is not ear.next
            and _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, n.x, n.y)
            and _area(n.prev, n, n.next) >= 0
        ):
            return False
        n = n.nextZ

    while p and p.z >= min_z:
        if (
            p is not ear.prev
            and p is not ear.next
            and _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, p.x, p.y)
            and _area(p.prev, p, p.next) >= 0
        ):
            return False
        p = p.prevZ

    while n and n.z <= max_z:
        if (
            n is not ear.prev
            and n is not ear.next
            and _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, n.x, n.y)
            and _area(n.prev, n, n.next) >= 0
        ):
            return False
        n = n.nextZ

    return True


def _cure_local_intersections(start, triangles, dim):
    p = start
    while True:
        a = p.prev
        b = p.next.next

        if (
            not _equals(a, b)
            and _intersects(a, p, p.next, b)
            and _locally_inside(a, b)
            and _locally_inside(b, a)
        ):
            triangles.append(a.i // dim)
            triangles.append(p.i // dim)
            triangles.append(b.i // dim)

            _remove_node(p)
            _remove_node(p.next)

            p = start = b

        p = p.next
        if p is start:
            break

    return _filter_points(p)


def _split_earcut(start, triangles, dim, min_x, min_y, inv_size) -> None:
    a = start
    while True:
        b = a.next.next
        while b is not a.prev:
            if a.i != b.i and _is_valid_diagonal(a, b):
                c = _split_polygon(a, b)

                a = _filter_points(a, a.next)
                c = _filter_points(c, c.next)

                _earcut_linked(a, triangles, dim, min_x, min_y, inv_size, 0)
                _earcut_linked(c, triangles, dim, min_x, min_y, inv_size, 0)
                return
            b = b.next
        a = a.next
        if a is start:
            break


def _eliminate_holes(data, hole_indices, outer_node, dim):
    queue = []
    n_holes = len(hole_indices)
    for i in range(n_holes):
        start = hole_indices[i] * dim
        end = hole_indices[i + 1] * dim if i < n_holes - 1 else len(data)
        lst = _linked_list(data, start, end, dim, False)
        if lst is lst.next:
            lst.steiner = True
        queue.append(_get_leftmost(lst))

    queue.sort(key=lambda node: node.x)

    for hole in queue:
        _eliminate_hole(hole, outer_node)
        outer_node = _filter_points(outer_node, outer_node.next)

    return outer_node


def _eliminate_hole(hole, outer_node) -> None:
    outer_node = _find_hole_bridge(hole, outer_node)
    if outer_node:
        b = _split_polygon(outer_node, hole)
        _filter_points(outer_node, outer_node.next)
        _filter_points(b, b.next)


def _find_hole_bridge(hole, outer_node):
    """David Eberly's horizontal-ray bridge point search."""
    p = outer_node
    hx = hole.x
    hy = hole.y
    qx = -math.inf
    m = None

    while True:
        if hy <= p.y and hy >= p.next.y and p.next.y != p.y:
            x = p.x + (hy - p.y) * (p.next.x - p.x) / (p.next.y - p.y)
            if x <= hx and x > qx:
                qx = x
                if x == hx:
                    if hy == p.y:
                        return p
                    if hy == p.next.y:
                        return p.next
                m = p if p.x < p.next.x else p.next
        p = p.next
        if p is outer_node:
            break

    if not m:
        return None

    if hx == qx:
        return m  # hole touches outer segment; pick leftmost endpoint

    # look for points inside the triangle of the hole point, segment
    # intersection, and endpoint; pick the one with minimum tangent
    stop = m
    mx = m.x
    my = m.y
    tan_min = math.inf

    p = m
    while True:
        if (
            hx >= p.x
            and p.x >= mx
            and hx != p.x
            and _point_in_triangle(
                hx if hy < my else qx, hy, mx, my, qx if hy < my else hx, hy, p.x, p.y
            )
        ):
            tan = abs(hy - p.y) / (hx - p.x)
            if _locally_inside(p, hole) and (
                tan < tan_min
                or (
                    tan == tan_min
                    and (p.x > m.x or (p.x == m.x and _sector_contains_sector(m, p)))
                )
            ):
                m = p
                tan_min = tan
        p = p.next
        if p is stop:
            break

    return m


def _sector_contains_sector(m, p) -> bool:
    """whether sector in vertex m contains sector in vertex p in the same coords"""
    return _area(m.prev, m, p.prev) < 0 and _area(p.next, m, m.next) < 0


def _index_curve(start, min_x, min_y, inv_size) -> None:
    p = start
    while True:
        if p.z == 0:
            p.z = _z_order(p.x, p.y, min_x, min_y, inv_size)
        p.prevZ = p.prev
        p.nextZ = p.next
        p = p.next
        if p is start:
            break

    p.prevZ.nextZ = None
    p.prevZ = None

    _sort_linked(p)


def _sort_linked(head):
    """Simon Tatham's merge sort on the z-order linked list."""
    in_size = 1
    while True:
        p = head
        head = None
        tail = None
        num_merges = 0

        while p:
            num_merges += 1
            q = p
            p_size = 0
            for _ in range(in_size):
                p_size += 1
                q = q.nextZ
                if not q:
                    break
            q_size = in_size

            while p_size > 0 or (q_size > 0 and q):
                if p_size != 0 and (q_size == 0 or not q or p.z <= q.z):
                    e = p
                    p = p.nextZ
                    p_size -= 1
                else:
                    e = q
                    q = q.nextZ
                    q_size -= 1

                if tail:
                    tail.nextZ = e
                else:
                    head = e

                e.prevZ = tail
                tail = e

            p = q

        tail.nextZ = None
        in_size *= 2
        if num_merges <= 1:
            return head


def _z_order(x, y, min_x, min_y, inv_size) -> int:
    """z-order of a point given coords and inverse of the longer side of data bbox"""
    x = int((x - min_x) * inv_size)
    y = int((y - min_y) * inv_size)

    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555

    y = (y | (y << 8)) & 0x00FF00FF
    y = (y | (y << 4)) & 0x0F0F0F0F
    y = (y | (y << 2)) & 0x33333333
    y = (y | (y << 1)) & 0x55555555

    return x | (y << 1)


def _get_leftmost(start):
    p = start
    leftmost = start
    while True:
        if p.x < leftmost.x or (p.x == leftmost.x and p.y < leftmost.y):
            leftmost = p
        p = p.next
        if p is start:
            break
    return leftmost


def _point_in_triangle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    return (
        (cx - px) * (ay - py) - (ax - px) * (cy - py) >= 0
        and (ax - px) * (by - py) - (bx - px) * (ay - py) >= 0
        and (bx - px) * (cy - py) - (cx - px) * (by - py) >= 0
    )


def _is_valid_diagonal(a, b) -> bool:
    return (
        a.next.i != b.i
        and a.prev.i != b.i
        and not _intersects_polygon(a, b)
        and (
            _locally_inside(a, b)
            and _locally_inside(b, a)
            and _middle_inside(a, b)
            and (_area(a.prev, a, b.prev) or _area(a, b.prev, b))
            or _equals(a, b)
            and _area(a.prev, a, a.next) > 0
            and _area(b.prev, b, b.next) > 0
        )
    )


def _area(p, q, r) -> float:
    return (q.y - p.y) * (r.x - q.x) - (q.x - p.x) * (r.y - q.y)


def _equals(p1, p2) -> bool:
    return p1.x == p2.x and p1.y == p2.y


def _intersects(p1, q1, p2, q2) -> bool:
    o1 = _sign(_area(p1, q1, p2))
    o2 = _sign(_area(p1, q1, q2))
    o3 = _sign(_area(p2, q2, p1))
    o4 = _sign(_area(p2, q2, q1))

    if o1 != o2 and o3 != o4:
        return True

    if o1 == 0 and _on_segment(p1, p2, q1):
        return True
    if o2 == 0 and _on_segment(p1, q2, q1):
        return True
    if o3 == 0 and _on_segment(p2, p1, q2):
        return True
    if o4 == 0 and _on_segment(p2, q1, q2):
        return True

    return False


def _on_segment(p, q, r) -> bool:
    return (
        q.x <= max(p.x, r.x)
        and q.x >= min(p.x, r.x)
        and q.y <= max(p.y, r.y)
        and q.y >= min(p.y, r.y)
    )


def _sign(num) -> int:
    if num > 0:
        return 1
    if num < 0:
        return -1
    return 0


def _intersects_polygon(a, b) -> bool:
    p = a
    while True:
        if (
            p.i != a.i
            and p.next.i != a.i
            and p.i != b.i
            and p.next.i != b.i
            and _intersects(p, p.next, a, b)
        ):
            return True
        p = p.next
        if p is a:
            break
    return False


def _locally_inside(a, b) -> bool:
    if _area(a.prev, a, a.next) < 0:
        return _area(a, b, a.next) >= 0 and _area(a, a.prev, b) >= 0
    return _area(a, b, a.prev) < 0 or _area(a, a.next, b) < 0


def _middle_inside(a, b) -> bool:
    p = a
    inside = False
    px = (a.x + b.x) / 2
    py = (a.y + b.y) / 2
    while True:
        if (
            ((p.y > py) != (p.next.y > py))
            and p.next.y != p.y
            and (px < (p.next.x - p.x) * (py - p.y) / (p.next.y - p.y) + p.x)
        ):
            inside = not inside
        p = p.next
        if p is a:
            break
    return inside


def _split_polygon(a, b):
    """Link two polygon vertices with a bridge, splitting into two rings."""
    a2 = _Node(a.i, a.x, a.y)
    b2 = _Node(b.i, b.x, b.y)
    an = a.next
    bp = b.prev

    a.next = b
    b.prev = a

    a2.next = an
    an.prev = a2

    b2.next = a2
    a2.prev = b2

    bp.next = b2
    b2.prev = bp

    return b2


def _insert_node(i, x, y, last):
    p = _Node(i, x, y)
    if not last:
        p.prev = p
        p.next = p
    else:
        p.next = last.next
        p.prev = last
        last.next.prev = p
        last.next = p
    return p


def _remove_node(p) -> None:
    p.next.prev = p.prev
    p.prev.next = p.next

    if p.prevZ:
        p.prevZ.nextZ = p.nextZ
    if p.nextZ:
        p.nextZ.prevZ = p.prevZ


def _signed_area(data, start, end, dim) -> float:
    s = 0.0
    j = end - dim
    for i in range(start, end, dim):
        s += (data[j] - data[i]) * (data[i + 1] + data[j + 1])
        j = i
    return s


def deviation(data, hole_indices, dim, triangles) -> float:
    """Relative difference between polygon area and triangulation area —
    a self-check used in property tests (earcut.js API parity)."""
    has_holes = bool(hole_indices)
    outer_len = hole_indices[0] * dim if has_holes else len(data)

    polygon_area = abs(_signed_area(data, 0, outer_len, dim))
    if has_holes:
        n_holes = len(hole_indices)
        for i in range(n_holes):
            start = hole_indices[i] * dim
            end = hole_indices[i + 1] * dim if i < n_holes - 1 else len(data)
            polygon_area -= abs(_signed_area(data, start, end, dim))

    triangles_area = 0.0
    for i in range(0, len(triangles), 3):
        a = triangles[i] * dim
        b = triangles[i + 1] * dim
        c = triangles[i + 2] * dim
        triangles_area += abs(
            (data[a] - data[c]) * (data[b + 1] - data[a + 1])
            - (data[a] - data[b]) * (data[c + 1] - data[a + 1])
        )

    if polygon_area == 0 and triangles_area == 0:
        return 0.0
    if polygon_area == 0:
        return math.inf
    return abs((triangles_area - polygon_area) / polygon_area)
