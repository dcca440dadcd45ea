"""Area classification rules (F5/F6).

The reference delegates to the public ``osm-is-area`` crate:
``osm_is_area::way(&tags, &refs)`` at src/lib.rs:236-237 and
``osm_is_area::relation(&tags, &vec![1])`` at src/lib.rs:325-326.
These re-express the same public semantics:

- a way is an area iff it is closed (first ref == last ref, ≥4 refs)
  and its tags say "area-ish": ``area=yes`` forces true, ``area=no``
  forces false, otherwise any whitelisted area key matches;
- a relation is an area iff ``type`` ∈ {multipolygon, boundary} and it
  has members.

Expressed in Spark as plain column predicates (whole-stage codegen):
see operators/features.py `with_way_area_flag`.
"""

from __future__ import annotations

# keys whose presence (with any value, modulo exceptions) marks a closed
# way as an area — mirrors the public osm-is-area key list
AREA_KEYS: frozenset[str] = frozenset(
    {
        "aeroway", "amenity", "boundary", "building", "building:part",
        "craft", "golf", "historic", "indoor", "landuse", "leisure",
        "military", "natural", "office", "place", "public_transport",
        "ruins", "shop", "tourism",
    }
)

# value exceptions: key present but with these values is NOT an area
_NON_AREA_VALUES: dict[str, frozenset[str]] = {
    "natural": frozenset({"coastline", "cliff", "ridge", "arete", "tree_row"}),
    "leisure": frozenset({"slipway", "track"}),
    "aeroway": frozenset({"taxiway", "runway"}),
}


def way_is_closed(refs) -> bool:
    return refs is not None and len(refs) >= 4 and refs[0] == refs[-1]


def way_is_area(tags: dict[str, str] | None, refs) -> bool:
    """F6 (reference src/lib.rs:236-237)."""
    if not way_is_closed(refs):
        return False
    tags = tags or {}
    area = tags.get("area")
    if area == "no":
        return False
    if area == "yes":
        return True
    for k, v in tags.items():
        if k in AREA_KEYS:
            if v in _NON_AREA_VALUES.get(k, ()):
                continue
            return True
    return False


def relation_is_area(tags: dict[str, str] | None, n_members: int) -> bool:
    """F5 (reference src/lib.rs:325-326): only area relations ingest."""
    if n_members <= 0:
        return False
    tags = tags or {}
    return tags.get("type") in ("multipolygon", "boundary")
