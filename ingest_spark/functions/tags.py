"""OSM tag → feature-type classification (F1/F2).

The reference classifies tags via ``georender_pack::tags::parse``
(called at /root/reference/src/lib.rs:147,220,323) against a static
type table (``get_types().get("place.other")`` src/lib.rs:61).

We keep the parity surface at the *name* level ("amenity.cafe",
"leisure.park", "natural.water", "place.other", …) and assign
engine-local numeric ids deterministically (sorted-name index), since
the reference's numeric ids come from an external crate's JSON table.
Classification rules:

- scan tag keys in a fixed priority order (deterministic);
- ``key.value`` present in the table → that type;
- known key with unknown value → ``key.other``;
- nothing matches → ``place.other`` (dropped downstream per F2,
  reference src/lib.rs:61,148,221,324).

In Spark this is a broadcast dictionary join / vectorized map lookup —
exposed both as a DataFrame (``type_table_df``) for declarative joins
and as a plain dict for pandas-UDF kernels.
"""

from __future__ import annotations

from functools import lru_cache

# Priority order for multi-tag elements: first matching key wins.
# Deterministic and fixed — part of the engine contract.
PRIORITY_KEYS: tuple[str, ...] = (
    "aerialway", "aeroway", "amenity", "barrier", "boundary", "building",
    "craft", "emergency", "geological", "highway", "historic", "landuse",
    "leisure", "man_made", "military", "natural", "office", "place",
    "power", "public_transport", "railway", "route", "shop", "sport",
    "telecom", "tourism", "waterway",
)

# key → known values. "<key>.other" is implicitly added for every key,
# plus the global fallback "place.other".
_KNOWN_VALUES: dict[str, tuple[str, ...]] = {
    "aerialway": ("cable_car", "chair_lift", "gondola", "station"),
    "aeroway": ("aerodrome", "apron", "gate", "helipad", "runway", "taxiway", "terminal"),
    "amenity": (
        "atm", "bank", "bar", "bench", "bicycle_parking", "bus_station",
        "cafe", "car_wash", "cinema", "clinic", "college", "courthouse",
        "dentist", "doctors", "drinking_water", "fast_food", "fire_station",
        "fountain", "fuel", "grave_yard", "hospital", "kindergarten",
        "library", "marketplace", "parking", "pharmacy", "place_of_worship",
        "police", "post_box", "post_office", "pub", "recycling",
        "restaurant", "school", "shelter", "taxi", "telephone", "theatre",
        "toilets", "townhall", "university", "vending_machine", "waste_basket",
    ),
    "barrier": ("bollard", "fence", "gate", "hedge", "kerb", "retaining_wall", "wall"),
    "boundary": ("administrative", "national_park", "postal_code", "protected_area"),
    "building": (
        "apartments", "barn", "bungalow", "cabin", "cathedral", "chapel",
        "church", "commercial", "detached", "dormitory", "farm", "garage",
        "greenhouse", "hangar", "hospital", "hotel", "house", "industrial",
        "kindergarten", "mosque", "office", "residential", "retail",
        "school", "shed", "stadium", "synagogue", "temple", "terrace",
        "train_station", "university", "warehouse", "yes",
    ),
    "craft": ("brewery", "carpenter", "electrician", "photographer", "plumber"),
    "emergency": ("defibrillator", "fire_hydrant", "phone"),
    "geological": ("moraine", "outcrop", "palaeontological_site"),
    "highway": (
        "bridleway", "bus_stop", "construction", "crossing", "cycleway",
        "footway", "living_street", "motorway", "motorway_link", "path",
        "pedestrian", "primary", "primary_link", "residential", "road",
        "secondary", "secondary_link", "service", "steps", "street_lamp",
        "tertiary", "tertiary_link", "track", "traffic_signals", "trunk",
        "trunk_link", "turning_circle", "unclassified",
    ),
    "historic": ("archaeological_site", "castle", "memorial", "monument", "ruins", "wayside_cross"),
    "landuse": (
        "allotments", "basin", "brownfield", "cemetery", "commercial",
        "construction", "farmland", "farmyard", "forest", "garages",
        "grass", "greenfield", "industrial", "landfill", "meadow",
        "military", "orchard", "quarry", "railway", "recreation_ground",
        "reservoir", "residential", "retail", "vineyard",
    ),
    "leisure": (
        "dog_park", "fitness_centre", "garden", "golf_course", "marina",
        "nature_reserve", "park", "pitch", "playground", "sports_centre",
        "stadium", "swimming_pool", "track",
    ),
    "man_made": ("bridge", "chimney", "lighthouse", "mast", "pier", "silo", "tower", "water_tower", "works"),
    "military": ("airfield", "barracks", "bunker", "range"),
    "natural": (
        "bare_rock", "bay", "beach", "cave_entrance", "cliff", "coastline",
        "fell", "glacier", "grassland", "heath", "mud", "peak", "sand",
        "scree", "scrub", "shingle", "spring", "tree", "tree_row",
        "volcano", "water", "wetland", "wood",
    ),
    "office": ("company", "estate_agent", "government", "insurance", "lawyer", "ngo"),
    "place": (
        "archipelago", "borough", "city", "city_block", "continent",
        "country", "county", "district", "farm", "hamlet", "island",
        "islet", "isolated_dwelling", "locality", "municipality",
        "neighbourhood", "ocean", "province", "quarter", "region", "sea",
        "square", "state", "suburb", "town", "village",
    ),
    "power": ("cable", "generator", "line", "minor_line", "plant", "pole", "substation", "tower", "transformer"),
    "public_transport": ("platform", "station", "stop_area", "stop_position"),
    "railway": ("abandoned", "disused", "funicular", "halt", "level_crossing", "light_rail", "monorail", "narrow_gauge", "platform", "rail", "station", "subway", "tram"),
    "route": ("bicycle", "bus", "ferry", "hiking", "road", "train", "tram"),
    "shop": (
        "alcohol", "bakery", "beauty", "bicycle", "books", "butcher",
        "car", "car_repair", "chemist", "clothes", "convenience",
        "department_store", "doityourself", "electronics", "florist",
        "furniture", "garden_centre", "gift", "greengrocer", "hairdresser",
        "hardware", "jewelry", "kiosk", "laundry", "mall", "mobile_phone",
        "optician", "pet", "shoes", "sports", "supermarket", "toys",
    ),
    "sport": ("baseball", "basketball", "climbing", "golf", "running", "soccer", "swimming", "tennis"),
    "telecom": ("data_center", "exchange"),
    "tourism": (
        "alpine_hut", "apartment", "aquarium", "artwork", "attraction",
        "camp_site", "caravan_site", "gallery", "guest_house", "hostel",
        "hotel", "information", "motel", "museum", "picnic_site",
        "theme_park", "viewpoint", "zoo",
    ),
    "waterway": ("canal", "dam", "ditch", "dock", "drain", "river", "riverbank", "stream", "waterfall", "weir"),
}


@lru_cache(maxsize=1)
def all_type_names() -> tuple[str, ...]:
    names = {"place.other"}
    for key, values in _KNOWN_VALUES.items():
        names.add(f"{key}.other")
        for v in values:
            names.add(f"{key}.{v}")
    return tuple(sorted(names))


@lru_cache(maxsize=1)
def type_ids() -> dict[str, int]:
    """name → stable numeric id (sorted-name index)."""
    return {name: i for i, name in enumerate(all_type_names())}


def get_type(name: str) -> int:
    """Lookup analog of the reference test's ``get_type``
    (tests/ingest.rs:405-407)."""
    return type_ids()[name]


PLACE_OTHER_NAME = "place.other"


def place_other_id() -> int:
    """Cached like the reference's ``place_other`` (src/lib.rs:59-64)."""
    return get_type(PLACE_OTHER_NAME)


def classify(tags: dict[str, str] | None) -> int:
    """F1: tags → feature_type id; unmatched → place.other (F2 drops it)."""
    if tags:
        ids = type_ids()
        for key in PRIORITY_KEYS:
            v = tags.get(key)
            if v is None:
                continue
            t = ids.get(f"{key}.{v}")
            if t is not None:
                return t
            t = ids.get(f"{key}.other")
            if t is not None:
                return t
    return place_other_id()


def label_name(tags: dict[str, str] | None) -> str | None:
    """Label source: the ``name`` tag (golden labels are '=<name>' packed,
    tests/ingest.rs:62,72)."""
    if not tags:
        return None
    return tags.get("name")


def classify_kv(key: str | None, value: str | None) -> int:
    """F1 from a pre-extracted (first-priority-key, value) pair — the
    UDF-side half of the split classification: the key scan over the
    tags map runs JVM-side (a 27-way coalesce), so only two small
    strings cross the Arrow boundary instead of the whole map.
    Equivalent to ``classify`` (property-tested)."""
    if key is None:
        return place_other_id()
    ids = type_ids()
    t = ids.get(f"{key}.{value}")
    if t is not None:
        return t
    return ids.get(f"{key}.other", place_other_id())
