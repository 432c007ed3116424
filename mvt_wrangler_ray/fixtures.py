"""Shared deterministic filter fixtures (FIXTURES.md §3 shapes) used by
tests, queries() entries and the bench — kept in the package so the
driver can import them without the tests directory."""

# masks over the synthetic Yakushima-ish extract (sources/features.py)
FEATURE_POLY_A = [[130.40, 30.25], [130.55, 30.25], [130.55, 30.35],
                  [130.40, 30.35], [130.40, 30.25]]
FEATURE_POLY_B = [[130.55, 30.38], [130.68, 30.38], [130.68, 30.47],
                  [130.55, 30.47], [130.55, 30.38]]
WORLD = [[-180, -90], [-180, 90], [180, 90], [180, -90], [-180, -90]]

# the reference filter fixture's three-feature shape: area-scoped pois
# drop, area-scoped kind=building drop, global language-code tag filter
FEATURE_FILTERS = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature",
         "properties": {"name": "A",
                        "layers": {"pois": {"feature": ["boolean", True]}}},
         "geometry": {"type": "Polygon", "coordinates": [FEATURE_POLY_A]}},
        {"type": "Feature",
         "properties": {"name": "B", "layers": {
             "buildings": {"feature": ["any", ["==", ["tag", "kind"], "building"]]}}},
         "geometry": {"type": "Polygon", "coordinates": [FEATURE_POLY_B]}},
        {"type": "Feature",
         "properties": {"name": "Global", "layers": {"*": {"tag": [
             "any",
             ["starts-with", ["key"], "pgf:name:"],
             ["all",
              ["starts-with", ["key"], "name"],
              ["not", ["in",
                       ["regex-capture", ["key"], "^name:?(.*)$", 1],
                       ["literal", ["", "ja", "en", "2"]]]]],
         ]}}},
         "geometry": {"type": "Polygon", "coordinates": [WORLD]}},
    ],
}
