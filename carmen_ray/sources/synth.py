"""Deterministic synthetic interleaved-document corpus.

Input shape is exactly BASELINE.json's input_hint:

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string,
                        offset: int32>>

Span kinds used by the engine (everything a carmen feature carries is
encoded as spans so the table stays pure interleaved text+media):

    text       display name (carmen:text, first synonym)
    synonym    extra names (comma synonyms in the reference fixtures)
    lang:<lc>  per-language text (carmen:text_{lc})
    geom       compact GeoJSON geometry string
    center     "lon,lat"
    score      stringified score
    media      media_ref = "tile://z/x/y" or "img://<id>" raster/media key

The layer is the doc_id prefix ("country.3", "street.412", …), mirroring
carmen extids. Offsets are strictly increasing per row; the per-row
span-sequence invariant (kind, text, media_ref, order) is asserted by
tests on every pipeline output.

Determinism: everything derives from (seed, doc index) via splitmix64 —
no RNG state ordering issues across Ray blocks. Hot-cell skew is a Zipf
pick over a small set of "city centers" so dense urban tiles exercise
the salting path.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pyarrow as pa

# postcode sits between place and street like carmen's default stack
LAYERS = ("country", "region", "place", "postcode", "street", "address", "poi")
LAYER_ZOOM = {"country": 1, "region": 4, "place": 6, "postcode": 6, "street": 10, "address": 12, "poi": 12}
LAYER_IDX = {name: i for i, name in enumerate(LAYERS)}

_NAME_A = ("west", "east", "north", "south", "new", "old", "lake", "fair", "spring", "oak")
_NAME_B = ("wood", "view", "field", "port", "town", "ville", "haven", "dale", "burg", "ford")
_STREET_SUFFIX = ("st", "ave", "rd", "blvd", "ln", "way")
_POI_KIND = ("cafe", "museum", "park", "station", "market", "library")


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _rand(seed: int, *keys: int) -> float:
    h = seed
    for k in keys:
        h = _splitmix64(h ^ k)
    return h / 2**64


def _pick(seq, seed: int, *keys: int):
    return seq[int(_rand(seed, *keys) * len(seq)) % len(seq)]


SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])


def _mk_spans(entries: list[tuple[str, str, str]]) -> list[dict]:
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(entries)
    ]


_NAME_C = ("", "ton", "boro", "moor", "crest", "ridge", "gate", "mead")


def _name(seed: int, layer_idx: int, i: int) -> str:
    a = _pick(_NAME_A, seed, layer_idx, i, 1)
    b = _pick(_NAME_B, seed, layer_idx, i, 2)
    # third syllable kicks in for large corpora so duplicate-name density
    # stays realistic at bench scale; i<100 keeps the compact namespace
    # (test fixtures unchanged)
    c = _NAME_C[(i // 100) % len(_NAME_C)] if i >= 100 else ""
    return f"{a}{b}{c}"


def _zipf_city(seed: int, i: int, n_cities: int) -> int:
    """Zipf-ish pick: city c with prob ∝ 1/(c+1)."""
    u = _rand(seed, i, 777)
    weights = np.array([1.0 / (c + 1) for c in range(n_cities)])
    cum = np.cumsum(weights / weights.sum())
    return int(np.searchsorted(cum, u))


def generate_corpus(
    n_countries: int = 4,
    n_regions: int = 12,
    n_places: int = 40,
    n_streets: int = 200,
    n_pois: int = 100,
    seed: int = 42,
    media_every: int = 3,
    n_addresses: int | None = None,
) -> pa.Table:
    """Build the interleaved corpus as one Arrow table (small scales); for
    bench scales use `generate_corpus_ds` which builds it as a Dataset."""
    if n_addresses is None:
        n_addresses = n_streets // 4
    rows = list(
        _gen_rows(n_countries, n_regions, n_places, n_streets, n_pois, seed,
                  media_every, n_addresses)
    )
    doc_ids = [r[0] for r in rows]
    spans = [r[1] for r in rows]
    return pa.table({"doc_id": pa.array(doc_ids, type=pa.string()),
                     "spans": pa.array(spans, type=pa.list_(SPAN_TYPE))})


def _gen_rows(n_countries, n_regions, n_places, n_streets, n_pois, seed,
              media_every, n_addresses=0):
    # world: countries are big lattice squares; regions subdivide them;
    # places cluster inside regions; streets/pois cluster inside places
    # (Zipf over places → hot cells).
    countries = []
    for i in range(n_countries):
        w = -160.0 + 80.0 * (i % 4)
        s = -60.0 + 60.0 * (i // 4)
        e, n = w + 70.0, s + 50.0
        countries.append((w, s, e, n))
        name = _name(seed, 0, i)
        syn = name.upper()[:3]
        geom = {"type": "Polygon", "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}
        entries = [
            ("text", name, ""),
            ("synonym", syn, ""),
            (f"lang:es", name + "o", ""),
            ("geom", json.dumps(geom), ""),
            ("center", f"{(w+e)/2},{(s+n)/2}", ""),
            ("score", str(1000 - i * 50), ""),
        ]
        yield f"country.{i}", _mk_spans(entries)

    regions = []
    for i in range(n_regions):
        ci = i % n_countries
        w0, s0, e0, n0 = countries[ci]
        col = (i // n_countries) % 3
        w = w0 + col * (e0 - w0) / 3
        e = w + (e0 - w0) / 3
        s, n = s0 + 5, n0 - 5
        regions.append((w, s, e, n, ci))
        name = _name(seed, 1, i)
        geom = {"type": "Polygon", "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}
        entries = [
            ("text", name, ""),
            ("geom", json.dumps(geom), ""),
            ("center", f"{(w+e)/2},{(s+n)/2}", ""),
            ("score", str(500 - i * 10), ""),
        ]
        yield f"region.{i}", _mk_spans(entries)

    places = []
    for i in range(n_places):
        ri = i % n_regions
        w, s, e, n, ci = regions[ri]
        fx = 0.15 + 0.7 * _rand(seed, 2, i, 1)
        fy = 0.15 + 0.7 * _rand(seed, 2, i, 2)
        cx = w + (e - w) * fx
        cy = s + (n - s) * fy
        half = 1.5
        places.append((cx, cy, ri))
        name = _name(seed, 2, i)
        geom = {"type": "Polygon", "coordinates": [[
            [cx - half, cy - half], [cx + half, cy - half], [cx + half, cy + half],
            [cx - half, cy + half], [cx - half, cy - half]]]}
        entries = [
            ("text", name, ""),
            ("geom", json.dumps(geom), ""),
            ("center", f"{cx},{cy}", ""),
            ("score", str(200 - (i % 50) * 2), ""),
        ]
        if i % media_every == 0:
            entries.append(("media", "", f"img://place/{i}"))
        yield f"place.{i}", _mk_spans(entries)

    street_geoms = []
    street_place = []
    street_names = []
    for i in range(n_streets):
        pi = _zipf_city(seed, i, n_places)
        cx, cy, _ = places[pi]
        dx = (_rand(seed, 3, i, 1) - 0.5) * 2.0
        dy = (_rand(seed, 3, i, 2) - 0.5) * 2.0
        x0, y0 = cx + dx, cy + dy
        x1, y1 = x0 + 0.02 + 0.03 * _rand(seed, 3, i, 3), y0 + 0.02 * _rand(seed, 3, i, 4)
        name = f"{_name(seed, 3, i)} {_pick(_STREET_SUFFIX, seed, 3, i, 5)}"
        geom = {"type": "LineString",
                "coordinates": [[x0, y0], [(x0 + x1) / 2, y1], [x1, y0]]}
        entries = [
            ("text", name, ""),
            ("geom", json.dumps(geom), ""),
            ("center", f"{(x0+x1)/2},{(y0+y1)/2}", ""),
            ("score", str(int(50 * _rand(seed, 3, i, 6))), ""),
        ]
        street_geoms.append((name, geom))
        street_place.append(pi)
        street_names.append(name)
        # cross-street: every 5th street intersects the previous street
        # in the same place (geocode-unit.address-intersections shape)
        if i % 5 == 4 and street_place[i - 1] == pi and street_names[i - 1] != name:
            entries.append(("intersection", street_names[i - 1], ""))
        if i % media_every == 1:
            entries.append(("media", "", f"tile://14/{i % 16384}/{(i * 7) % 16384}"))
        yield f"street.{i}", _mk_spans(entries)

    for i in range(n_addresses):
        # address cluster (even i) or TIGER-style ITP range (odd i) on street i
        sname, sgeom = street_geoms[i % len(street_geoms)]
        coords = sgeom["coordinates"]
        (x0, y0), (x1, y1) = coords[0], coords[-1]
        if i % 2 == 0:
            nums = [str(3 + 2 * j) for j in range(6)]  # 3,5,...,13
            pts = [
                [x0 + (x1 - x0) * (j + 1) / 7.0, y0 + (y1 - y0) * (j + 1) / 7.0]
                for j in range(6)
            ]
            geom = {"type": "MultiPoint", "coordinates": pts}
            entries = [
                ("text", sname, ""),
                ("geom", json.dumps(geom), ""),
                ("center", f"{pts[2][0]},{pts[2][1]}", ""),
                ("score", "5", ""),
                ("addr_numbers", ",".join(nums), ""),
            ]
        else:
            geom = {"type": "MultiLineString", "coordinates": [coords]}
            entries = [
                ("text", sname, ""),
                ("geom", json.dumps(geom), ""),
                ("center", f"{(x0+x1)/2},{(y0+y1)/2}", ""),
                ("score", "5", ""),
                ("addr_range", json.dumps({
                    "lfromhn": [["1"]], "ltohn": [["99"]],
                    "rfromhn": [["2"]], "rtohn": [["100"]],
                    "parityl": [["O"]], "parityr": [["E"]],
                }), ""),
            ]
        yield f"address.{i}", _mk_spans(entries)

    for i in range(n_pois):
        pi = _zipf_city(seed, i * 31 + 7, n_places)
        cx, cy, _ = places[pi]
        px = cx + (_rand(seed, 4, i, 1) - 0.5) * 1.2
        py = cy + (_rand(seed, 4, i, 2) - 0.5) * 1.2
        kind = _pick(_POI_KIND, seed, 4, i, 3)
        name = f"{_name(seed, 4, i)} {kind}"
        geom = {"type": "Point", "coordinates": [px, py]}
        entries = [
            ("text", name, ""),
            ("synonym", kind, ""),
            ("geom", json.dumps(geom), ""),
            ("center", f"{px},{py}", ""),
            ("score", str(int(30 * _rand(seed, 4, i, 4)) - (3 if i % 17 == 0 else 0)), ""),
        ]
        if i % media_every == 2:
            entries.append(("media", "", f"img://poi/{i}"))
        yield f"poi.{i}", _mk_spans(entries)


def generate_skew_corpus(n_names: int = 12, feats_per_name: int = 2000,
                         seed: int = 42, base_scale: int = 2) -> pa.Table:
    """Whale-phrase stress corpus: a handful of street names each shared
    by `feats_per_name` distinct features scattered across the world —
    the regime the reference's own phrasematch bench seeds (2,000
    features per name, reference bench/phrasematch.js:27). One phrase
    row then carries thousands of grid covers; this is the skew the
    optional GRAFT_PM_PRUNE pre-exchange grid cap targets, and the
    bench's --skew mode measures prune-on vs prune-off over it."""
    base = generate_corpus(
        n_places=max(40, 20 * base_scale), n_streets=200 * base_scale,
        n_pois=100 * base_scale, seed=seed)

    # replicate the base world lattice (generate_corpus defaults:
    # 4 countries, 12 regions) so whale streets land inside real places
    n_countries, n_regions = 4, 12
    n_places = max(40, 20 * base_scale)
    countries = []
    for i in range(n_countries):
        w = -160.0 + 80.0 * (i % 4)
        s = -60.0 + 60.0 * (i // 4)
        countries.append((w, s, w + 70.0, s + 50.0))
    regions = []
    for i in range(n_regions):
        w0, s0, e0, n0 = countries[i % n_countries]
        col = (i // n_countries) % 3
        w = w0 + col * (e0 - w0) / 3
        regions.append((w, s0 + 5, w + (e0 - w0) / 3, n0 - 5))
    places = []
    for i in range(n_places):
        w, s, e, n = regions[i % n_regions]
        cx = w + (e - w) * (0.15 + 0.7 * _rand(seed, 2, i, 1))
        cy = s + (n - s) * (0.15 + 0.7 * _rand(seed, 2, i, 2))
        places.append((cx, cy))

    doc_ids, spans = [], []
    for k in range(n_names):
        name = f"{_name(seed, 9, k)} {_pick(_STREET_SUFFIX, seed, 9, k, 5)}"
        for j in range(feats_per_name):
            cx, cy = places[(k * 37 + j) % n_places]
            x0 = cx + (_rand(seed, 7, k * 100003 + j, 1) - 0.5) * 2.0
            y0 = cy + (_rand(seed, 7, k * 100003 + j, 2) - 0.5) * 2.0
            x1 = x0 + 0.02 + 0.03 * _rand(seed, 7, k * 100003 + j, 3)
            geom = {"type": "LineString",
                    "coordinates": [[x0, y0], [(x0 + x1) / 2, y0 + 0.01], [x1, y0]]}
            entries = [
                ("text", name, ""),
                ("geom", json.dumps(geom), ""),
                ("center", f"{(x0 + x1) / 2},{y0}", ""),
                # Zipf-ish scores: a few standouts, a long flat tail —
                # the prune's best-K cut has real work to do
                ("score", str(90 - (j % 90)), ""),
            ]
            doc_ids.append(f"street.whale{k}x{j}")
            spans.append(_mk_spans(entries))

    whales = pa.table({"doc_id": pa.array(doc_ids, type=pa.string()),
                       "spans": pa.array(spans, type=pa.list_(SPAN_TYPE))})
    return pa.concat_tables([base, whales])


def generate_corpus_ds(scale: int = 1, seed: int = 42, blocks: int = 8):
    """Dataset version for bench: scale multiplies street/poi counts."""
    import ray.data as rd

    tbl = generate_corpus(
        n_countries=4,
        n_regions=12,
        n_places=max(40, 8 * scale),
        n_streets=200 * scale,
        n_pois=100 * scale,
        seed=seed,
    )
    return rd.from_arrow(tbl).repartition(blocks)


def spans_signature(spans) -> tuple:
    """Canonical (kind, text, media_ref, order) signature for the per-row
    span-sequence-equality invariant."""
    return tuple(
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in sorted(spans, key=lambda s: s["offset"])
    )
