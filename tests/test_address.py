"""Address geocoding: cluster exact match (R5), ITP interpolation with
parity (R6), routable points (R8), waffle query variants (M13) — the
pytest analogue of geocode-unit.address-*.test.js / .range.test.js."""

import json

import pytest

from carmen_ray.sources.synth import generate_corpus


@pytest.fixture(scope="module")
def addr_index(ray_session):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    tbl = generate_corpus(n_streets=40, n_pois=10)
    idx = build_index(rd.from_arrow(tbl).repartition(2))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    return idx, index


def test_cluster_exact_match(addr_index):
    from carmen_ray.geocode.engine import forward_one

    idx, index = addr_index
    f = idx.features.to_pandas()
    clusters = f[(f.layer == "address") & (f.addr_numbers_json != "")]
    assert len(clusters) > 0
    doc = clusters.iloc[0]
    nums = json.loads(doc.addr_numbers_json)
    geom = json.loads(doc.geometry_json)
    target_num = nums[1]
    res = forward_one(index, f"{target_num} {doc.text}")
    assert res, "no address result"
    top = res[0]
    assert top["feature_id"] == doc.doc_id
    assert top["address"] == target_num
    # matched point is the cluster's parallel-array point
    assert top["center_lon"] == pytest.approx(geom["coordinates"][1][0])
    assert top["center_lat"] == pytest.approx(geom["coordinates"][1][1])
    assert top["place_name"].startswith(f"{target_num} {doc.text}")


def test_cluster_number_not_present_falls_back(addr_index):
    from carmen_ray.geocode.engine import forward_one

    idx, index = addr_index
    f = idx.features.to_pandas()
    doc = f[(f.layer == "address") & (f.addr_numbers_json != "")].iloc[0]
    # 9999 waffles to 99## which is not indexed for this cluster (3..13 → # / ##)
    res = forward_one(index, f"9999 {doc.text}")
    hits = [r for r in res if r["feature_id"] == doc.doc_id]
    assert not hits or hits[0]["address"] is None


def test_itp_interpolation(addr_index):
    from carmen_ray.geocode.engine import forward_one

    idx, index = addr_index
    f = idx.features.to_pandas()
    ranges = f[(f.layer == "address") & (f.addr_range_json != "")]
    assert len(ranges) > 0
    doc = ranges.iloc[0]
    # odd side l: 1..99 → 51 interpolates mid-line
    res = forward_one(index, f"51 {doc.text}")
    assert res
    top = next((r for r in res if r["feature_id"] == doc.doc_id), None)
    assert top is not None
    assert top["address"] == "51"
    geom = json.loads(doc.geometry_json)
    line = geom["coordinates"][0]
    xs = [p[0] for p in line]
    assert min(xs) - 1e-6 <= top["center_lon"] <= max(xs) + 1e-6
    # routable point present for line-backed addresses
    assert top["routable_lon"] is not None


def test_itp_parity(addr_index):
    """Even number resolves on the even (r) side range 2..100."""
    from carmen_ray.geocode.engine import forward_one, resolve_address

    idx, index = addr_index
    f = idx.features.to_pandas()
    doc = f[(f.layer == "address") & (f.addr_range_json != "")].iloc[0]

    class FakeFeature:
        addr_numbers_json = ""
        addr_range_json = doc.addr_range_json
        geometry_json = doc.geometry_json

    even = resolve_address(FakeFeature(), "50")
    odd = resolve_address(FakeFeature(), "51")
    assert even is not None and odd is not None
    assert not even["omitted"] and not odd["omitted"]
    # they interpolate at different fractions → different points
    assert (even["lon"], even["lat"]) != (odd["lon"], odd["lat"])
    # out of range but within 400 → omitted fallback
    near_miss = resolve_address(FakeFeature(), "130")
    assert near_miss is not None and near_miss["omitted"]
    far = resolve_address(FakeFeature(), "9000")
    assert far is None


def test_address_query_trailing_number(addr_index):
    """'name 5' (number last) still matches via the swapped leading form
    with the 0.99 number-order penalty."""
    from carmen_ray.geocode.engine import forward_one

    idx, index = addr_index
    f = idx.features.to_pandas()
    doc = f[(f.layer == "address") & (f.addr_numbers_json != "")].iloc[0]
    res = forward_one(index, f"{doc.text} 5")
    hit = next((r for r in res if r["feature_id"] == doc.doc_id), None)
    assert hit is not None
    assert hit["address"] == "5"


def test_autocomplete_prefix(addr_index):
    """Autocomplete: a name prefix matches via the ender-prefix range
    lookup (fuzzy-phrase prefix semantics)."""
    from carmen_ray.geocode.engine import forward_one

    idx, index = addr_index
    f = idx.features.to_pandas()
    street = f[f.layer == "street"].iloc[0]
    word = street.text.split()[0]
    res = forward_one(index, word[:-1], fuzzy=False)  # drop last char
    assert res, "prefix query found nothing"
    assert any(r["feature_id"] == street.doc_id or r["place_name"].split(",")[0].startswith(word[:-1])
               for r in res)
    # autocomplete off → prefix no longer matches
    res_off = forward_one(index, word[:-1], fuzzy=False, autocomplete=False)
    assert not any(r["place_name"].split(",")[0].startswith(word) for r in res_off)


def test_partial_number_boost(addr_index):
    """Single-number query: prefix-waffled address matches surface with
    the ×300 scoredist boost (R4)."""
    from carmen_ray.geocode.engine import forward_one

    idx, index = addr_index
    res = forward_one(index, "5")
    addr_hits = [r for r in res if r["feature_id"].startswith("address.")]
    if addr_hits:  # clusters index '#' for single digits
        assert addr_hits[0]["scoredist"] > 0
