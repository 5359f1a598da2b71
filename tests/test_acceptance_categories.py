"""geocoder_categories relevance bump — port of
/root/reference/test/acceptance/geocode-unit.geocoder_categories.test.js.

A poi source with geocoder_categories ['pizza'] and geocoder_tokens
pizza→pz: the category set holds both the tokenized and the
token-replaced form (index.js:230-246); a category query matches the
synonym-holding feature at relevance 1.00 without the category text
becoming matching_text (format-features.js:462-464).
"""

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, point


@pytest.fixture(scope="module")
def cat_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    rows = [
        ("poi.1", _mk_spans([
            ("text", "delicious", ""), ("synonym", "tofu", ""),
            ("geom", point(0.0, 0.0), ""),
            ("center", "0,0", ""),
            ("score", "1", "")])),
        ("poi.2", _mk_spans([
            ("text", "delicious", ""), ("synonym", "pizza", ""),
            ("geom", point(0.0, 0.0), ""),
            ("center", "0,0", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "poi": LayerConfig("poi", zoom=6,
                           geocoder_categories=["pizza"],
                           geocoder_tokens={"pizza": "pz"})})
    return build_acceptance_index(rows, cfg)


def test_categories_tokenized(cat_index):
    """Both the raw and the geocoder_tokens-replaced form are category
    keys (the reference asserts conf.poi.categories has 'pizza' AND
    'pz')."""
    cats = cat_index.layer_categories["poi"]
    assert "pizza" in cats
    assert "pz" in cats


def test_non_category_query(cat_index):
    """'delicious' → poi.1 (score 1 beats poi.2's 0) at relevance 1."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(cat_index, "delicious", limit=1, allow_dupes=True)
    assert res[0]["feature_id"] == "poi.1"
    assert res[0]["place_name"] == "delicious"
    assert res[0]["relevance"] == 1.00


def test_category_query(cat_index):
    """'pizza' → poi.2 via the category synonym, still rendered as
    'delicious' (the category match never becomes matching_text)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(cat_index, "pizza", limit=1)
    assert res[0]["feature_id"] == "poi.2"
    assert res[0]["place_name"] == "delicious"
    assert res[0]["relevance"] == 1.00
