"""Multitype (carmen:types) — port of
/root/reference/test/acceptance/geocode-unit.multitype.test.js,
geocode-unit.multitype-reverse.test.js and
geocode-unit.multitype-leapfrog.test.js.

A feature indexed in one source but multityped via carmen:types can be
returned AS another type: the stackFeatures type-memo walk assigns each
chain member its last-to-first untaken type, reconstructs the extid from
the selected type ('caracas' standalone is place.1 even though it lives
in the region source), and the requested-types filter applies only
before the first kept feature.

Divergence note: carmen returns context as separate features; this
engine renders the chain into place_name and a context id list — the
assertions pin the same membership/ids through that shape.
"""

import json

import pyarrow as pa
import pytest

from carmen_ray.config import GeocoderConfig, LayerConfig
from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

BOX = json.dumps({"type": "Polygon", "coordinates": [[
    [-40, -40], [-40, 40], [40, 40], [40, -40], [-40, -40]]]})
PT = json.dumps({"type": "Point", "coordinates": [0, 0]})


def _tbl(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })


def _build(rows, cfg):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    idx = build_index(rd.from_arrow(_tbl(rows)).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def _doc(doc_id, text, geom, types=None):
    entries = [("text", text, ""), ("geom", geom, ""), ("center", "0,0", "")]
    if types:
        entries.append(("types", ",".join(types), ""))
    return doc_id, _mk_spans(entries)


# ---------------------------------------------------- multitype.test.js
@pytest.fixture(scope="module")
def mt_index(ray_session):
    cfg = GeocoderConfig(layers={
        "mtregion": LayerConfig("mtregion", zoom=6, geocoder_name="region",
                                geocoder_types=["region", "place"]),
        "mtplace": LayerConfig("mtplace", zoom=6, geocoder_name="place"),
        "mtpoi": LayerConfig("mtpoi", zoom=6, geocoder_name="poi"),
    })
    rows = [
        _doc("mtregion.1", "caracas", BOX, types=["region", "place"]),
        _doc("mtplace.1", "libertador", BOX),
        _doc("mtpoi.1", "cafe", PT),
    ]
    return _build(rows, cfg)


def test_mt_reverse_full(mt_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(mt_index, 0, 0)
    assert res[0]["place_name"] == "cafe, libertador, caracas"
    assert res[0]["feature_id"] == "poi.1"
    assert res[0]["context"] == ["place.1", "region.1"]


def test_mt_reverse_types_poi(mt_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(mt_index, 0, 0, types=["poi"])
    assert res[0]["place_name"] == "cafe, libertador, caracas"
    assert res[0]["feature_id"] == "poi.1"
    assert res[0]["context"] == ["place.1", "region.1"]


def test_mt_reverse_types_place(mt_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(mt_index, 0, 0, types=["place"])
    assert res[0]["place_name"] == "libertador, caracas"
    assert res[0]["feature_id"] == "place.1"


def test_mt_reverse_types_region(mt_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(mt_index, 0, 0, types=["region"])
    assert res[0]["place_name"] == "caracas"
    assert res[0]["feature_id"] == "region.1"


def test_mt_reverse_types_place_region(mt_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(mt_index, 0, 0, types=["place", "region"])
    assert res[0]["place_name"] == "libertador, caracas"
    assert res[0]["feature_id"] == "place.1"


def test_mt_forward_cafe(mt_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(mt_index, "cafe")
    assert res[0]["place_name"] == "cafe, libertador, caracas"
    assert res[0]["feature_id"] == "poi.1"
    assert res[0]["context"] == ["place.1", "region.1"]


def test_mt_forward_libertador(mt_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(mt_index, "libertador")
    assert res[0]["place_name"] == "libertador, caracas"
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["context"] == ["region.1"]


def test_mt_forward_caracas_shift(mt_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(mt_index, "caracas")
    assert res[0]["place_name"] == "caracas"
    assert res[0]["feature_id"] == "place.1"


def test_mt_forward_caracas_types_place(mt_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(mt_index, "caracas", types=["place"])
    assert res[0]["place_name"] == "caracas"
    assert res[0]["feature_id"] == "place.1"


# -------------------------------------------- multitype-reverse.test.js
@pytest.fixture(scope="module")
def mtr_index(ray_session):
    cfg = GeocoderConfig(layers={
        "mtregion": LayerConfig("mtregion", zoom=6, geocoder_name="region",
                                geocoder_types=["region", "place"]),
        "mtpoi": LayerConfig("mtpoi", zoom=6, geocoder_name="poi"),
    })
    rows = [
        _doc("mtregion.1", "caracas", BOX, types=["region", "place"]),
        _doc("mtpoi.1", "cafe", PT),
    ]
    return _build(rows, cfg)


def test_mtr_reverse(mtr_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(mtr_index, 0, 0)
    assert res[0]["place_name"] == "cafe, caracas"
    assert res[0]["feature_id"] == "poi.1"
    assert res[0]["context"] == ["place.1"]


def test_mtr_reverse_types_place(mtr_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(mtr_index, 0, 0, types=["place"])
    assert res[0]["place_name"] == "caracas"
    assert res[0]["feature_id"] == "place.1"


def test_mtr_reverse_types_region(mtr_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(mtr_index, 0, 0, types=["region"])
    assert res[0]["place_name"] == "caracas"
    assert res[0]["feature_id"] == "region.1"


def test_mtr_reverse_types_place_region(mtr_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(mtr_index, 0, 0, types=["place", "region"])
    assert res[0]["place_name"] == "caracas"
    assert res[0]["feature_id"] == "place.1"


# ------------------------------------------- multitype-leapfrog.test.js
@pytest.fixture(scope="module")
def leap_index(ray_session):
    cfg = GeocoderConfig(layers={
        "mtregion": LayerConfig("mtregion", zoom=6, geocoder_name="region",
                                geocoder_types=["region", "place"]),
        "mtdistrict": LayerConfig("mtdistrict", zoom=6,
                                  geocoder_name="district"),
        "mtplace": LayerConfig("mtplace", zoom=6, geocoder_name="place"),
    })
    rows = [
        _doc("mtregion.1", "capital", BOX, types=["region", "place"]),
        _doc("mtdistrict.1", "district 1", BOX),
        _doc("mtdistrict.2", "district 2", BOX),
        _doc("mtplace.2", "smallplace", BOX),
    ]
    return _build(rows, cfg)


def test_leapfrog_reverse(leap_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(leap_index, 0, 0)
    assert res[0]["place_name"] == "smallplace, district 1, capital"
    assert res[0]["feature_id"] == "place.2"
    assert res[0]["context"] == ["district.1", "region.1"]


def test_leapfrog_forward_capital(leap_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(leap_index, "capital")
    assert res[0]["place_name"] == "capital"
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["context"] == []
