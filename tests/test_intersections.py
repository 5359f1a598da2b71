"""Intersection queries (R7): '+intersection <cross> , <street>' index
phrases and the 'X and Y' query path — geocode-unit.address-intersections
shape."""

import json

import pytest

from carmen_ray.sources.synth import generate_corpus


@pytest.fixture(scope="module")
def built(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    tbl = generate_corpus(n_streets=60, n_pois=10)
    return build_index(rd.from_arrow(tbl).repartition(2))


def test_intersection_phrases_indexed(built):
    pg = built.phrase_grid.to_pandas()
    inter = pg[pg.phrase.str.startswith("+intersection")]
    assert len(inter) > 0
    assert inter["relev"].eq(1.0).all()
    assert inter.phrase.str.contains(" , ").all()


def test_intersection_query(built):
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = built
    f = idx.features.to_pandas()
    with_inter = f[f.intersections_json != ""]
    assert len(with_inter) > 0
    street = with_inter.iloc[0]
    cross = json.loads(street.intersections_json)[0]
    res = forward_one(IndexData(idx.features, idx.phrase_grid, idx.freq,
                                idx.max_score, idx.layer_zooms),
                      f"{cross} and {street.text}")
    assert res, "intersection query found nothing"
    assert res[0]["feature_id"] == street.doc_id
    assert res[0]["relevance"] >= 0.99


def test_intersection_query_wrong_cross(built):
    """A cross street that doesn't intersect must not produce the
    full-relevance intersection match."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = built
    f = idx.features.to_pandas()
    with_inter = f[f.intersections_json != ""]
    street = with_inter.iloc[0]
    res = forward_one(IndexData(idx.features, idx.phrase_grid, idx.freq,
                                idx.max_score, idx.layer_zooms),
                      f"zzyzzx and {street.text}")
    hits = [r for r in res if r["feature_id"] == street.doc_id and r["relevance"] >= 0.99]
    assert not hits
