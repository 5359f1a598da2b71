"""The carmen-style Geocoder facade: from_docs / geocode / geocode_batch
/ save / load."""

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import generate_corpus


@pytest.fixture(scope="module")
def geocoder(ray_session):
    import ray.data as rd

    from carmen_ray.api import Geocoder

    tbl = generate_corpus(n_streets=30, n_pois=10)
    return Geocoder.from_docs(rd.from_arrow(tbl).repartition(2)), tbl


def test_forward(geocoder):
    g, tbl = geocoder
    f = g.index.features.to_pandas()
    street = f[f.layer == "street"].iloc[0]
    res = g.geocode(street.text)
    assert res[0]["feature_id"] == street.doc_id

    res_lim = g.geocode(street.text, limit=1)
    assert len(res_lim) == 1

    res_typed = g.geocode(street.text, types=["region"])
    assert all(r["feature_id"].startswith("region.") for r in res_typed)


def test_reverse_and_id(geocoder):
    g, _ = geocoder
    f = g.index.features.to_pandas()
    street = f[f.layer == "street"].iloc[0]
    rev = g.geocode(f"{street.center_lon},{street.center_lat}")
    assert rev and rev[0]["context"]
    byid = g.geocode(street.doc_id)
    assert byid and byid[0]["feature_id"] == street.doc_id


def test_batch(geocoder, ray_session):
    import ray.data as rd

    g, _ = geocoder
    f = g.index.features.to_pandas()
    texts = f[f.layer == "poi"]["text"].head(5).tolist()
    q = pa.table({"query_id": [f"q{i}" for i in range(len(texts))], "query": texts})
    out = g.geocode_batch(rd.from_arrow(q), concurrency=1).to_pandas()
    assert set(out["query_id"]) == {f"q{i}" for i in range(len(texts))}


def test_save_load_roundtrip(geocoder, tmp_path_factory, ray_session):
    from carmen_ray.api import Geocoder

    g, _ = geocoder
    path = str(tmp_path_factory.mktemp("gidx"))
    g.save(path)
    g2 = Geocoder.load(path)
    f = g.index.features.to_pandas()
    street = f[f.layer == "street"].iloc[0]
    a = g.geocode(street.text)
    b = g2.geocode(street.text)
    assert [(r["feature_id"], r["relevance"]) for r in a] == \
           [(r["feature_id"], r["relevance"]) for r in b]
