"""Optional Lance storage adapter (SURVEY §1.1: the north-star target
names a Lance table; the lance package is absent in this environment,
so the adapter is import-gated with a parquet fallback — the layout
contract (part=<key>/, _lineage.json, atomic rename, manifest) is
identical for both formats).

The real-lance tests skip when the package is missing; the fallback
contract tests always run.
"""

import pyarrow as pa
import pytest

from carmen_ray.sources import io as cio


def _tbl():
    return pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})


def test_auto_format_resolves():
    fmt = cio._resolve_format(None)
    assert fmt == ("lance" if cio._lance is not None else "parquet")
    assert cio._resolve_format("parquet") == "parquet"
    with pytest.raises(ValueError):
        cio._resolve_format("orc")


@pytest.mark.skipif(cio._lance is not None, reason="lance installed")
def test_explicit_lance_without_lib_errors(tmp_path):
    with pytest.raises(ImportError, match="lance"):
        cio.write_partition(str(tmp_path), "p0", _tbl(), format="lance")


def test_parquet_fallback_roundtrip(tmp_path):
    rec = cio.write_partition(str(tmp_path), "p0", _tbl(), format="parquet")
    assert rec["format"] == "parquet"
    out = cio.read_partitions(str(tmp_path))
    assert out.num_rows == 3
    assert cio._read_partition_table(str(tmp_path), "p0").equals(_tbl())


def test_auto_roundtrip_matches_contract(tmp_path):
    """Whatever format auto resolves to, the partition contract holds:
    lineage row count, manifest membership, resumability check."""
    cio.write_partition(str(tmp_path), "k1", _tbl())
    assert cio.is_complete(str(tmp_path), "k1")
    parts = cio.completed_partitions(str(tmp_path))
    assert parts["k1"]["rows"] == 3
    assert parts["k1"]["format"] == cio._resolve_format(None)


@pytest.mark.skipif(cio._lance is None, reason="lance not installed")
def test_lance_roundtrip(tmp_path):  # pragma: no cover - env-gated
    rec = cio.write_partition(str(tmp_path), "p0", _tbl(), format="lance")
    assert rec["format"] == "lance"
    assert cio._read_partition_table(str(tmp_path), "p0").equals(_tbl())


@pytest.mark.skipif(cio._lance is None, reason="lance not installed")
def test_lance_index_roundtrip(tmp_path, ray_session):  # pragma: no cover
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import generate_corpus

    idx = build_index(rd.from_arrow(generate_corpus()))
    cio.write_index(idx, str(tmp_path / "ix"), format="lance")
    loaded = cio.load_index(str(tmp_path / "ix"))
    assert loaded.features.num_rows == idx.features.num_rows
