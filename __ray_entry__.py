"""Driver contract for the carmen_ray engine (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in carmen_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``     — flagship pipeline on /root/testdata/sf0.001.
- ``queries()``   — one callable per implemented operator/pipeline
                    (SURVEY.md §2 + training-data ops), each taking an
                    sf_dir and returning a Dataset/DataFrame/Table.
- ``oracle_sql()``— DuckDB-equivalent SQL for the SQL-expressible ones.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: the geocode-join pipeline over the interleaved-document
    corpus derived deterministically from sf0.001 (index build → forward
    geocode batch). Falls back to the pricing pipeline until the full
    geocode path lands in this round."""
    try:
        from carmen_ray.pipelines.flagship import flagship

        return flagship("/root/testdata/sf0.001")
    except ImportError:
        from carmen_ray.pipelines.queries import q_pricing_summary

        return q_pricing_summary("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from carmen_ray.pipelines.queries import QUERIES

    out = dict(QUERIES)
    try:
        from carmen_ray.pipelines.geo_queries import GEO_QUERIES

        out.update(GEO_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from carmen_ray.pipelines.queries import ORACLES

    out = dict(ORACLES)
    try:
        from carmen_ray.pipelines.geo_queries import GEO_ORACLES

        out.update(GEO_ORACLES)
    except ImportError:
        pass
    return out
