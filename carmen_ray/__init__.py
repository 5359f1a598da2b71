"""carmen_ray — a from-scratch Ray-Data-native geocoding & spatial-join engine.

Re-expresses the query/data-processing capabilities of mapbox/carmen
(studied read-only at /root/reference) as idiomatic ray.data pipelines:
map_batches over zero-copy Arrow for tokenization / normalization / phrase
and grid index construction / relevance scoring, actor pools for stateful
lookups (phrase set, grid shards, cell geometry), and explicit
groupby / sort shuffles for the wide steps.

Nothing in this package calls ray.init(); the driver, bench.py and the
pytest session fixture own the Ray session.
"""

__version__ = "0.1.0"
