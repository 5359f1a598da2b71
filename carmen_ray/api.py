"""User-facing facade mirroring carmen's Geocoder API
(/root/reference/index.js:475-506): construct over sources, then
`geocode(query, options)` / `index(docs)` — so a user of the reference
can switch with familiar calls, while batches run as Ray pipelines.

    from carmen_ray.api import Geocoder

    g = Geocoder.from_docs(docs_dataset)            # index build
    g.geocode("west lake view rd", limit=5)          # single query
    g.geocode("-77.03,38.90")                        # reverse
    g.geocode("place.3")                             # by id
    g.geocode_batch(queries_dataset)                 # Dataset → Dataset
    g.save("/path/to/index"); Geocoder.load(...)     # resumable layout
"""

from __future__ import annotations

from typing import Any

from .config import GeocoderConfig
from .geocode.engine import (
    ForwardGeocoder,
    IndexData,
    forward_geocode_ds,
    forward_one,
    reverse_one,
)
from .index.build import CarmenIndex, build_index
from .text.tokenize import as_reverse, parse_id_query


class Geocoder:
    def __init__(self, index: CarmenIndex, config: GeocoderConfig | None = None):
        self.index = index
        self.config = config
        self._data = IndexData(index.features, index.phrase_grid, index.freq,
                               index.max_score, index.layer_zooms, config=config)

    # ------------------------------------------------------- construction

    @classmethod
    def from_docs(cls, docs_ds, config: GeocoderConfig | None = None) -> "Geocoder":
        """Index a Dataset of interleaved documents (doc_id, spans)."""
        return cls(build_index(docs_ds, config=config), config=config)

    @classmethod
    def load(cls, path: str, config: GeocoderConfig | None = None) -> "Geocoder":
        from .sources.io import load_index

        return cls(load_index(path), config=config)

    def save(self, path: str, resume: bool = True) -> None:
        from .sources.io import write_index

        write_index(self.index, path, resume=resume)

    # ------------------------------------------------------------ queries

    def geocode(self, query: str, **options: Any) -> list[dict]:
        """Single query — forward, reverse ("lon,lat") or id ("type.N").

        Options (carmen geocode options subset): proximity=(lon, lat),
        limit, types, language, languageMode, bbox, stacks,
        autocomplete, fuzzyMatch.
        """
        limit = int(options.get("limit", 5))
        types = options.get("types")
        idq = parse_id_query(query)
        if idq is not None and idq[0] in self._data.layers:
            row = self._data.doc_index.get(f"{idq[0]}.{idq[1]}")
            if row is None:
                return []
            from .geocode.engine import hydrate_one

            return hydrate_one(self._data, row)
        rev = as_reverse(query)
        if rev is not None:
            # carmen's reverse default is 1; an EXPLICIT limit > 1
            # without a single type errors inside reverse_one
            # (geocode.js:216-220)
            rlimit = int(options["limit"]) if "limit" in options else 1
            return reverse_one(self._data, rev[0], rev[1], limit=rlimit,
                               types=types,
                               worldview=options.get("worldview"),
                               language=options.get("language"),
                               language_mode=options.get("languageMode"))
        return forward_one(
            self._data, query,
            proximity=options.get("proximity"),
            limit=limit,
            types=types,
            autocomplete=bool(options.get("autocomplete", True)),
            fuzzy=bool(options.get("fuzzyMatch", True)),
            language=options.get("language"),
            language_mode=options.get("languageMode"),
            stacks=options.get("stacks"),
            bbox=options.get("bbox"),
            worldview=options.get("worldview"),
        )

    def geocode_batch(self, queries_ds, concurrency: int = 4, batch_size: int = 256):
        """Dataset of query rows → Dataset of ranked results."""
        return forward_geocode_ds(queries_ds, self.index,
                                  concurrency=concurrency, batch_size=batch_size,
                                  config=self.config)
