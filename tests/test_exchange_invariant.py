"""Pin the Ray behavior the staged exchanges rely on: a sort with
explicit boundaries hands each partition to map_batches as EXACTLY one
batch (one block per sort-reduce partition in Ray 2.49 —
merge_sorted_blocks returns a single block per reduce task).

coalesce_shard / assemble_shard group rows by query_id *within* a
batch; if a future Ray version split large reduce outputs at
target_max_block_size, one query's rows could straddle two batches and
each fragment would emit an independent candidate set (duplicate si
ordinals — assemble_shard raises on that signature at runtime). This
test fails first, at upgrade time, with a clearer message."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd


@pytest.mark.usefixtures("ray_session")
def test_boundary_sort_emits_one_batch_per_partition():
    n = 200_000
    nparts = 16
    mod = 2048
    rng = np.random.default_rng(7)
    t = pa.table({
        "k": rng.integers(0, mod, n).astype(np.int32),
        # wide-ish payload so blocks aren't trivially tiny
        "v": rng.random(n),
    })
    step = mod // nparts
    bounds = list(range(step, mod, step))
    ds = rd.from_arrow(t).repartition(32).sort("k", boundaries=bounds)

    seen = ds.map_batches(
        lambda b: pa.table({
            "lo": pa.array([int(b.column("k")[0].as_py())]),
            "hi": pa.array([int(b.column("k")[-1].as_py())]),
            "rows": pa.array([b.num_rows]),
        }),
        batch_format="pyarrow", batch_size=None,
    ).take_all()

    non_empty = [s for s in seen if s["rows"] > 0]
    # one batch per partition: batch count == partition count, and each
    # batch's key range stays inside one boundary interval
    assert len(non_empty) <= nparts
    import bisect

    for s in non_empty:
        end = bisect.bisect_right(bounds, s["lo"])
        hi = bounds[end] if end < len(bounds) else mod
        assert s["hi"] <= hi, (
            f"batch range [{s['lo']},{s['hi']}] straddles boundary {hi}")
    assert sum(s["rows"] for s in non_empty) == n
