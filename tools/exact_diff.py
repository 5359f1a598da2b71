"""Exact (bit-level) diff of a queries() entry vs its oracle SQL —
mirrors the driver's hash gate more strictly than check_oracle.py's
tolerance compare. Usage: python tools/exact_diff.py <query> [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("uint", "int", "Int")):
            df[c] = df[c].astype("Int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    res = e.queries()[name](sf_dir)
    mine = canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    ref = canon(con.execute(e.oracle_sql()[name]).df())
    print("cols mine:", dict(mine.dtypes.astype(str)))
    print("cols ref: ", dict(ref.dtypes.astype(str)))
    print("rows:", len(mine), len(ref))
    ndiff = 0
    for c in mine.columns:
        a, b = mine[c], ref[c]
        if a.dtype == "float64":
            am, bm = a.to_numpy(), b.to_numpy()
            neq = ~((am == bm) | (np.isnan(am) & np.isnan(bm)))
        else:
            neq = ~((a == b) | (a.isna() & b.isna()))
        k = int(np.sum(neq))
        if k:
            ndiff += k
            print(f"col {c}: {k} mismatches")
            idx = np.flatnonzero(np.asarray(neq))[:10]
            for i in idx:
                va, vb = a.iloc[i], b.iloc[i]
                extra = f" (delta={float(va)-float(vb):.3e})" if a.dtype == "float64" else ""
                print(f"  row {i}: mine={va!r} ref={vb!r}{extra}")
    print("==>", "EXACT MATCH" if ndiff == 0 else f"{ndiff} mismatched cells")
    ray.shutdown()
    return 0 if ndiff == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
