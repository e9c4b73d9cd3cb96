"""Local replica of the driver's correctness gate: run every
`oracle_sql()` entry against DuckDB on an sf dir and hash-compare the
values with the matching `queries()` result (columns sorted by name,
rows sorted, floats rounded to 4 digits).

Usage: python scripts/oracle_check.py [/root/testdata/sf0.01]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(t):
    import pandas as pd

    if str(type(t)).find("ray.data") >= 0:
        t = pa.concat_tables(list(t.iter_batches(batch_format="pyarrow")))
    if isinstance(t, pa.RecordBatch):
        t = pa.Table.from_batches([t])
    df = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    bad = []
    for name, sql in osql.items():
        try:
            mine = norm(qs[name](sf))
            orc = norm(con.execute(sql).fetch_arrow_table())
            rows = len(mine) == len(orc)
            schema = list(mine.columns) == list(orc.columns)
            ok = rows and schema
            if ok:
                h1 = hashlib.md5(mine.round(4).to_csv(index=False).encode()).hexdigest()
                h2 = hashlib.md5(orc.round(4).to_csv(index=False).encode()).hexdigest()
                ok = h1 == h2
            print(f"{name}: rows={rows} schema={schema} hash={'OK' if ok else 'MISMATCH'}")
            if not ok:
                bad.append(name)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {ex}")
            bad.append(name)
    print("BAD:", bad)
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
