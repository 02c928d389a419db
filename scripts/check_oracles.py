"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 on Spark AND its oracle_sql() on DuckDB, compare row count +
column names + order-insensitive exact value sets.

Usage: python scripts/check_oracles.py [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ndjson_spatial_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == int(v) and abs(v) < 1e15:
            return f"n:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"n:{v}"
    return f"s:{v}"


def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_val(r[i]) for i in order) for r in rows
    )
    return sorted(cols), len(lines), hash(tuple(lines)), lines


# order-sensitive queries: the multiset digest alone would let a broken
# sort pass (it degenerates to set-equality), so ALSO verify the Spark row
# SEQUENCE obeys the declared sort contract.  Comparing sequences of the
# declared keys (not whole rows) keeps tied rows from flaking the check.
# spec: list of (column, descending, nulls_first).
ORDERED = {
    "sort": [("s_nationkey", False, False), ("s_acctbal", True, True)],
    # OrderedValue cross-type order: rank asc, then skey/nkey asc with
    # nulls first (null subkey patterns are constant within a rank)
    "sort_cross_type": [("rank", False, False), ("skey", False, True),
                        ("nkey", False, True)],
    "agg_sum": [("l_returnflag", False, False)],
    "agg_count": [("o_orderpriority", False, False)],
    "agg_min": [("p_brand", False, False)],
    "agg_max": [("l_returnflag", False, False), ("l_linestatus", False, False)],
    "pipeline": [("p_brand", False, False)],
    "agg_conditional": [("l_returnflag", False, False)],
    "events_agg": [("event_type", False, False)],
}


def order_violation(name, cols, rows):
    """First adjacent pair breaking the declared order, or None."""
    spec = ORDERED.get(name)
    if not spec or len(rows) < 2:
        return None
    idx = {c: i for i, c in enumerate(cols)}

    def cmp_rows(a, b):
        for c, desc, nulls_first in spec:
            va, vb = a[idx[c]], b[idx[c]]
            if va is None and vb is None:
                continue
            if va is None:
                r = -1 if nulls_first else 1
            elif vb is None:
                r = 1 if nulls_first else -1
            elif va < vb:
                r = -1
            elif va > vb:
                r = 1
            else:
                continue
            return -r if desc else r
        return 0

    for i in range(len(rows) - 1):
        if cmp_rows(rows[i], rows[i + 1]) > 0:
            return i
    return None


def main():
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {str(e)[:500]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {str(e)[:500]}")
            continue
        sc, sn, sh, sl = table_digest(scols, srows)
        dc, dn, dh, dl = table_digest(dcols, drows)
        if sc != dc:
            failures.append((name, f"columns {sc} vs {dc}"))
            print(f"[FAIL] {name}: columns {sc} vs {dc}")
        elif sn != dn:
            failures.append((name, f"rows {sn} vs {dn}"))
            print(f"[FAIL] {name}: rowcount {sn} vs {dn}")
            _show_diff(sl, dl)
        elif sh != dh:
            failures.append((name, "value hash mismatch"))
            print(f"[FAIL] {name}: value hash mismatch ({sn} rows)")
            _show_diff(sl, dl)
        elif (viol := order_violation(name, scols, srows)) is not None:
            failures.append((name, f"order violation at row {viol}"))
            print(f"[FAIL] {name}: sort-order violation at row {viol}: "
                  f"{srows[viol]} > {srows[viol + 1]}")
        else:
            suffix = " (+order)" if name in ORDERED else ""
            print(f"[ OK ] {name}: {sn} rows match{suffix}")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match")


def _show_diff(sl, dl, limit=5):
    ss, ds = set(sl), set(dl)
    for x in list(ss - ds)[:limit]:
        print(f"    spark-only: {x[:200]}")
    for x in list(ds - ss)[:limit]:
        print(f"    duck-only:  {x[:200]}")


if __name__ == "__main__":
    main()
