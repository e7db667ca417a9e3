#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir] [query ...]

Reads each <verify_out_dir>/<name> parquet (engine result) and runs the
matching SQL from oracle_sql.json in DuckDB over the sf_dir tables, then
compares: row count, column names (sorted), and cell-by-cell values in row
order. Exits nonzero when any query mismatches.

Dev-only tool (driver-side python env); not part of the Scala library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)  # full precision; engines must be bit-identical
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return repr(val)


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracle_sql = json.loads((out_dir / "oracle_sql.json").read_text())
    failures = []
    for name, sql in sorted(oracle_sql.items()):
        if only and name not in only:
            continue
        res_dir = out_dir / name
        if not res_dir.exists():
            failures.append((name, "engine result missing"))
            print(f"FAIL {name}: engine result missing")
            continue
        try:
            # DuckDB SUM(BIGINT/INT) yields HUGEINT; the driver's arrow/pandas
            # hashing path renders hugeint as float64 and mismatches Spark's
            # long even when values are equal. Our fetchall() path converts
            # both to Python int and would hide it — so flag hugeint outputs
            # hard, from the plan alone, before paying oracle execution.
            rel = con.sql(sql)
            hige = [c for c, t in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(t).upper()]
            if hige:
                failures.append((name, f"oracle outputs HUGEINT cols {hige}"))
                print(f"FAIL {name}: oracle outputs HUGEINT columns {hige} — CAST them to BIGINT")
                continue
            # Same class of hazard: DECIMAL with precision > 18 is int128-
            # backed in both arrow paths and the driver's hash renders it
            # divergently between the Spark parquet result and DuckDB (the
            # d98 round-12 incident). Flag it from the plan, like HUGEINT.
            def _wide_decimal(t):
                s = str(t).upper()
                if "DECIMAL" not in s:
                    return False
                import re
                m = re.search(r"DECIMAL\((\d+)", s)
                return bool(m) and int(m.group(1)) > 18
            wdec = [c for c, t in zip(rel.columns, rel.types)
                    if _wide_decimal(t)]
            if wdec:
                failures.append((name, f"oracle outputs DECIMAL(p>18) cols {wdec}"))
                print(f"FAIL {name}: oracle outputs DECIMAL(p>18) columns {wdec}"
                      " — emit scaled BIGINT (e.g. *1000 AS BIGINT) instead")
                continue
            eng = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchall()
            eng_cols = [d[0] for d in con.description]
            ora = rel.fetchall()
            ora_cols = rel.columns
        except Exception as e:
            failures.append((name, f"error: {e}"))
            print(f"FAIL {name}: {e}")
            continue

        if sorted(eng_cols) != sorted(ora_cols):
            failures.append((name, f"cols {sorted(eng_cols)} != {sorted(ora_cols)}"))
            print(f"FAIL {name}: column mismatch\n  engine {sorted(eng_cols)}\n  oracle {sorted(ora_cols)}")
            continue
        if len(eng) != len(ora):
            failures.append((name, f"rows {len(eng)} != {len(ora)}"))
            print(f"FAIL {name}: row count {len(eng)} != {len(ora)}")
            continue

        # driver sorts columns by name before hashing values
        eperm = [eng_cols.index(c) for c in sorted(eng_cols)]
        operm = [ora_cols.index(c) for c in sorted(ora_cols)]
        bad = None
        for i, (er, orow) in enumerate(zip(eng, ora)):
            ev = [canon(er[j]) for j in eperm]
            ov = [canon(orow[j]) for j in operm]
            if ev != ov:
                bad = (i, ev, ov)
                break
        if bad:
            i, ev, ov = bad
            failures.append((name, f"row {i} differs"))
            print(f"FAIL {name}: row {i} differs (cols {sorted(eng_cols)})\n  engine {ev}\n  oracle {ov}")
        else:
            print(f"PASS {name}: {len(eng)} rows")

    print(f"\n{len(oracle_sql) - len(failures)}/{len(oracle_sql)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
