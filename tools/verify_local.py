#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql, mimicking the
driver's DuckDB compare: for each query, load the Spark parquet result and
the DuckDB oracle result, sort columns by name, sort rows, compare values.

Usage: python3 tools/verify_local.py <sfdir> <verify_out_dir> [artifact.json]
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)

With a third argument, also writes a driver-CORRECTNESS-style JSON
artifact (per-query rows/schema/hash match) to that path; merge any
`_meta` block in by hand afterwards.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; tools.ScaleUp writes
        # directory layouts — glob the parts in that case
        src = Path(sfdir, f"{t}.parquet")
        pat = f"{src}/*.parquet" if src.is_dir() else str(src)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
        # Spark (nanosAsLong) round-trips the events timestamp as
        # int64 nanos, so scaled-up copies surface BIGINT where the
        # driver testdata has a microsecond TIMESTAMP — normalize so
        # the oracle SQL binds identically against both layouts
        cols = {c[0]: c[1] for c in
                con.execute(f"DESCRIBE {t}").fetchall()}
        if cols.get("ts") == "BIGINT":
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * "
                        f"REPLACE (make_timestamp(ts // 1000) AS ts) "
                        f"FROM '{pat}'")
    oracle = json.loads(Path(outdir, "oracle_sql.json").read_text())
    n_pass = n_fail = n_rowsonly = 0
    artifact = {}
    for name in sorted(p.name for p in Path(outdir).iterdir() if p.is_dir()):
        spark_rel = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        spark_cols = [d[0] for d in spark_rel.description]
        spark_rows = spark_rel.fetchall()
        if name not in oracle:
            n_rowsonly += 1
            print(f"ROWSONLY {name}: rows={len(spark_rows)}")
            artifact[name] = {"rows_match": None, "schema_match": None,
                              "hash_match": None,
                              "spark_rows": len(spark_rows),
                              "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            ora_rel = con.execute(oracle[name])
            ora_cols = [d[0] for d in ora_rel.description]
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: oracle SQL error: {e}")
            artifact[name] = {"rows_match": False, "schema_match": False,
                              "hash_match": False,
                              "spark_rows": len(spark_rows),
                              "oracle_rows": None,
                              "err": f"oracle SQL error: {e}"[:200]}
            continue
        sc, sr = canon(spark_rows, spark_cols)
        oc, orows = canon(ora_rows, ora_cols)
        rec = {"rows_match": len(sr) == len(orows), "schema_match": sc == oc,
               "hash_match": sc == oc and sr == orows,
               "spark_rows": len(sr), "oracle_rows": len(orows), "err": None}
        artifact[name] = rec
        if sc != oc:
            n_fail += 1
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            continue
        if sr != orows:
            n_fail += 1
            print(f"FAIL {name}: rows differ "
                  f"(spark {len(sr)} vs oracle {len(orows)})")
            shown = 0
            for a, b in zip(sr, orows):
                if a != b and shown < 3:
                    print(f"  spark:  {a}\n  oracle: {b}")
                    shown += 1
            if len(sr) != len(orows):
                only_s = set(sr) - set(orows)
                only_o = set(orows) - set(sr)
                for x in list(only_s)[:2]:
                    print(f"  only-spark:  {x}")
                for x in list(only_o)[:2]:
                    print(f"  only-oracle: {x}")
            continue
        n_pass += 1
        print(f"PASS {name}: {len(sr)} rows")
    if len(sys.argv) > 3:
        Path(sys.argv[3]).write_text(
            json.dumps(artifact, indent=1, sort_keys=True) + "\n")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
