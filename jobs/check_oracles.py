"""Driver-style oracle check: run __spark_entry__.queries()[name] and
oracle_sql()[name] side by side on DuckDB and compare rows/schema/values.

Usage: python jobs/check_oracles.py [--json OUT.json] [sf_dir] [entry ...]
Defaults: sf0.001, all entries that have an oracle.

--json writes a per-entry artifact in the driver's CORRECTNESS shape,
plus an explicit "sf" scale marker (round-4 verdict #8: the committed
artifact must state which scale produced it).
"""

import json
import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as em  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or None
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, sqls = em.queries(), em.oracle_sql()
    names = names or [n for n in qs if n in sqls]
    failed = []
    skipped = []
    report: dict = {"sf": sf.rstrip("/").split("sf")[-1], "entries": {}}
    for n in names:
        if n not in sqls:
            # skips are recorded and EXCLUDED from green/total (round-5
            # advice: counting them overstated coverage)
            print(f"{n}: SKIP (no oracle)")
            skipped.append(n)
            report["entries"][n] = {"skipped": True}
            continue
        try:
            sdf = qs[n](spark, sf)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(r[c] for c in cols) for r in sdf.collect()
            )
            ores = con.sql(sqls[n])
            ocols_all = list(ores.columns)
            order = sorted(range(len(ocols_all)), key=lambda i: ocols_all[i])
            ocols = [ocols_all[i] for i in order]
            orows = sorted(tuple(row[i] for i in order) for row in ores.fetchall())
            ok_rows = len(srows) == len(orows)
            ok_cols = cols == ocols
            ok_vals = srows == orows
            report["entries"][n] = {
                "rows_match": ok_rows,
                "schema_match": ok_cols,
                "hash_match": ok_vals,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
                "err": None,
            }
            status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
            print(
                f"{n}: {status} rows={len(srows)}/{len(orows)} "
                f"cols={'ok' if ok_cols else f'{cols} vs {ocols}'} "
                f"vals={'ok' if ok_vals else 'MISMATCH'}"
            )
            if status == "FAIL":
                failed.append(n)
                if not ok_vals and ok_rows and ok_cols:
                    diff = [
                        (a, b) for a, b in zip(srows, orows) if a != b
                    ][:3]
                    for a, b in diff:
                        print(f"   spark={a}\n  oracle={b}")
        except Exception as e:  # noqa: BLE001
            failed.append(n)
            report["entries"][n] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}"[:500],
            }
            print(f"{n}: ERROR {type(e).__name__}: {e}")
    checked = len(names) - len(skipped)
    if json_out:
        report["green"] = checked - len(failed)
        report["total"] = checked
        report["skipped"] = skipped
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
    extra = f" ({len(skipped)} skipped)" if skipped else ""
    print(f"\n{checked - len(failed)}/{checked} green{extra}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
