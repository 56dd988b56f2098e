#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare for a SpotCheck dump.

Usage: python3 tools/spot_compare.py <sfDir> <outDir> <name> [<name> ...]

For each query: loads the Spark parquet result and runs the dumped oracle
SQL in DuckDB over the same tables, sorts columns by name, compares row
count, column names, and a canonical value hash (the driver's discipline).
"""
import sys, duckdb, glob, hashlib


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(fmt(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def fmt(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main():
    sf, out, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    ok = True
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        srows = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [d[0] for d in con.description]
        sql = open(f"{out}/{name}.sql").read()
        orows = con.execute(sql).fetchall()
        ocols = [d[0] for d in con.description]
        rows = len(srows) == len(orows)
        schema = sorted(scols) == sorted(ocols)
        h = schema and canon(srows, scols) == canon(orows, ocols)
        status = "OK " if (rows and schema and h) else "FAIL"
        print(f"{status} {name}: rows {len(srows)}/{len(orows)} "
              f"schema={schema} hash={h}")
        if not (rows and schema and h):
            ok = False
            print("  spark cols:", scols, "\n  oracle cols:", ocols)
            for a, b in list(zip(sorted(srows, key=str),
                                 sorted(orows, key=str)))[:5]:
                if str(a) != str(b):
                    print("  spark:", a, "\n  oracle:", b)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
