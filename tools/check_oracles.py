"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables, compare per-query
(rows, schema-by-sorted-column-name, and value hash)."""
import duckdb, json, sys, glob, os, time

def canon(con, rel):
    df = rel.fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    # sort rows by all columns for order-independent compare
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = bad = 0
    times = {}
    for name, sql in sorted(oracles.items()):
        t0 = time.monotonic()
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"[MISSING] {name}: no spark output"); bad += 1; continue
        got = canon(con, con.sql(f"SELECT * FROM '{files[0]}'"))
        want = canon(con, con.sql(sql))
        times[name] = time.monotonic() - t0
        if list(got.columns) != list(want.columns):
            print(f"[SCHEMA ] {name}: got {list(got.columns)} want {list(want.columns)}"); bad += 1; continue
        if len(got) != len(want):
            print(f"[ROWS   ] {name}: got {len(got)} want {len(want)}"); bad += 1; continue
        eq = got.astype(str).equals(want.astype(str))
        if not eq:
            diff = (got.astype(str) != want.astype(str)).any(axis=1)
            print(f"[VALUES ] {name}: {diff.sum()} differing rows; first:")
            i = diff.idxmax()
            print("  got :", got.iloc[i].to_dict())
            print("  want:", want.iloc[i].to_dict()); bad += 1; continue
        print(f"[OK     ] {name}: {len(got)} rows ({times[name]:.2f}s)"); ok += 1
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:15]
    print("-- slowest oracles --")
    for n, t in slow:
        print(f"  {t:7.2f}s  {n}")
    print(f"-- total oracle wall: {sum(times.values()):.1f}s over {len(times)} queries --")
    print(f"== {ok} ok, {bad} bad ==")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
