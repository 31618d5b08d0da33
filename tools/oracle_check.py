import datetime, duckdb, json, glob, os, sys

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf001"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = sys.argv[3:] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def val(v):
    # normalize temporal types: Spark writes day-truncated values as
    # TIMESTAMP (midnight) while DuckDB's date_trunc over DATE columns
    # yields DATE — stringify both as "YYYY-MM-DD HH:MM:SS" so the compare
    # matches the driver's behavior instead of false-failing locally
    if isinstance(v, datetime.datetime):
        base = v.strftime("%Y-%m-%d %H:%M:%S")
        # keep sub-second precision: truncating it would silently weaken the
        # compare to second granularity for real (non-day-truncated) times
        return base + (f".{v.microsecond:06d}" if v.microsecond else "")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d") + " 00:00:00"
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(val(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        spark_rel = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        orel = con.execute(sql)
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
        sc, scn = canon(srows, scols)
        oc, ocn = canon(orows, ocols)
        schema_ok = scn == ocn
        rows_ok = len(sc) == len(oc)
        hash_ok = sc == oc
        status = "OK" if (schema_ok and rows_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{name}: {status} schema={schema_ok} ({scn} vs {ocn}) rows={len(sc)}/{len(oc)}")
            if schema_ok and rows_ok:
                diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
                for a, b in diffs:
                    print(f"   spark={a}\n  oracle={b}")
        else:
            print(f"{name}: OK ({len(sc)} rows)")
    except Exception as e:
        fails += 1
        print(f"{name}: ERR {e}")
print(f"\n{fails} failures")
