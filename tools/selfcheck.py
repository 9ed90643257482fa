#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare: for each query in
oracle_sql.json, run the SQL over the sf tables + staged parquet and
compare against the Spark parquet dump (rows, schema names, value hash
with columns sorted by name)."""
import sys, json, glob, hashlib
import duckdb

verify_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float): return repr(round(v, 9))
    if isinstance(v, bool): return str(v)
    return str(v)

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = sorted(glob.glob(f"{verify_dir}/{name}/*.parquet"))
    if not spark_files:
        fails.append((name, "no spark output")); continue
    try:
        odf = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet({spark_files!r})").fetch_arrow_table()
    ocols, scols = sorted(odf.column_names), sorted(sdf.column_names)
    if ocols != scols:
        fails.append((name, f"schema mismatch: spark={scols} oracle={ocols}")); continue
    if odf.num_rows != sdf.num_rows:
        fails.append((name, f"rows: spark={sdf.num_rows} oracle={odf.num_rows}")); continue
    def h(tbl):
        m = hashlib.sha256()
        cols = [tbl.column(c).to_pylist() for c in sorted(tbl.column_names)]
        for row in zip(*cols):
            m.update(("|".join(canon(v) for v in row) + "\n").encode())
        return m.hexdigest()
    if h(odf) != h(sdf):
        # find first diff row for debugging
        oc = [odf.column(c).to_pylist() for c in ocols]
        sc = [sdf.column(c).to_pylist() for c in scols]
        diff = next((i for i, (a, b) in enumerate(zip(zip(*oc), zip(*sc)))
                     if [canon(v) for v in a] != [canon(v) for v in b]), -1)
        d = ""
        if diff >= 0:
            d = f" first diff row {diff}: oracle={[canon(v) for v in list(zip(*oc))[diff]]} spark={[canon(v) for v in list(zip(*sc))[diff]]} cols={ocols}"
        fails.append((name, "hash mismatch" + d)); continue
    print(f"OK   {name} ({sdf.num_rows} rows)")
for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-checked queries pass")
sys.exit(1 if fails else 0)
