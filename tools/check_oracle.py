import duckdb, json, sys, glob, os
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output (query failed)")); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}")); continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        fails.append((name, f"cols spark={list(s.columns)} duck={list(d.columns)}")); continue
    if len(s) != len(d):
        fails.append((name, f"rows spark={len(s)} duck={len(d)}")); continue
    s2 = s.sort_values(by=list(s.columns)).reset_index(drop=True).astype(str)
    d2 = d.sort_values(by=list(d.columns)).reset_index(drop=True).astype(str)
    if not s2.equals(d2):
        diff = (s2 != d2).any(axis=1)
        i = diff[diff].index[0]
        fails.append((name, f"value mismatch at row {i}: spark={s2.iloc[i].to_dict()} duck={d2.iloc[i].to_dict()}"))
    else:
        print(f"OK   {name} ({len(s)} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} match")
