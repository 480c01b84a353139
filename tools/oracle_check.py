#!/usr/bin/env python3
"""Driver-style oracle compare: run each oracle_sql.json entry in DuckDB
over the sf0.01 parquet tables, sort columns by name, compare values
exactly against the Spark parquet dump in /tmp/verify_out/<name>/."""
import duckdb, glob, json, os, sys
import pandas as pd

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
OUT = os.environ.get("VERIFY_OUT", "/tmp/verify_out")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
# Bound DuckDB: an sf1-scale oracle was observed ballooning past 100 GB
# RSS (the box has 125) before being killed. With a limit + temp dir the
# same query spills to disk instead of OOMing the host.
con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '32GB')}'")
# per-pid: DuckDB temp files have fixed names (duckdb_temp_storage-N.tmp),
# so parallel processes sharing one temp_directory delete each other's
# spill files mid-query (observed: IOException "Could not remove file")
con.execute(f"SET temp_directory='/tmp/duck_spill_{os.getpid()}'")
con.execute(f"SET threads={os.environ.get('DUCK_THREADS', '16')}")
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.isdir(p):
        # Spark-layout table (directory of part files), e.g. the
        # GenTestData sf1 / adversarial corpora
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

with open(f"{OUT}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

results = {}
import time
names = sorted(os.listdir(OUT))
# ONLY=p20_dedup_clusters,p91_edit_similarity limits the compare (lets a
# long gate shard across parallel processes; merge the JSONs after)
only = os.environ.get("ONLY")
if only:
    keep = set(x.strip() for x in only.split(",") if x.strip())
    names = [n for n in names if n in keep]
def flush():
    # partial results survive a kill; progress is greppable live.
    # pid-suffixed: parallel ONLY-sharded processes share one OUT dir
    with open(os.path.join(OUT, f"_oracle_partial.{os.getpid()}.json"), "w") as f:
        json.dump(results, f)
for name in names:
    d = os.path.join(OUT, name)
    if not os.path.isdir(d):
        continue
    t0 = time.time()
    print(f"[oracle] {name} ...", file=sys.stderr, flush=True)
    files = glob.glob(f"{d}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files \
        else pd.DataFrame()
    sql = oracles.get(name)
    if not sql:
        results[name] = {"rows": len(spark_df), "oracle": None, "err": "no_oracle"}
        flush()
        continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        results[name] = {"rows": len(spark_df), "oracle": None,
                         "err": f"oracle_fail: {e}"}
        flush()
        continue
    rows_match = len(spark_df) == len(odf)
    schema_match = sorted(spark_df.columns) == sorted(odf.columns)
    hash_match = False
    if rows_match and schema_match:
        a, b = canon(spark_df), canon(odf)
        try:
            # numeric tolerance-free compare like the driver: exact values
            hash_match = a.equals(b)
            if not hash_match:
                # fall back to string-canonical compare (dtype mismatches
                # like int32 vs int64 shouldn't fail the check)
                hash_match = a.astype(str).equals(b.astype(str))
        except Exception:
            hash_match = False
    results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                     "hash_match": hash_match, "spark_rows": len(spark_df),
                     "oracle_rows": len(odf)}
    print(f"[oracle] {name} done in {time.time() - t0:.1f}s "
          f"(rows={len(odf)})", file=sys.stderr, flush=True)
    flush()

bad = {k: v for k, v in results.items()
       if v.get("err") not in (None, "no_oracle") or
          (v.get("err") is None and not (v.get("rows_match") and
           v.get("schema_match") and v.get("hash_match")))}
print(json.dumps(results, indent=1))
print(f"\n{len(results)} checked, {len(bad)} BAD", file=sys.stderr)
if bad:
    print(json.dumps(bad, indent=1), file=sys.stderr)
    sys.exit(1)
