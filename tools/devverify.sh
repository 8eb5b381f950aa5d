#!/bin/bash
# Fast dev loop: run Verify for a prefix subset, then compare vs DuckDB.
# Usage: tools/devverify.sh q86[,q87...] [sfdir]
set -e
PREFIX="$1"
SF="${2:-/root/testdata/sf0.01}"
OUT=/tmp/devverify
rm -rf "$OUT"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "$(ls /opt/spark/jars/*.jar | tr '\n' ':')/root/repo/target/scala-2.13/classes" \
  graft.Verify "$SF" "$OUT" "$PREFIX" 2>/dev/null
python3 - "$SF" "$OUT" <<'PYEOF'
import json, sys, glob, os
import duckdb, pandas as pd, numpy as np
SF, OUT = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{SF}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(f).replace('.parquet','')} AS SELECT * FROM read_parquet('{f}')")
oracle = json.load(open(f"{OUT}/oracle_sql.json"))
for name, sql in sorted(oracle.items()):
    pdir = f"{OUT}/{name}"
    if not os.path.isdir(pdir):
        continue
    spark_df = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{pdir}/*.parquet"))])
    duck_df = con.execute(sql).df()
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    d = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); continue
    bad = None
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
            eq = np.array_equal(sv.astype('float64'), dv.astype('float64'), equal_nan=True)
        else:
            eq = (pd.Series(sv).astype(str) == pd.Series(dv).astype(str)).all()
        if not eq:
            bad = c; break
    if bad:
        m = (pd.Series(s[bad]).astype(str) != pd.Series(d[bad]).astype(str))
        idx = m[m].index[:3]
        print(f"FAIL {name}: col {bad} diff at rows {list(idx)}: spark={s[bad][idx].tolist()} duck={d[bad][idx].tolist()}")
    else:
        print(f"OK   {name}: {len(s)} rows")
PYEOF
