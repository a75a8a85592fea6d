"""Driver simulation: __spark_entry__ contract at sf0.01 vs DuckDB oracles."""
import sys, time

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

rows = E.entry(spark).collect()
print(f"entry: {len(rows)} rows OK")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "%.6g" % v
    return str(v)


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


qs = E.queries()
oracles = E.oracle_sql()
fail = 0
only = sys.argv[1:] or None
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:
        print(f"FAIL {name}: spark error {e}")
        fail += 1
        continue
    osql = oracles.get(name)
    if osql is None:
        print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        continue
    try:
        res = con.execute(osql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}")
        fail += 1
        continue
    sc, sr = norm(scols, srows)
    oc, od = norm(ocols, orows)
    if sc != oc:
        print(f"FAIL {name}: schema {sc} vs {oc}")
        fail += 1
    elif sr != od:
        print(f"FAIL {name}: rows {len(sr)} vs {len(od)}; first diff:")
        for a, b in zip(sr, od):
            if a != b:
                print("  spark :", a)
                print("  oracle:", b)
                break
        if len(sr) != len(od):
            ss, os_ = set(sr), set(od)
            print("  spark-only:", list(ss - os_)[:3])
            print("  oracle-only:", list(os_ - ss)[:3])
        fail += 1
    else:
        print(f"ok {name}: {len(sr)} rows ({time.time()-t0:.1f}s)")

print("RESULT:", "FAIL" if fail else "PASS", f"({fail} failures)")
spark.stop()
sys.exit(1 if fail else 0)
