"""Driver-mimic: consume __spark_entry__ exactly as the round harness does."""
import sys, math
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke: entry()
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
print("sample:", rows[:3])
assert len(rows) > 0

# 2. correctness at sf0.01 (the driver's t2 gate)
import os
SF = os.environ.get("SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

SPARK_T = {"bigint": "i64", "int": "i32", "smallint": "i32", "double": "f64",
           "float": "f32", "string": "str", "timestamp": "ts", "timestamp_ntz": "ts",
           "date": "date", "boolean": "bool", "binary": "bin"}

def norm_spark_type(t):
    if t.startswith("array<"):
        return "list<" + norm_spark_type(t[6:-1]) + ">"
    if t.startswith("decimal"):
        return "f64"
    return SPARK_T.get(t, t)

DUCK_T = {"BIGINT": "i64", "HUGEINT": "i64", "INTEGER": "i32", "SMALLINT": "i32",
          "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str", "TIMESTAMP": "ts",
          "DATE": "date", "BOOLEAN": "bool", "BLOB": "bin"}

def norm_duck_type(t):
    t = str(t)
    if t.endswith("[]"):
        return "list<" + norm_duck_type(t[:-2]) + ">"
    if t.startswith("DECIMAL"):
        return "f64"
    return DUCK_T.get(t, t)

# Types whose duckdb->pandas rendering diverges from fetchall(): HUGEINT
# (sum of BIGINT!) becomes float64 in the driver's pandas canonicalizer
# (32.0 vs 32 -> hash mismatch) while fetchall() yields Python ints and
# this gate would say ALL MATCH. pack_sequences escaped exactly this way
# in round 8. Any oracle producing one of these must CAST it away.
PANDAS_DIVERGENT = {"HUGEINT", "UHUGEINT"}

def assert_driver_safe_types(rel, name):
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if str(t).rstrip("[]") in PANDAS_DIVERGENT]
    if bad:
        raise TypeError(
            f"oracle for {name} yields pandas-divergent type(s) {bad}: "
            f"the real driver canonicalizes via pandas where HUGEINT "
            f"renders as float64 and fails the value hash — CAST to BIGINT")

def norm(v):
    # Full precision: both engines round in-query, so any residual
    # float difference is a real cross-engine divergence (f'{v:.6g}'
    # hid sub-unit diffs on >=1e5 magnitudes — the window_running /
    # tpch_q7 class the real driver caught while this gate passed).
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (list, tuple, dict, bytes, bytearray)):
        # The real driver's canonicalizer (pandas factorize) hard-errors
        # on complex cells; being lenient here masked that in round 1.
        raise TypeError(f"complex-typed registry cell would crash the driver: {type(v).__name__}")
    return str(v)

qs, os_ = e.queries(), e.oracle_sql()
only = {n for n in os.environ.get("ONLY", "").split(",") if n}
if only:
    unknown = only - set(qs)
    assert not unknown, f"ONLY names unknown queries: {sorted(unknown)}"
    qs = {n: f for n, f in qs.items() if n in only}
fails = 0
for name, fn in sorted(qs.items()):
    try:
        # queries that .cache() shared frames must not starve later
        # queries' execution memory (observed: accumulated eviction-
        # immune storage blocks OOM'd the ngram join at sf0.1)
        spark.catalog.clearCache()
        sdf = fn(spark, SF)
        got_cols = sdf.columns
        got = [tuple(r) for r in sdf.collect()]
        if name not in os_:
            print(f"{name}: rows-only, {len(got)} rows"); continue
        rel = con.sql(os_[name]); want_cols = list(rel.columns)
        assert_driver_safe_types(rel, name)
        want_types = {c: norm_duck_type(t) for c, t in zip(rel.columns, rel.types)}
        got_types = {c: norm_spark_type(t) for c, t in sdf.dtypes}
        types_ok = all(got_types.get(c) == want_types.get(c) for c in got_cols) if sorted(got_cols)==sorted(want_cols) else False
        want = rel.fetchall()
        order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        order_w = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        ng = sorted(tuple(norm(r[i]) for i in order_g) for r in got)
        nw = sorted(tuple(norm(r[i]) for i in order_w) for r in want)
    except Exception as ex:
        # One bad query must not abort the gate for the rest (the real
        # driver records a per-query err row and moves on).
        fails += 1
        print(f"{name}: ERROR {type(ex).__name__}: {ex}", flush=True)
        continue
    ok = sorted(got_cols)==sorted(want_cols) and ng==nw and types_ok
    print(f"{name}: spark_rows={len(got)} oracle_rows={len(want)} cols_match={sorted(got_cols)==sorted(want_cols)} types_match={types_ok} values_match={ng==nw}", flush=True)
    if not types_ok and sorted(got_cols)==sorted(want_cols):
        diffs = {c: (got_types.get(c), want_types.get(c)) for c in got_cols if got_types.get(c) != want_types.get(c)}
        print("  type-diffs:", diffs, flush=True)
    if not ok:
        fails += 1
        sg, sw = set(map(tuple, ng)), set(map(tuple, nw))
        print("  spark-only:", sorted(sg - sw)[:3], flush=True)
        print("  oracle-only:", sorted(sw - sg)[:3], flush=True)
print("RESULT:", "ALL MATCH" if fails==0 else f"{fails} MISMATCHES")
