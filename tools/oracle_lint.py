#!/usr/bin/env python3
"""Oracle-type lint (builder dev tool — mirrors the driver's DuckDB compare).

The driver's correctness hash is TYPE-SENSITIVE: an oracle column typed
HUGEINT (DuckDB's int128 result of a bare sum()) hash-mismatches a Spark
BIGINT even when every value is identical. This has cost two rounds
(r5: p12/t16, r6: p18/q43). This lint makes the class unrepresentable:

  1. DESCRIBE each oracle SQL in DuckDB over the sf parquet tables;
     FAIL on any result column typed HUGEINT / UHUGEINT / U*INT.
  2. If a verify-out dir is given (with <name>/ parquet per query),
     compare the DuckDB type of every column against the Spark parquet
     type; FAIL on any mismatch (the gold check — catches DOUBLE-vs-
     DECIMAL, INT-vs-BIGINT, everything).

Usage:
  python3 tools/oracle_lint.py <sfDir> <verifyOutDir>
  python3 tools/oracle_lint.py <sfDir> <verifyOutDir> q43_json_ops ...

Exit 0 = clean; exit 1 = findings (printed per query/column).
"""
import json, os, sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "partsupp",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB DESCRIBE type -> equivalence class shared with Spark parquet types.
# Calibrated against observed driver behavior: the compare normalizes int
# widths (Spark INT row_number vs DuckDB BIGINT hash-matched in r06), so all
# signed ints <=64 bits are one class and all floats are one class; what
# CANNOT be reconciled is int128/unsigned (r05/r06 failures) and
# decimal-vs-float divergence.
DUCK_TO_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "i128", "UHUGEINT": "u128",
    "UTINYINT": "u8", "USMALLINT": "u16", "UINTEGER": "u32", "UBIGINT": "u64",
    "FLOAT": "float", "DOUBLE": "float", "VARCHAR": "str", "BOOLEAN": "bool",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "BLOB": "bin",
}

def duck_class(t):
    t = t.upper()
    if t.startswith("DECIMAL"):
        return t  # keep precision/scale — must match Spark decimal exactly
    if t.endswith("[]"):
        return "list<" + duck_class(t[:-2]) + ">"
    return DUCK_TO_CLASS.get(t, t)

def arrow_class(t):
    import pyarrow as pa
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t): return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "str"
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_date(t): return "date"
    if pa.types.is_timestamp(t): return "ts"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "bin"
    if pa.types.is_decimal(t): return f"DECIMAL({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + arrow_class(t.value_type) + ">"
    return str(t)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    findings = []
    warnings = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            findings.append(f"{name}: DESCRIBE failed: {e}")
            continue
        duck_types = {r[0]: duck_class(r[1]) for r in desc}
        for col, cls in duck_types.items():
            if cls in ("i128", "u128") or cls.startswith("u"):
                findings.append(
                    f"{name}.{col}: DuckDB type {cls} is outside the portable "
                    f"set — wrap the aggregate in CAST(... AS BIGINT)")
        # gold check: oracle type == spark parquet type, column by column
        qdir = os.path.join(out_dir, name)
        if os.path.isdir(qdir):
            files = [f for f in os.listdir(qdir) if f.endswith(".parquet")]
            if files:
                schema = pq.read_schema(os.path.join(qdir, files[0]))
                spark_types = {f.name: arrow_class(f.type) for f in schema}
                if set(spark_types) != set(duck_types):
                    findings.append(
                        f"{name}: column-name mismatch spark={sorted(spark_types)} "
                        f"oracle={sorted(duck_types)}")
                else:
                    for col in spark_types:
                        if spark_types[col] != duck_types[col]:
                            findings.append(
                                f"{name}.{col}: spark {spark_types[col]} vs "
                                f"oracle {duck_types[col]} — driver hash WILL "
                                f"mismatch even if values agree")
        # softer heuristic: DOUBLE oracle columns not visibly ROUND/CAST'd
        for col, cls in duck_types.items():
            if cls == "float":  # duck_class maps DOUBLE/FLOAT -> "float"
                low = sql.lower()
                if f"as {col.lower()}" in low and \
                   not any(k in low for k in ("round(", "cast(", "::double",
                                              "avg(", "quantile", "corr(",
                                              "stddev", "var_")):
                    warnings.append(
                        f"{name}.{col}: DOUBLE without explicit ROUND/CAST "
                        f"convention (float formatting is the next hash trap)")

    for w in warnings:
        print(f"WARN {w}")
    if findings:
        for f in findings:
            print(f"FAIL {f}")
        print(f"\noracle_lint: {len(findings)} finding(s)")
        sys.exit(1)
    print(f"oracle_lint: clean ({len(oracles) if not only else len(only)} oracles)")

if __name__ == "__main__":
    main()
