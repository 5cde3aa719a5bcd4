#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential oracle.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]

With a third argument, also writes a per-query JSON record in the
driver's CORRECTNESS_r{N}.json shape (rows_match/schema_match/
hash_match/spark_rows/oracle_rows/err).

Reads <verifyOutDir>/oracle_sql.json, registers each harness table as a
DuckDB view over <sfDir>/*.parquet, runs every oracle SQL, reads the
corresponding Spark parquet dump, sorts columns by name on both sides, and
compares row counts, dtypes (loosely) and values (exactly; NaN==NaN).

NOT part of the Scala library — dev-only tooling on the container's
driver-side python (duckdb/pandas/pyarrow).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)


def frame_rows(df):
    df = df[sorted(df.columns)]
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]


def quantization_sentinel(con):
    """Pin the DuckDB decimal-quantization behaviors the oracle SQL leans
    on (ADVICE r12): (a) VARCHAR->DECIMAL rounds the shortest decimal repr
    HALF-UP (the sum casts' route to Spark's Cast semantics), (b)
    round(DECIMAL(28,14), 9) is half-up at the boundary (round9ViaDecimal),
    (c) doubles print in shortest form. Both (a) and (b) are
    version-sensitive (double formatting changed across DuckDB releases) —
    an engine upgrade that shifts any of them must fail HERE with a named
    cause, not as a mystery 1-ulp diff in some sf5 PQ row.
    """
    checks = [
        ("SELECT CAST(CAST(1.5e-10 AS VARCHAR) AS DECIMAL(38,10))",
         "2E-10", "varchar->decimal half-up at the 10dp boundary"),
        ("SELECT CAST(round(CAST(0.1234567895::DOUBLE AS DECIMAL(28,14)), 9) "
         "AS DOUBLE)", "0.12345679", "decimal(28,14) round-9 half-up"),
        ("SELECT CAST(0.1234567895::DOUBLE AS VARCHAR)",
         "0.1234567895", "shortest-form double printing"),
    ]
    for sql, want, what in checks:
        got = str(con.execute(sql).fetchone()[0])
        assert got == want, (
            f"DuckDB {duckdb.__version__} quantization sentinel failed "
            f"({what}): {sql!r} -> {got!r}, expected {want!r}. The decimal "
            "oracle routes are calibrated to this behavior — recalibrate "
            "SparkEntry's round9ViaDecimal/VARCHAR casts before trusting "
            "any differential result.")


def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    quantization_sentinel(con)
    import os
    threads = os.environ.get("GRAFT_CHECK_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    # Long differentials (sf1 takes hours) survive interruption by
    # replaying a prior run's log: names already printed as OK are
    # recorded as green without re-running the oracle.
    resume_ok = set()
    resume_log = os.environ.get("GRAFT_CHECK_RESUME_LOG")
    if resume_log and os.path.exists(resume_log):
        for ln in open(resume_log):
            if ln.startswith("OK   "):
                resume_ok.add(ln[5:].split(":")[0].strip())
    for t in TABLES:
        # driver testdata tables are single parquet FILES; Spark-written
        # tiers (GenScale/GenSkew output) are part-file DIRECTORIES;
        # text-only tiers (GenText output) hold just documents/embeddings —
        # register what exists, and a query touching a missing table fails
        # as oracle_sql_error rather than blocking the whole tier
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    records = {}

    def record(name, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        records[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

    import glob
    declared = sorted(set(
        p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")))
    for name in declared:
        if name in resume_ok:
            # a resumed green is only honored if the Spark output the prior
            # run compared is still present and readable — otherwise fall
            # through to the normal path (which records no_spark_output),
            # so a replayed log can never mark a missing dump green
            got_n = None
            try:
                got_n = sum(len(pd.read_parquet(p))
                            for p in glob.glob(f"{out_dir}/{name}/*.parquet"))
            except Exception:
                got_n = None
            if got_n is not None and glob.glob(f"{out_dir}/{name}/*.parquet"):
                print(f"OK   {name}: {got_n} rows  [resumed]")
                record(name, rows_match=True, schema_match=True, hash_match=True,
                       spark_rows=got_n, oracle_rows=got_n)
                continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            record(name, err="no_spark_output")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        if name not in oracles:
            print(f"WEAK {name}: no oracle (rows-only check) rows={len(got)}")
            record(name, spark_rows=len(got), err="no_oracle")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, spark_rows=len(got), err=f"oracle_sql_error: {e}")
            failures += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            record(name, spark_rows=len(got), oracle_rows=len(exp),
                   err="schema_mismatch")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            record(name, schema_match=True, spark_rows=len(got),
                   oracle_rows=len(exp), err="row_count_mismatch")
            failures += 1
            continue
        g, e = frame_rows(got), frame_rows(exp)
        bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first at {i}:")
            print(f"  spark : {g[i]}")
            print(f"  oracle: {e[i]}")
            # dtype hint
            print(f"  dtypes spark={dict(got.dtypes.astype(str))}")
            print(f"  dtypes oracle={dict(exp.dtypes.astype(str))}")
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(g), oracle_rows=len(e), err="value_mismatch")
            failures += 1
        else:
            dt_note = ""
            gd = dict(got[sorted(got.columns)].dtypes.astype(str))
            ed = dict(exp[sorted(exp.columns)].dtypes.astype(str))
            if gd != ed:
                dt_note = f"  [dtype drift: {{k: (gd, ed) for differing}} {dict((k, (gd[k], ed[k])) for k in gd if gd[k] != ed[k])}]"
            print(f"OK   {name}: {len(g)} rows{dt_note}")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(g), oracle_rows=len(e))
    print(f"=== {failures} failures / {len(declared)} queries")
    if json_out:
        records["_meta"] = {"duckdb_version": duckdb.__version__,
                            "sf_dir": sf_dir}
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
