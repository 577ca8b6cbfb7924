#!/usr/bin/env python3
"""Self-test for check.py's SPARK-TYPE-DRIFT gate (VERDICT r11 task 7).

The gate exists to catch engine types that the parquet round-trip ERASES:
Verify writes the Spark plan's logical schema to spark_schemas.json, and
check.py diffs it against the oracle's DESCRIBE — independently of what
the parquet file carries. This test proves the gate actually FIRES by
constructing a fixture where:

  - the parquet dump and the oracle agree (BIGINT column — the
    parquet-DESCRIBE gate alone would pass), but
  - the recorded Spark schema says the plan produced DECIMAL(38,0) —
    exactly the wide-decimal class that went red in r8/r10 (sample_pps),
    which parquet narrows on write.

Expected: check.py reports `FAIL fixture_drift: SPARK-TYPE-DRIFT` while
the control query (`fixture_ok`, consistent types) passes. Exit 0 iff
both expectations hold.

Usage: python3 tools/test_check_gate.py
"""
import duckdb, json, os, shutil, subprocess, sys, tempfile

here = os.path.dirname(os.path.abspath(__file__))
tmp = tempfile.mkdtemp(prefix='check_gate_')
try:
    # minimal sf dir: check.py creates views for all ten tables
    sf = os.path.join(tmp, 'sf')
    os.makedirs(sf)
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'documents', 'embeddings']:
        con.execute(
            f"COPY (SELECT 1::BIGINT AS k) TO '{sf}/{t}.parquet' (FORMAT PARQUET)")

    out = os.path.join(tmp, 'verify_out')
    for q in ['fixture_drift', 'fixture_ok']:
        os.makedirs(os.path.join(out, q))
        con.execute(f"COPY (SELECT 5::BIGINT AS x) TO "
                    f"'{out}/{q}/part-0.parquet' (FORMAT PARQUET)")
    json.dump({'fixture_drift': 'SELECT CAST(5 AS BIGINT) AS x',
               'fixture_ok': 'SELECT CAST(5 AS BIGINT) AS x'},
              open(f'{out}/oracle_sql.json', 'w'))
    # the drift fixture's SPARK plan claims a wide decimal the parquet
    # file does not carry; the control claims the matching BIGINT
    json.dump({'fixture_drift': 'x:DECIMAL(38,0)',
               'fixture_ok': 'x:BIGINT'},
              open(f'{out}/spark_schemas.json', 'w'))

    r = subprocess.run([sys.executable, os.path.join(here, 'check.py'),
                        out, sf], capture_output=True, text=True)
    report = r.stdout
    ok = ('FAIL fixture_drift: SPARK-TYPE-DRIFT' in report
          and 'PASS fixture_ok' in report)
    print(report.strip())
    print('GATE-TEST', 'PASS' if ok else 'FAIL')
    sys.exit(0 if ok else 1)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
