#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle and diff (rows / schema-ish / values).

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]
"""
import duckdb, json, sys, math, glob, os, re, threading

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
# Local-evidence knobs (the driver never sets these): CHECK_SKIP=a,b skips
# named queries (for scale runs where a deliberately-quadratic oracle is
# infeasible in DuckDB — the ENGINE side still ran; the oracle replay is
# what's skipped); CHECK_TIMEOUT_S=N interrupts any single oracle query
# after N seconds and records it as TIMEOUT (neither pass nor fail).
skip = set(x for x in os.environ.get('CHECK_SKIP', '').split(',') if x)
timeout_s = float(os.environ.get('CHECK_TIMEOUT_S', '0') or 0)

con = duckdb.connect()
# bound the replay's memory so a heavy oracle at the scale fixtures
# spills to disk instead of drawing the OOM killer (which silently
# kills the whole gate mid-board); override with CHECK_MEM_GB
mem_gb = os.environ.get('CHECK_MEM_GB', '48')
con.execute(f"SET memory_limit='{mem_gb}GB'")
con.execute("SET temp_directory='/tmp/duckdb_spill'")
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    # sf1-scale tables are DIRECTORIES of part files (Spark needs >1 file
    # for scan splits); DuckDB needs the glob spelled out in that case
    p = f'{sf}/{t}.parquet'
    if os.path.isdir(p):
        p = f'{p}/*.parquet'
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f'{out}/oracle_sql.json'))

# ---- strict type-level schema compare (the r9 sample_pps lesson) ----
# Both sides are typed BY DUCKDB (DESCRIBE on the engine's parquet vs
# DESCRIBE on the oracle SQL), then normalized to the Python-type class
# the driver's value hash actually sees: all int widths hash identically,
# FLOAT/DOUBLE both arrive as Python float, but DECIMAL(p,s) vs BIGINT is
# Decimal vs int — a hash mismatch even when values are equal. Decimal
# width/scale is kept exact (Decimal('5') and Decimal('5.0') repr-differ).
def norm_type(t):
    t = re.sub(r'\s+WITH TIME ZONE', '', t)
    t = re.sub(r'\bTIMESTAMP(_NS|_MS|_S)?\b', 'TIMESTAMP', t)
    t = re.sub(r'\b(U?TINYINT|U?SMALLINT|U?INTEGER|U?BIGINT|HUGEINT|INT128)\b', 'INT', t)
    t = re.sub(r'\b(FLOAT|REAL|DOUBLE)\b', 'FLOAT', t)
    return t

def schema_of(query):
    return {r[0]: norm_type(r[1]) for r in con.execute(f'DESCRIBE {query}').fetchall()}

# ---- Spark-side logical-type gate (consumes Verify's spark_schemas.json) ----
# The parquet DESCRIBE above sees what the FILE carries; this sees what the
# SPARK plan declared — catching engine types the parquet round-trip erases
# (e.g. a decimal narrowed on write, a long that became an int). NOT caught
# by construction: TIMESTAMP vs TIMESTAMP_NTZ drift — both sides normalize
# timestamp flavors into one class because DuckDB's DESCRIBE of the oracle
# has no NTZ notion, so a strict compare would red-flag every legitimate
# timestamp query. Complex types (array/map/struct) render too differently
# to diff textually and are skipped per-column; scalars map into the same
# norm space.
def norm_spark_type(t):
    t = t.strip().upper()
    if t.startswith(('ARRAY<', 'MAP<', 'STRUCT<')):
        return None  # not comparable textually
    t = re.sub(r'\bTIMESTAMP_NTZ\b', 'TIMESTAMP', t)
    t = re.sub(r'\b(TINYINT|SMALLINT|INT|BIGINT)\b', 'INT', t)
    t = re.sub(r'\b(FLOAT|REAL|DOUBLE)\b', 'FLOAT', t)
    t = re.sub(r'\bSTRING\b', 'VARCHAR', t)
    t = re.sub(r'\bBINARY\b', 'BLOB', t)
    return t

spark_schemas = {}
try:
    spark_schemas = json.load(open(f'{out}/spark_schemas.json'))
except Exception:
    pass  # older Verify output; the parquet-DESCRIBE gate still runs

def split_fields(s):
    """Split 'a:BIGINT,b:DECIMAL(38,0),c:ARRAY<INT>' on TOP-LEVEL commas
    only (commas inside (), <> belong to the type)."""
    fields, depth, cur = [], 0, []
    for ch in s:
        if ch in '(<':
            depth += 1
        elif ch in ')>':
            depth -= 1
        if ch == ',' and depth == 0:
            fields.append(''.join(cur)); cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append(''.join(cur))
    return [f.split(':', 1) for f in fields if ':' in f]

def spark_schema_drift(name, ora_schema):
    """Columns whose Spark logical type disagrees with the oracle's."""
    if name not in spark_schemas:
        return {}
    drift = {}
    for col_name, spark_t in split_fields(spark_schemas[name]):
        st = norm_spark_type(spark_t)
        ot = ora_schema.get(col_name)
        if st is not None and ot is not None and not ot.startswith(('STRUCT', '[')) \
                and '[]' not in ot and st != ot:
            drift[col_name] = (st, ot)
    return drift

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return 'NaN'
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v

def rows_of(df_cols, rows):
    # sort columns by name (driver behavior), canonicalize values, sort rows
    order = sorted(range(len(df_cols)), key=lambda i: df_cols[i])
    out_rows = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out_rows, key=repr), [df_cols[i] for i in order]

n_pass = n_fail = n_skip = 0
fails = []
timeouts = []
for name in sorted(oracle):
    sql = oracle[name]
    if name in skip:
        print(f'SKIP {name} (CHECK_SKIP)')
        n_skip += 1
        continue
    pq_dir = f'{out}/{name}'
    if not glob.glob(f'{pq_dir}/*.parquet'):
        print(f'FAIL {name}: no parquet output')
        n_fail += 1; fails.append(name)
        continue
    # type-level gate first (DESCRIBE only plans, never executes — safe
    # even for the deliberately-quadratic oracles)
    try:
        eng_schema = schema_of(f"SELECT * FROM '{pq_dir}/*.parquet'")
        ora_schema = schema_of(f'({sql})')
    except Exception as e:
        print(f'FAIL {name}: describe error: {str(e).splitlines()[0][:160]}')
        n_fail += 1; fails.append(name)
        continue
    if eng_schema != ora_schema:
        drift = {k: (eng_schema.get(k), ora_schema.get(k))
                 for k in set(eng_schema) | set(ora_schema)
                 if eng_schema.get(k) != ora_schema.get(k)}
        print(f'FAIL {name}: SCHEMA-DRIFT (engine, oracle): {drift}')
        n_fail += 1; fails.append(name)
        continue
    sdrift = spark_schema_drift(name, ora_schema)
    if sdrift:
        print(f'FAIL {name}: SPARK-TYPE-DRIFT (spark, oracle): {sdrift}')
        n_fail += 1; fails.append(name)
        continue
    timer = None
    timed_out = [False]
    if timeout_s > 0:
        def _interrupt():
            timed_out[0] = True
            con.interrupt()
        timer = threading.Timer(timeout_s, _interrupt)
        timer.start()
    try:
        got = con.execute(f"SELECT * FROM '{pq_dir}/*.parquet'")
        got_rows, got_cols = rows_of([d[0] for d in got.description], got.fetchall())
        want = con.execute(sql)
        want_rows, want_cols = rows_of([d[0] for d in want.description], want.fetchall())
    except Exception as e:
        if timer: timer.cancel()
        if timed_out[0]:
            print(f'TIMEOUT {name} (> {timeout_s:.0f}s oracle replay)')
            n_skip += 1; timeouts.append(name)
        else:
            print(f'FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}')
            n_fail += 1; fails.append(name)
        continue
    finally:
        if timer: timer.cancel()
    if got_cols != want_cols:
        print(f'FAIL {name}: columns {got_cols} != {want_cols}')
        n_fail += 1; fails.append(name)
    elif len(got_rows) != len(want_rows):
        print(f'FAIL {name}: rows {len(got_rows)} != {len(want_rows)}')
        n_fail += 1; fails.append(name)
    elif got_rows != want_rows:
        diffs = [(g, w) for g, w in zip(got_rows, want_rows) if g != w]
        print(f'FAIL {name}: {len(diffs)} differing rows; first: got={diffs[0][0]} want={diffs[0][1]}')
        n_fail += 1; fails.append(name)
    else:
        print(f'PASS {name} ({len(got_rows)} rows)')
        n_pass += 1

print(f'\n{n_pass} pass / {n_fail} fail'
      + (f' / {n_skip} skipped-or-timeout' if n_skip else ''))
if timeouts:
    print('oracle timeouts:', ' '.join(timeouts))
if fails:
    print('failed:', ' '.join(fails))
    sys.exit(1)
