#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle and diff (rows / schema-ish / values).

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]
"""
import duckdb, json, sys, math, glob, os, threading

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
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    # sf1-scale tables are DIRECTORIES of part files (Spark needs >1 file
    # for scan splits); DuckDB needs the glob spelled out in that case
    p = f'{sf}/{t}.parquet'
    if os.path.isdir(p):
        p = f'{p}/*.parquet'
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f'{out}/oracle_sql.json'))

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
