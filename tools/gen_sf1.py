#!/usr/bin/env python3
"""Tile sf0.1 10x into an sf1-scale dataset for the scale-stress gate
(VERDICT r8 item 1). Driver-side tooling only — the engine never reads
this script; it just consumes the parquet it writes.

Key design: each fact/entity table is replicated COPIES times with every
key-domain column shifted by copy * STRIDE[domain], so referential
integrity (orders.o_custkey -> customer.c_custkey, lineitem.l_orderkey ->
orders.o_orderkey, ...) holds within each copy and the copies are
disjoint. Dimension tables (region, nation) stay fixed, as in TPC-H.
events also shifts ts by copy * (range + 1h) so the per-event_type
lag() transition graph becomes 10 near-disjoint copies (one boundary
edge per type per copy — negligible), i.e. 10x nodes AND 10x edges.

Usage: python3 tools/gen_sf1.py [out_dir] [copies]
"""
import sys, shutil, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = '/root/testdata/sf0.1'
OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/graft_sf1'
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# key-domain strides: > max key in sf0.1 for that domain, round numbers
STRIDE = {
    'custkey': 1_000_000,
    'suppkey': 1_000_000,
    'partkey': 1_000_000,
    'orderkey': 10_000_000,
    'event_id': 10_000_000,
    'user_id': 1_000_000,
    'doc_id': 1_000_000,
    'vec_id': 1_000_000,
}

# table -> {column: key_domain}
SHIFT = {
    'customer': {'c_custkey': 'custkey'},
    'supplier': {'s_suppkey': 'suppkey'},
    'part': {'p_partkey': 'partkey'},
    'orders': {'o_orderkey': 'orderkey', 'o_custkey': 'custkey'},
    'lineitem': {'l_orderkey': 'orderkey', 'l_partkey': 'partkey',
                 'l_suppkey': 'suppkey'},
    'events': {'event_id': 'event_id', 'user_id': 'user_id'},
    'documents': {'doc_id': 'doc_id'},
    'embeddings': {'vec_id': 'vec_id'},
}

os.makedirs(OUT, exist_ok=True)

for t in ['region', 'nation']:
    shutil.copyfile(f'{SRC}/{t}.parquet', f'{OUT}/{t}.parquet')
    print(t, 'copied (dimension, fixed)')

for t, shifts in SHIFT.items():
    src = pq.read_table(f'{SRC}/{t}.parquet')
    if t == 'events':
        ts = src.column('ts')
        lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
        ts_span_us = int((hi - lo).total_seconds() * 1_000_000) + 3_600_000_000
    pieces = []
    for c in range(COPIES):
        cols = {}
        for name in src.column_names:
            col = src.column(name)
            if name in shifts:
                cols[name] = pc.add(col, c * STRIDE[shifts[name]])
            elif t == 'events' and name == 'ts':
                shifted = pc.add(col.cast(pa.int64()), c * ts_span_us)
                cols[name] = shifted.cast(pa.timestamp('us'))
            else:
                cols[name] = col
        pieces.append(pa.table(cols))
    # One FILE per copy inside a <t>.parquet directory, not one giant
    # file: Spark assigns scan splits per file-offset range of the
    # COMPRESSED bytes, so a heavy-text table like documents (5.8 MB on
    # disk, ~600 MB of rows after decode at 10 copies) written as a
    # single small file becomes ONE scan task and starves local[32] —
    # the r9 sf1 bench measured p7_head_default at 52x instead of ~10x
    # purely from that. Real 100 TB tables are always many files; the
    # multi-file layout is the honest shape, and Spark reads a
    # directory named *.parquet transparently.
    d = f'{OUT}/{t}.parquet'
    if os.path.isfile(d):
        os.remove(d)
    os.makedirs(d, exist_ok=True)
    for c, piece in enumerate(pieces):
        pq.write_table(piece, f'{d}/part-{c:03d}.parquet',
                       row_group_size=250_000)
    print(t, src.num_rows, '->', src.num_rows * COPIES, f'({COPIES} files)')
print('done ->', OUT)
