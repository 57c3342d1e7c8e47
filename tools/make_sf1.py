#!/usr/bin/env python3
"""Build a synthetic sf1 (10x sf0.1) at /tmp/sf1 for the SCALING-EXPONENT
check (VERDICT r5 #4) — driver-side tooling only, never a library input.

Method: 10 disjoint key universes. Star-schema tables and events replicate
with all primary AND foreign keys shifted by copy*OFFSET (every join stays
within its universe, so per-universe cardinalities are exactly sf0.1's and
total work is 10x). region/nation stay as-is (shared dims, 25 rows).

documents/embeddings are deliberately NOT replicated (copied through
unchanged): textual/vector replication manufactures cross-copy
near-duplicates, which turns every LSH/minhash/k-means-cell bucket into a
10x-duplicate pile and inflates pair joins ~quadratically — the exponent
would measure the synthetic artifact, not the operator. Content-family
exponents come from the real sf0.01 -> sf0.1 decade instead
(tools/scaling_report.py labels the source decade per family).
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os, shutil

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 100_000_000  # > any key in sf0.1 by 100x

SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY_THROUGH = ["region", "nation", "documents", "embeddings"]

os.makedirs(DST, exist_ok=True)
for t in COPY_THROUGH:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(f"{t}: copied through")

for t, keys in SHIFT.items():
    base = pq.read_table(f"{SRC}/{t}.parquet")
    parts = []
    for k in range(COPIES):
        tb = base
        for col in keys:
            i = tb.schema.get_field_index(col)
            tb = tb.set_column(i, tb.schema.field(i),
                               pc.add(tb.column(i), pa.scalar(k * OFF, pa.int64())))
        parts.append(tb)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{t}.parquet")
    print(f"{t}: {base.num_rows} -> {out.num_rows}")
