#!/usr/bin/env python3
"""Stage the KEY-OFFSET join rehearsal: N copies of sf0.1's
orders+lineitem with o_orderkey/l_orderkey OFFSET per copy, so the
orders⋈lineitem equi-join stays 1:1 while both sides genuinely grow
N-fold. The verbatim file-replicating layout duplicates ORDER KEYS on
both sides, so every lineitem matches N order copies and the join
inflates N²-fold — a rehearsal artifact no production table has
(orderkey is unique). Foreign keys into the dimension-sized tables
(custkey, suppkey, partkey) are left untouched: dimensions stay 1x,
exactly like a real fact-growth scenario. The other tables are
symlink-free verbatim copies (dims 1x, other facts Nx as in the
volume layout).

Usage: python3 scripts/stage_join_rehearsal.py <mult> <outdir>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

mult, out = int(sys.argv[1]), sys.argv[2]
src = "/root/testdata/sf0.1"

orders = pq.read_table(f"{src}/orders.parquet")
lineitem = pq.read_table(f"{src}/lineitem.parquet")
n_order = pa.compute.max(orders["o_orderkey"]).as_py() + 1

for name, t, keycol in (("orders", orders, "o_orderkey"),
                        ("lineitem", lineitem, "l_orderkey")):
    d = f"{out}/{name}.parquet"
    os.makedirs(d, exist_ok=True)
    for i in range(mult):
        shifted = t.set_column(
            t.schema.get_field_index(keycol), keycol,
            pa.compute.add(t[keycol], i * n_order))
        pq.write_table(shifted, f"{d}/part-{i:03d}.parquet")

for t in ["region", "nation", "customer", "supplier", "part",
          "events", "documents", "embeddings"]:
    d = f"{out}/{t}.parquet"
    os.makedirs(d, exist_ok=True)
    n = mult if t in ("events", "documents", "embeddings") else 1
    for i in range(n):
        p = f"{d}/part-{i:03d}.parquet"
        if not os.path.exists(p):
            shutil.copy(f"{src}/{t}.parquet", p)

print(f"staged {mult}x orders/lineitem with orderkey offsets at {out}: "
      f"{mult * orders.num_rows} orders, {mult * lineitem.num_rows} lineitems")
