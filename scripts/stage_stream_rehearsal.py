#!/usr/bin/env python3
"""Stage the KEY-GROWTH streaming rehearsal input: N copies of
sf0.1's events table with event_id/user_id OFFSET per copy, so
id-keyed streaming state (dedup keys, open sessions, join buffers)
actually grows N-fold. The verbatim file-replicating layout used by
the batch rehearsal grows VOLUME only — replicated ids collapse back
to 1x cardinality inside dropDuplicates/session state, which is
exactly the dimension a state-store rehearsal must exercise.
Timestamps are left untouched: the event-time span and watermark
horizon stay realistic; only key cardinality scales.

Usage: python3 scripts/stage_stream_rehearsal.py <mult> <outdir>
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

mult, out = int(sys.argv[1]), sys.argv[2]
src = "/root/testdata/sf0.1/events.parquet"
t = pq.read_table(src)
n_event = pa.compute.max(t["event_id"]).as_py() + 1
n_user = pa.compute.max(t["user_id"]).as_py() + 1

import os
d = f"{out}/events.parquet"
os.makedirs(d, exist_ok=True)
for i in range(mult):
    shifted = t.set_column(
        t.schema.get_field_index("event_id"), "event_id",
        pa.compute.add(t["event_id"], i * n_event))
    shifted = shifted.set_column(
        shifted.schema.get_field_index("user_id"), "user_id",
        pa.compute.add(shifted["user_id"], i * n_user))
    pq.write_table(shifted, f"{d}/part-{i:03d}.parquet")
print(f"staged {mult}x events with id offsets at {d}: "
      f"{mult * t.num_rows} rows, {mult * n_user} users")
