#!/usr/bin/env python3
"""Stage the SALTED dedup/similarity rehearsal: N copies of sf0.1's
documents + embeddings, each copy PERTURBED so the corpus-wide
duplicate rate stays the BASE corpus's rate as N grows — the layout
the round-13 verdict asked for (task 4), replacing the verbatim xN
copies whose 1000-way exact duplicates made candidate pairs N^2 by
construction (a layout artifact, not an engine property).

- documents: every token in copy i is suffixed with a per-copy tag —
  a BIJECTIVE token renaming, so each copy's shingle/Jaccard/minhash
  structure is exactly isomorphic to the base corpus's (within-copy
  near-dup rate preserved), while cross-copy shingle overlap is ZERO
  (no cross-copy candidates). doc_id offsets per copy; n_chars is
  recomputed (the salt lengthens tokens).
- embeddings: copy i applies a per-copy random PERMUTATION of the
  embedding dimensions — an isometry, so all within-copy inner
  products / cosines (the near-dup and top-k structure) are exactly
  preserved, while a vector and its cross-copy twin land in different
  LSH buckets / IVF cells like unrelated points. vec_id offsets per
  copy; labels carried.

Other tables are staged 1x verbatim (the target rows read only
documents/embeddings; the 1x copies keep Bench's warmup happy).

Usage: python3 scripts/stage_salted_rehearsal.py <mult> <outdir>
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

mult, out = int(sys.argv[1]), sys.argv[2]
src = "/root/testdata/sf0.1"

docs = pq.read_table(f"{src}/documents.parquet")
n_docs = pc.max(docs["doc_id"]).as_py() + 1
dd = f"{out}/documents.parquet"
os.makedirs(dd, exist_ok=True)
for i in range(mult):
    salted = pc.replace_substring_regex(
        docs["text"], pattern=r"(\S+)", replacement=rf"\1q{i:03x}")
    t = docs.set_column(docs.schema.get_field_index("doc_id"), "doc_id",
                        pc.add(docs["doc_id"], i * n_docs))
    t = t.set_column(t.schema.get_field_index("text"), "text", salted)
    t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                     pc.cast(pc.utf8_length(salted), pa.int64()))
    pq.write_table(t, f"{dd}/part-{i:03d}.parquet")

emb = pq.read_table(f"{src}/embeddings.parquet")
n_vec = pc.max(emb["vec_id"]).as_py() + 1
mat = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
dim = mat.shape[1]
ed = f"{out}/embeddings.parquet"
os.makedirs(ed, exist_ok=True)
for i in range(mult):
    perm = np.random.RandomState(i).permutation(dim)
    t = pa.table({
        "vec_id": pc.add(emb["vec_id"], i * n_vec),
        "embedding": pa.array(list(mat[:, perm]),
                              type=pa.list_(pa.float32())),
        "label": emb["label"],
    })
    pq.write_table(t, f"{ed}/part-{i:03d}.parquet")

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events"]:
    d = f"{out}/{t}.parquet"
    os.makedirs(d, exist_ok=True)
    p = f"{d}/part-000.parquet"
    if not os.path.exists(p):
        shutil.copy(f"{src}/{t}.parquet", p)

print(f"staged {mult}x salted documents ({mult * docs.num_rows} rows) "
      f"and embeddings ({mult * emb.num_rows} rows, dim {dim}) at {out}")
