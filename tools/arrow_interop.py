#!/usr/bin/env python3
"""Writer-direction Arrow interop probe (driver-side tooling): validate a
graft-written `save_to_disk`-layout directory with REAL pyarrow — the
same Arrow implementation HF `datasets.load_from_disk` reads with — and
value-compare it against the parquet source it was saved from.

Usage:
  python3 tools/arrow_interop.py <graft_arrow_dir> <source_parquet>

The reader direction is pinned by committed pyarrow-written fixtures
(ArrowDatasetSpec); this probe closes the loop: pyarrow accepts OUR
shards byte-for-byte, so a reference user can `load_from_disk` what the
engine publishes. Run after ArrowDatasetSpec leaves its round-trip dirs
under /tmp, e.g.:
  python3 tools/arrow_interop.py /tmp/graft_arrow_spec_docs \
      /root/testdata/sf0.001/documents.parquet
"""
import json
import os
import sys

import pyarrow.ipc as ipc
import pyarrow.parquet as pq

arrow_dir, src_parquet = sys.argv[1], sys.argv[2]

state = json.load(open(os.path.join(arrow_dir, "state.json")))
files = [e["filename"] for e in state["_data_files"]]
assert files, "empty _data_files"

batches = []
for f in files:
    with ipc.open_stream(os.path.join(arrow_dir, f)) as r:
        batches.extend(r)
import pyarrow as pa
got = pa.Table.from_batches(batches).sort_by("doc_id").to_pylist()
want = pq.read_table(src_parquet).sort_by("doc_id").to_pylist()

assert len(got) == len(want), (len(got), len(want))
mismatch = sum(1 for g, w in zip(got, want) if g != w)
info = json.load(open(os.path.join(arrow_dir, "dataset_info.json")))
print(json.dumps({
    "metric": "arrow_interop",
    "shards": len(files),
    "rows": len(got),
    "mismatched_rows": mismatch,
    "features": info["features"],
    "pyarrow": pa.__version__,
    "ok": mismatch == 0,
}))
assert mismatch == 0
