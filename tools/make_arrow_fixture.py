#!/usr/bin/env python3
"""Generate the committed Arrow IPC ground-truth fixtures for
ArrowDatasetSpec (driver-side tooling, like the DuckDB oracle — NOT part
of the engine). pyarrow is the same Arrow implementation HuggingFace
`datasets` writes its `save_to_disk` shards with, so a fixture written
here pins graft's reader against the reference ecosystem's actual bytes.

Layout produced (mirrors datasets.Dataset.save_to_disk):
  src/test/resources/graft/hf_fixture/
    data-00000-of-00002.arrow   # stream-format IPC, 2 record batches
    data-00001-of-00002.arrow   # stream-format IPC, 1 batch
    state.json                  # shard manifest (HF field set)
    dataset_info.json           # HF Features json
  src/test/resources/graft/hf_fixture_file/
    golden.arrow                # FILE-format IPC (magic "ARROW1") —
                                # exercises the reader's format sniff

Values are mirrored verbatim in ArrowDatasetSpec; change them together.
"""
import json
import os

import pyarrow as pa
import pyarrow.ipc as ipc

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src", "test", "resources", "graft")

msg = pa.struct([("content", pa.string()),
                 ("do_train", pa.bool_()),
                 ("role", pa.string())])
schema = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("score", pa.float64()),
    ("flag", pa.bool_()),
    ("payload", pa.binary()),
    ("embedding", pa.list_(pa.float32())),
    ("conversation", pa.list_(msg)),
    ("label", pa.int32()),
])


def batch(rows):
    cols = list(zip(*rows))
    return pa.record_batch(
        [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
        schema=schema)


B1 = batch([
    (1, "hello world", 1.5, True, b"\x00\x01\xff",
     [1.0, 2.5], [{"content": "hi", "do_train": False, "role": "User"}],
     7),
    (2, "café — naïve \U0001f600", -0.25, False, b"",
     [], [{"content": "ok", "do_train": True, "role": "Assistant"},
          {"content": None, "do_train": None, "role": None}],
     None),
    (3, None, None, None, None, None, None, -1),
])
B2 = batch([
    (4, "tab\there\nnewline", 0.0, True, b"\x7f",
     [3.0], [], 0),
])
B3 = batch([
    (5, "last shard", 2.0 ** 53, False, None,
     [-1.5, 0.0, 9.75], None, 2147483647),
])

fx = os.path.join(OUT, "hf_fixture")
os.makedirs(fx, exist_ok=True)
with ipc.new_stream(os.path.join(fx, "data-00000-of-00002.arrow"),
                    schema) as w:
    w.write_batch(B1)
    w.write_batch(B2)
with ipc.new_stream(os.path.join(fx, "data-00001-of-00002.arrow"),
                    schema) as w:
    w.write_batch(B3)

with open(os.path.join(fx, "state.json"), "w") as f:
    json.dump({
        "_data_files": [{"filename": "data-00000-of-00002.arrow"},
                        {"filename": "data-00001-of-00002.arrow"}],
        "_fingerprint": "fixturefixture00",
        "_format_columns": None,
        "_format_kwargs": {},
        "_format_type": None,
        "_output_all_columns": False,
        "_split": None,
    }, f, indent=2)

with open(os.path.join(fx, "dataset_info.json"), "w") as f:
    json.dump({
        "builder_name": None, "citation": "", "config_name": None,
        "dataset_size": None, "description": "fixture", "homepage": "",
        "license": "",
        "features": {
            "doc_id": {"dtype": "int64", "_type": "Value"},
            "text": {"dtype": "string", "_type": "Value"},
            "score": {"dtype": "float64", "_type": "Value"},
            "flag": {"dtype": "bool", "_type": "Value"},
            "payload": {"dtype": "binary", "_type": "Value"},
            "embedding": {"feature": {"dtype": "float32",
                                      "_type": "Value"},
                          "length": -1, "_type": "Sequence"},
            "conversation": [{"content": {"dtype": "string",
                                          "_type": "Value"},
                              "do_train": {"dtype": "bool",
                                           "_type": "Value"},
                              "role": {"dtype": "string",
                                       "_type": "Value"}}],
            "label": {"dtype": "int32", "_type": "Value"},
        },
    }, f, indent=2)

ff = os.path.join(OUT, "hf_fixture_file")
os.makedirs(ff, exist_ok=True)
with ipc.new_file(os.path.join(ff, "golden.arrow"), schema) as w:
    w.write_batch(B1)

# compressed-batch fixtures (ipc body compression, zstd + lz4): one
# single-batch shard per codec, small schema — exercises the reader's
# CommonsCompressionFactory wiring
zschema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("emb", pa.list_(pa.float32()))])
zb = pa.record_batch(
    [pa.array([1, 2, 3]), pa.array(["a", "b" * 1000, None]),
     pa.array([[1.0, 2.0], [], None], type=pa.list_(pa.float32()))],
    schema=zschema)
zf = os.path.join(OUT, "hf_fixture_zstd")
os.makedirs(zf, exist_ok=True)
for codec in ["zstd", "lz4"]:
    opts = ipc.IpcWriteOptions(compression=codec)
    with ipc.new_stream(os.path.join(zf, f"data-{codec}.arrow"),
                        zschema, options=opts) as w:
        w.write_batch(zb)

# large_* (64-bit offset) types — HF promotes big columns to these
lschema = pa.schema([("doc_id", pa.int64()),
                     ("text", pa.large_string()),
                     ("emb", pa.large_list(pa.float32())),
                     ("payload", pa.large_binary())])
lb = pa.record_batch(
    [pa.array([1, 2]),
     pa.array(["big one", None], type=pa.large_string()),
     pa.array([[0.5, 1.5], None], type=pa.large_list(pa.float32())),
     pa.array([b"\x01\x02", None], type=pa.large_binary())],
    schema=lschema)
lf = os.path.join(OUT, "hf_fixture_large")
os.makedirs(lf, exist_ok=True)
with ipc.new_stream(os.path.join(lf, "data-00000-of-00001.arrow"),
                    lschema) as w:
    w.write_batch(lb)

# DatasetDict layout — datasets.DatasetDict.save_to_disk writes
# dataset_dict.json ({"splits": [...]}) plus one single-split subdir per
# split, each a normal save_to_disk directory. Two splits, same schema.
dschema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])


def split_dir(root, name, rows):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    b = pa.record_batch([pa.array([r[0] for r in rows]),
                         pa.array([r[1] for r in rows])], schema=dschema)
    with ipc.new_stream(os.path.join(d, "data-00000-of-00001.arrow"),
                        dschema) as w:
        w.write_batch(b)
    with open(os.path.join(d, "state.json"), "w") as f:
        json.dump({
            "_data_files": [{"filename": "data-00000-of-00001.arrow"}],
            "_fingerprint": f"dictfixture{name}"[:16],
            "_format_columns": None, "_format_kwargs": {},
            "_format_type": None, "_output_all_columns": False,
            "_split": name,
        }, f, indent=2)
    with open(os.path.join(d, "dataset_info.json"), "w") as f:
        json.dump({
            "builder_name": None, "citation": "", "config_name": None,
            "dataset_size": None, "description": "dict fixture",
            "homepage": "", "license": "",
            "features": {"doc_id": {"dtype": "int64", "_type": "Value"},
                         "text": {"dtype": "string", "_type": "Value"}},
        }, f, indent=2)


df_dir = os.path.join(OUT, "hf_fixture_dict")
os.makedirs(df_dir, exist_ok=True)
split_dir(df_dir, "train", [(1, "train one"), (2, "train two"),
                            (3, "train three")])
split_dir(df_dir, "test", [(10, "test one"), (11, "test two")])
with open(os.path.join(df_dir, "dataset_dict.json"), "w") as f:
    json.dump({"splits": ["train", "test"]}, f)

print("fixtures written under", os.path.abspath(OUT))
