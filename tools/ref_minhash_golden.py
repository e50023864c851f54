#!/usr/bin/env python3
"""Derive the reference's kept doc_id set for minhash dedup at sf0.01.

Runs the reference's OWN pure functions (embed_func, optimal_param,
UnionFind from /root/reference/chat_data_pipeline/minhash_deduplication.py)
over /root/testdata/sf0.01/documents.parquet in row order, reproducing the
`deduplicate()` driver (band hash tables -> per-bucket union to min ->
keep rows that are their own cluster root) without the HF `datasets`
dependency. Output is committed as
src/test/resources/minhash_golden_sf001.json and asserted against
graft.dedup.MinHashDedup in ExtrasSpec — converting the flagship's dedup
core from "self-consistent" to "reference-verified".

Stubs (unavailable offline, behavior-preserving):
- scipy.integrate.quad -> composite Simpson (smooth integrand; the
  resulting optimal_param(0.7, 256) = (25, 10) matches datasketch/scipy)
- tqdm -> passthrough
- chat_data_pipeline.pipeline -> bare logger (import side-effect only)

Usage: python3 tools/ref_minhash_golden.py [sfdir] [ngram_size]
"""
import json
import sys
import types
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NGRAM = int(sys.argv[2]) if len(sys.argv) > 2 else 3

sys.path.insert(0, "/root/reference")

# scipy.integrate.quad stub: composite Simpson, n=2000 (integrand is a
# smooth polynomial in s on [0,1]; agrees with scipy to ~1e-10)
def _simpson_quad(f, a, b, n=2000):
    h = (b - a) / n
    s = f(a) + f(b)
    for i in range(1, n):
        s += f(a + i * h) * (4.0 if i % 2 == 1 else 2.0)
    return s * h / 3.0, 0.0

scipy_mod = types.ModuleType("scipy")
scipy_integrate = types.ModuleType("scipy.integrate")
scipy_integrate.quad = _simpson_quad
scipy_mod.integrate = scipy_integrate
sys.modules.setdefault("scipy", scipy_mod)
sys.modules.setdefault("scipy.integrate", scipy_integrate)

tqdm_mod = types.ModuleType("tqdm")
tqdm_mod.tqdm = lambda it, **kw: it
sys.modules.setdefault("tqdm", tqdm_mod)

import logging  # noqa: E402

pipe_mod = types.ModuleType("chat_data_pipeline.pipeline")
pipe_mod.logger = logging.getLogger("ref")
sys.modules["chat_data_pipeline.pipeline"] = pipe_mod

from chat_data_pipeline import minhash_deduplication as md  # noqa: E402


def main():
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    n = len(texts)

    num_perm, threshold = 256, 0.7
    B, R = md.optimal_param(threshold, num_perm)
    assert (B, R) == (25, 10), (B, R)
    hashranges = [(i * R, (i + 1) * R) for i in range(B)]
    # EXACTLY deduplicate()'s permutation construction: module-level
    # RNG = np.random.RandomState(SEED=42), fresh at import
    permutations = np.array(
        [
            (
                md.RNG.randint(1, md.MERSENNE_PRIME, dtype=np.uint64),
                md.RNG.randint(0, md.MERSENNE_PRIME, dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T

    tables = [defaultdict(set) for _ in range(B)]
    for idx, content in enumerate(texts):
        emb = md.embed_func(
            content, idx, num_perm=num_perm, hashranges=hashranges,
            ngram_size=NGRAM, permutations=permutations,
            min_ngram_size=NGRAM)
        for H, table in zip(emb["__signatures__"], tables):
            table[H].add(idx)

    uf = md.UnionFind()
    for table in tables:
        for cluster in table.values():
            if len(cluster) <= 1:
                continue
            mn = min(cluster)
            for x in cluster:
                uf.union(x, mn)

    kept = [doc_ids[i] for i in range(n) if uf.find(i) == i]
    out = {
        "sf_dir": SF,
        "column": "text",
        "ngram_size": NGRAM,
        "min_ngram_size": NGRAM,
        "num_perm": num_perm,
        "threshold": threshold,
        "bands": B,
        "rows": R,
        "input_rows": n,
        "kept_count": len(kept),
        "kept_doc_ids": sorted(kept),
    }
    tag = SF.rstrip("/").rsplit("/", 1)[-1].replace("sf0.", "sf0")
    suffix = "" if NGRAM == 3 else "_n" + str(NGRAM)
    dest = f"src/test/resources/minhash_golden_{tag}{suffix}.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[golden] {n} rows -> kept {len(kept)}; wrote {dest}")


if __name__ == "__main__":
    main()
