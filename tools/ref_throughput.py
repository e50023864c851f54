#!/usr/bin/env python3
"""Throughput comparison: the reference's own per-row operator loop
(pandas progress_apply shape, single-threaded — pipeline.py:45-67) vs this
engine, over the same documents corpus.

Runs the reference's pure functions (imported from /root/reference where
dependency-free; the pandas apply mirrors Pipeline.run) on sf0.1 documents
and prints per-operator wall seconds. Spark-side numbers come from
`graft.Bench` (same corpus, same semantics, plus an ORDER BY the reference
doesn't do).

Usage: python3 tools/ref_throughput.py [sfdir]
"""
import re
import sys
import time
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

sys.path.insert(0, "/root/reference")
# cleaners.py imports ftfy (not installed, no network) — stub it so the
# module loads; fix_utf8_encoding is excluded from the comparison.
import types

sys.modules.setdefault("ftfy", types.ModuleType("ftfy"))
from chat_data_pipeline import cleaners as ref_cleaners  # noqa: E402


# filters.py imports utils -> datasets (unavailable); reproduce the two
# helpers filters depend on (utils.py:304-339) and load filters via exec.
def get_words(text):
    return re.findall(r"\w+", text.lower())


def get_char_repetition_ratio(doc, char_rep_len):
    grams = [doc[i:i + char_rep_len]
             for i in range(len(doc) - char_rep_len + 1)]
    freq = Counter(grams)
    if not freq:
        return 0
    vals = sorted(freq.values(), reverse=True)
    ones = len([v for v in vals if v == 1])
    import numpy as np
    k = min(int(np.sqrt(len(vals))), len(vals) - ones)
    return sum(vals[:k]) / sum(vals)


fake_utils = types.ModuleType("chat_data_pipeline.utils")
fake_utils.get_words = get_words
fake_utils.get_char_repetition_ratio = get_char_repetition_ratio
sys.modules["chat_data_pipeline.utils"] = fake_utils
import importlib  # noqa: E402

ref_filters = importlib.import_module("chat_data_pipeline.filters")


def r5_prepare(conv):
    """The reference's prepare_dataset map_func body
    (minhash_deduplication.py:197-204)."""
    text = ""
    for message in conv:
        if message["do_train"]:
            text += message["content"] + "\n\n"
    return text.strip()


def main():
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    texts = df["text"]
    n = len(texts)
    # derived inputs, identical constructions to graft.Throughput:
    # split-token documents for f6/f8 (first half + token + second half),
    # a 3-message conversation (2 trained) for r5
    trunc = texts.map(
        lambda t: t[:len(t) // 2] + "<|truncation_splitter|>"
        + t[len(t) // 2:])
    gender = texts.map(
        lambda t: t[:len(t) // 2] + "<|gender_splitter|>" + t[len(t) // 2:])
    conv = texts.map(lambda t: [
        {"content": t, "do_train": True, "role": "User"},
        {"content": t, "do_train": False, "role": "Assistant"},
        {"content": t, "do_train": True, "role": "Assistant"}])
    ops = {
        # c1_fix_utf8: NOT measurable here — the reference's
        # fix_utf8_encoding is a direct ftfy.fix_text call
        # (cleaners.py:5-8) and ftfy is not installed in this sandbox
        # (zero egress); graft.Throughput still reports the engine's own
        # c1 rate, ratio column reads n/a.
        "c2_normalize_whitespace":
            (texts, ref_cleaners.normalize_whitespace),
        "c3_normalize_punctuation":
            (texts, ref_cleaners.normalize_punctuation),
        "c4_remove_empty_lines": (texts, ref_cleaners.remove_empty_lines),
        "c5_clean_new_lines": (texts, ref_cleaners.clean_new_lines),
        "f1_check_word_number":
            (texts, lambda t: ref_filters.check_word_number(t)),
        "f3_check_nsfw_words":
            (texts, lambda t: ref_filters.check_nsfw_words(t)),
        "f4_check_lowercase_ratio":
            (texts, lambda t: ref_filters.check_lowercase_ratio(t)),
        "f5_check_char_repetition":
            (texts, lambda t: ref_filters.check_char_repetition(t)),
        "f6_check_truncation":
            (trunc, lambda t: ref_filters.check_truncation(t)),
        "f7_check_completion":
            (texts, lambda t: ref_filters.check_completion(t)),
        "f8_check_gender":
            (gender, lambda t: ref_filters.check_gender(t)),
        "f9_check_empty": (texts, lambda t: ref_filters.check_empty(t)),
        "f10_check_ethics": (texts, lambda t: ref_filters.check_ethics(t)),
        "f11_check_ethics_harsh":
            (texts, lambda t: ref_filters.check_ethics_harsh(t)),
        "r5_dedup_prep": (conv, r5_prepare),
        # html_extract: ours-only (the reference has no HTML extraction)
    }
    print(f"corpus: {n} documents from {SF}")
    print(f"{'operator':34s} {'ref sec':>9s} {'rows/s':>10s}")
    total = 0.0
    for name, (series, fn) in ops.items():
        t0 = time.time()
        series.apply(fn)  # the reference's pandas apply shape
        dt = time.time() - t0
        total += dt
        print(f"{name:34s} {dt:9.2f} {n / dt:10.0f}")
    print(f"{'TOTAL':34s} {total:9.2f}")


if __name__ == "__main__":
    main()
