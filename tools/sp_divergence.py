#!/usr/bin/env python3
"""Compare the engine's SentencePiece segmentations against REAL
sentencepiece on an spm-equipped host (VERDICT r16 #3 — the
ftfy_divergence precedent: measure the divergence, don't assert it).

The sandbox this engine is built in has no sentencepiece wheel and zero
egress, so the pipeline is two-stage:

  1. (in-sandbox) dump every segmentation over the real scoring inputs:
       sbt "runMain graft.scoring.SpDivergence /root/testdata/sf0.1 \
            /tmp/graft_sp_divergence.tsv [pieces-or-.model]"
     This also prints the in-engine greedy-vs-viterbi-vs-bpe rates
     (committed in COVERAGE.md).

  2. (spm host) re-encode the same lines with the real tokenizer:
       python3 tools/sp_divergence.py <model.sp.model> \
            /tmp/graft_sp_divergence.tsv
     Prints, per engine mode, the identical-stream rate and mean
     token-boundary Jaccard vs `encode_as_pieces`.

NOTE on comparability: the engine segments text already cc_net
normalized + whitespace-collapsed (the TSV's `line` column is exactly
that pretreated input), so feed the SAME lines to spm — this isolates
the SEGMENTATION gap from normalization differences. Models trained
with remove_extra_whitespaces=false or exotic normalizer specs will
show extra divergence attributable to normalization, not matching.
"""
import sys


def boundaries(pieces):
    out = set()
    off = 0
    for p in pieces:
        off += len(p)  # python len == codepoints, matching the engine
        out.add(off)
    return out


def jaccard(a, b):
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    try:
        import sentencepiece
    except ImportError:
        print("sentencepiece not installed on this host - run this "
              "stage on an spm-equipped machine (stage 1's in-engine "
              "rates are printed by graft.scoring.SpDivergence)")
        sys.exit(3)
    sp = sentencepiece.SentencePieceProcessor()
    sp.load(sys.argv[1])
    modes = ["greedy", "viterbi", "bpe"]
    same = {m: 0 for m in modes}
    jac = {m: 0.0 for m in modes}
    n = 0
    with open(sys.argv[2], encoding="utf-8") as f:
        header = f.readline().rstrip("\n").split("\t")
        assert header == ["line", "greedy", "viterbi", "bpe"], header
        for row in f:
            cols = row.rstrip("\n").split("\t")
            if len(cols) != 4:
                continue
            line, segs = cols[0], cols[1:]
            ref = sp.encode_as_pieces(line)
            rb = boundaries(ref)
            n += 1
            for m, s in zip(modes, segs):
                pieces = s.split(" ") if s else []
                if pieces == ref:
                    same[m] += 1
                jac[m] += jaccard(boundaries(pieces), rb)
    if n == 0:
        print("empty TSV")
        sys.exit(1)
    for m in modes:
        print(f"{m}: identical={same[m]/n:.4f} "
              f"boundary_jaccard={jac[m]/n:.4f} over {n} lines")


if __name__ == "__main__":
    main()
