#!/usr/bin/env python
"""SECOND independent oracle (VERDICT r4 item 6).

No external validator binary (jellyfish/bcftools/bedtools) is
installable in this environment — stated in BASELINE.md — so this
module supplies the next-best thing the reference's
`validate_equal: true` pipeline provides: an oracle that shares NO
code or algorithmic structure with either the framework or
tools/make_golden.py.

Different by construction:
  * k-mers: a dict of PYTHON STRING slices (no numpy, no bit packing,
    no vectorized hash during counting); hashes are derived only at
    the very end with per-character Python-int arithmetic.
    (make_golden vectorizes a uint64 shift-or hash; the framework
    runs a device sort/compact pipeline.)
  * SBS96: arithmetic 96-slot binning with integer complement codes
    (3 - code) and (ref_rank*3 + alt_rank)*16 + left*4 + right
    indexing.  (make_golden uses str.translate + label strings.)

The only shared piece is INPUT construction: the simulated reference
is defined as numpy default_rng(0) draws (it defines the dataset, not
the oracle logic), matching tests/test_workloads.py.
"""
import collections
import gzip

_CODE = {"A": 0, "C": 1, "G": 2, "T": 3,
         "a": 0, "c": 1, "g": 2, "t": 3}


def kmer_string_counts(path: str, k: int) -> dict:
    """Count k-mers as raw strings with a plain dict."""
    text = gzip.open(path, "rb").read().decode("ascii")
    counts = collections.defaultdict(int)
    lines = text.split("\n")
    for i in range(1, len(lines) - 2, 4):
        seq = lines[i]
        for j in range(len(seq) - k + 1):
            counts[seq[j: j + k]] += 1
    return dict(counts)


def kmer_hash(s: str) -> int:
    """Little-endian base-4 hash (reference semantics: digit j shifted
    by 2j), computed with Python ints one character at a time."""
    h = 0
    for j, ch in enumerate(s):
        h += _CODE[ch] << (2 * j)
    return h


def kmer_hash_table(path: str, k: int) -> dict:
    """{hash: count} from the string counts."""
    return {kmer_hash(s): c
            for s, c in kmer_string_counts(path, k).items()}


def sbs96_arithmetic(vcf_path: str, ref_codes: dict) -> list:
    """96-vector via integer binning.

    `ref_codes` maps chromosome name -> per-position integer codes
    (any indexable of ints 0..3).  Bin index:
    (ref_rank * 3 + alt_rank) * 16 + left * 4 + right, where ref_rank
    is 0 for C / 1 for T after pyrimidine strand-collapse
    (complement code = 3 - code, flanks swapped), and alt_rank ranks
    the alt among the three non-ref codes in ACGT order.
    """
    bins = [0] * 96
    for line in gzip.open(vcf_path, "rt"):
        if line.startswith("#"):
            continue
        f = line.split("\t", 5)
        if len(f[3]) != 1 or len(f[4]) != 1:
            continue
        if f[3] not in _CODE or f[4] not in _CODE:
            continue
        codes = ref_codes[f[0]]
        pos = int(f[1]) - 1
        if pos < 1 or pos + 1 >= len(codes):
            continue
        left, mid, right = (int(codes[pos - 1]), int(codes[pos]),
                            int(codes[pos + 1]))
        alt = _CODE[f[4]]
        if mid in (0, 2):  # purine ref: collapse to the pyrimidine strand
            left, mid, right = 3 - right, 3 - mid, 3 - left
            alt = 3 - alt
        ref_rank = 0 if mid == 1 else 1  # C or T
        alt_rank = sum(1 for c in range(4) if c != mid and c < alt)
        bins[(ref_rank * 3 + alt_rank) * 16 + left * 4 + right] += 1
    return bins


def sbs96_label(b: int) -> str:
    """COSMIC label of bin b under the same indexing."""
    alpha = "ACGT"
    sub, ctx = divmod(b, 16)
    ref_rank, alt_rank = divmod(sub, 3)
    ref = "CT"[ref_rank]
    alts = [a for a in alpha if a != ref]
    return f"{alpha[ctx // 4]}[{ref}>{alts[alt_rank]}]{alpha[ctx % 4]}"
