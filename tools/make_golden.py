#!/usr/bin/env python
"""Generate tests/golden/ fixtures with INDEPENDENT numpy/pure-python
code (no bionumpy_tpu imports for the computed values) so a bug in a
shared framework layer cannot shift both the test and its oracle
(VERDICT r3 item 6; reference bar: /root/reference/tests/buffers.py
pinned literals + benchmarks/config.yml validate_equal).

Writes:
  kmer_top100.json      top-100 (hash, count) 31-mer pairs, big.fq.gz
  jaccard_two_files.json  ctcf vs znf263 jaccard on chr21-22
  pwm_ma0080_matches.json  (row, pos) matches, first 100 reads, thr 6.0
  sbs96_vector.json     96-vector on 1000Genomes_chr21-22 under the
                        seed-0 simulated reference (the real hg38 is
                        not shipped; the simulated ref is deterministic)
"""
import collections
import gzip
import json
import os

import numpy as np

EX = "/root/reference/example_data"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

CODE = np.full(256, 255, np.uint8)
for i, b in enumerate(b"ACGT"):
    CODE[b] = i
    CODE[ord(chr(b).lower())] = i


def fastq_sequences(path):
    lines = gzip.open(path, "rb").read().split(b"\n")
    return [lines[i + 1] for i in range(0, len(lines) - 3, 4)]


def golden_kmers():
    seqs = fastq_sequences(f"{EX}/big.fq.gz")
    counter = collections.Counter()
    for seq in seqs:
        codes = CODE[np.frombuffer(seq, np.uint8)].astype(np.uint64)
        assert codes.max() < 4, "non-ACGT base in big.fq.gz"
        h = np.zeros(max(len(codes) - 30, 0), np.uint64)
        for j in range(31):
            h |= codes[j: j + len(h)] << np.uint64(2 * j)
        counter.update(h.tolist())
    top = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    return {"k": 31, "file": "big.fq.gz",
            "n_total": sum(counter.values()),
            "n_distinct": len(counter),
            "top100": [[int(h), int(c)] for h, c in top]}


def read_bed(path, chroms):
    rows = collections.defaultdict(list)
    opener = gzip.open if path.endswith(".gz") else open
    for line in opener(path, "rt"):
        parts = line.split("\t")
        if parts[0] in chroms:
            rows[parts[0]].append((int(parts[1]), int(parts[2])))
    return rows


def golden_jaccard():
    chroms = {"chr21": 46709983, "chr22": 50818468}
    a = read_bed(f"{EX}/ctcf_chr21-22.bed.gz", chroms)
    b = read_bed(f"{EX}/znf263.bed.gz", chroms)
    inter = union = 0
    for name, size in chroms.items():
        masks = []
        for rows in (a, b):
            m = np.zeros(size, bool)
            for s, e in rows[name]:
                m[s:e] = True
            masks.append(m)
        inter += int((masks[0] & masks[1]).sum())
        union += int((masks[0] | masks[1]).sum())
    return {"files": ["ctcf_chr21-22.bed.gz", "znf263.bed.gz"],
            "chromosomes": chroms, "intersection_bp": inter,
            "union_bp": union, "jaccard": inter / union}


def golden_pwm():
    counts = {}
    for line in open(f"{EX}/MA0080.1.jaspar"):
        if line.startswith(">"):
            continue
        base, rest = line.split("[")
        counts[base.strip()] = [float(x) for x in
                                rest.split("]")[0].split()]
    # log-likelihood vs a uniform background, the JASPAR->PWM semantics
    # of the reference (bionumpy/sequence/position_weight_matrix.py
    # from_dict: log(values) - log(background))
    matrix = np.log(np.array([counts[b] for b in "ACGT"])) - np.log(0.25)
    w = matrix.shape[1]
    threshold = 6.0
    matches = []
    for row, seq in enumerate(fastq_sequences(f"{EX}/big.fq.gz")[:100]):
        codes = CODE[np.frombuffer(seq, np.uint8)]
        for i in range(len(codes) - w + 1):
            score = matrix[codes[i: i + w], np.arange(w)].sum()
            if score > threshold:
                matches.append([row, i])
    return {"motif": "MA0080.1", "threshold": threshold,
            "n_reads": 100, "matches": matches}


def golden_sbs96():
    # parse the VCF with plain python
    chrom_l, pos_l, ref_l, alt_l = [], [], [], []
    for line in gzip.open(f"{EX}/1000Genomes_chr21-22.vcf.gz", "rt"):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        if len(f[3]) == 1 and len(f[4]) == 1:
            chrom_l.append(f[0])
            pos_l.append(int(f[1]) - 1)  # VCF is 1-based
            ref_l.append(f[3])
            alt_l.append(f[4])
    # deterministic simulated reference consistent with the SNP refs
    # (matches tests/test_workloads.py's construction, seed 0)
    rng = np.random.default_rng(0)
    max_pos = max(pos_l) + 10
    alphabet = "ACGT"
    names = sorted(set(chrom_l))
    chrom_arr = np.array(chrom_l)
    pos_arr = np.array(pos_l)
    ref_codes_all = CODE[np.frombuffer("".join(ref_l).encode(), np.uint8)]
    ref = {}
    for name in names:
        seq = rng.integers(0, 4, max_pos).astype(np.uint8)
        mask = chrom_arr == name
        seq[pos_arr[mask]] = ref_codes_all[mask]
        ref[name] = "".join(alphabet[c] for c in seq)
    comp = str.maketrans("ACGT", "TGCA")
    counter = collections.Counter()
    for name, pos, alt in zip(chrom_l, pos_l, alt_l):
        context = ref[name][pos - 1: pos + 2]
        if len(context) < 3 or "N" in context:
            continue
        if context[1] not in "CT":
            context = context.translate(comp)[::-1]
            alt = alt.translate(comp)
        counter[f"{context[0]}[{context[1]}>{alt}]{context[2]}"] += 1
    # canonical COSMIC label order: ref C then T, alts in ACGT order,
    # flanks in ACGT order
    labels = [f"{l}[{r}>{a}]{s}"
              for r in "CT" for a in "ACGT" if a != r
              for l in "ACGT" for s in "ACGT"]
    assert len(labels) == 96
    return {"file": "1000Genomes_chr21-22.vcf.gz", "rng_seed": 0,
            "n_snps": len(pos_l), "labels": labels,
            "counts": [counter[label] for label in labels]}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, fn in [("kmer_top100", golden_kmers),
                     ("jaccard_two_files", golden_jaccard),
                     ("pwm_ma0080_matches", golden_pwm),
                     ("sbs96_vector", golden_sbs96)]:
        payload = fn()
        path = os.path.join(OUT, f"{name}.json")
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
