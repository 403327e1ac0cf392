"""Strand-filtered transcripts from a GTF annotation
(reference workload: scripts/gtf_example.py)."""
import bionumpy_tpu as bnp


def positive_strand_transcripts(annotation_file: str):
    gtf_entries = bnp.open(annotation_file).read()
    transcripts = gtf_entries.get_transcripts()
    return transcripts[transcripts.strand.ravel() == "+"]


if __name__ == "__main__":
    import sys
    print(positive_strand_transcripts(sys.argv[1]))
