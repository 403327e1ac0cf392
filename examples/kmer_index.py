"""K-mer lookup index over a custom delimited dataclass
(reference workload: scripts/kmer_index_example.py)."""
import bionumpy_tpu as bnp
from bionumpy_tpu.bnpdataclass import bnpdataclass
from bionumpy_tpu.io.delimited_buffers import DelimitedBuffer
from bionumpy_tpu.sequence.indexing import KmerLookup


@bnpdataclass
class Olga:
    dna: bnp.DNAEncoding
    amino_acid: bnp.AminoAcidEncoding


class OlgaBuffer(DelimitedBuffer):
    dataclass = Olga


def sequences_with_kmer(filename: str, kmer: str):
    data = bnp.open(filename, buffer_type=OlgaBuffer).read()
    lookup = KmerLookup.create_lookup(data.dna, k=len(kmer))
    return lookup.get_sequences(kmer)


if __name__ == "__main__":
    import sys
    print(len(sequences_with_kmer(sys.argv[1], sys.argv[2])))
