"""ChIP-seq fragment/read simulation from PWM probabilities (reference:
bionumpy/simulate/chipseq.py:28-73)."""
from __future__ import annotations

import dataclasses

import numpy as np
from numpy.random import default_rng

from ..datatypes import Bed6, Interval
from ..encoded_array import EncodedArray
from ..encodings import StrandEncoding
from ..encodings.alphabet_encoding import AlphabetEncoding
from ..sequence.position_weight_matrix import get_motif_scores
from ..streams import streamable
from ..string_array import as_string_array

rng = default_rng()


@dataclasses.dataclass
class ChipSeqSimulationSettings:
    motif: object
    fragment_length: int = 200
    read_length: int = 100
    coverage: int = 10


def simulate_sequence(alphabet, length):
    numbers = rng.choice(np.arange(len(alphabet)), size=length)
    return EncodedArray(numbers.astype(np.uint8),
                        AlphabetEncoding(alphabet))


@streamable()
def simulate_chip_seq_fragments(reference_sequence, motif,
                                n_fragments: int = 1000,
                                fragment_size: int = 100) -> Interval:
    log_prob = np.asarray(get_motif_scores(reference_sequence, motif))
    prob = np.exp(log_prob)
    prob /= prob.sum()
    points = rng.choice(np.arange(prob.size), size=n_fragments,
                        replace=True, p=prob)
    left_extend = rng.poisson(fragment_size // 2, size=points.size)
    right_extend = rng.poisson(fragment_size // 2, size=points.size)
    start = np.maximum(points - left_extend, 0)
    stop = np.minimum(points + right_extend + 1, log_prob.size)
    return Interval(["."] * len(start), start, stop)


@streamable()
def simulate_read_fragments(fragments: Interval,
                            read_length: int) -> Bed6:
    strands = EncodedArray(
        rng.choice([0, 1], replace=True,
                   size=len(fragments)).astype(np.uint8), StrandEncoding)
    frag_starts = np.asarray(fragments.start)
    frag_stops = np.asarray(fragments.stop)
    is_plus = np.asarray(strands == "+")
    starts = np.where(is_plus, frag_starts, frag_stops - read_length)
    stops = np.where(~is_plus, frag_stops, frag_starts + read_length)
    starts = np.maximum(starts, frag_starts)
    stops = np.minimum(stops, frag_stops)
    return Bed6(fragments.chromosome, starts, stops,
                ["."] * len(stops), [0] * len(stops), strands)


@streamable()
def simulate_chip_seq_reads(reference_sequence, settings,
                            sequence_name=None) -> Bed6:
    n_fragments = settings.coverage * len(reference_sequence) // \
        settings.read_length
    fragments = simulate_chip_seq_fragments(
        reference_sequence, settings.motif, n_fragments,
        settings.fragment_length)
    reads = simulate_read_fragments(fragments, settings.read_length)
    if sequence_name is not None:
        reads = dataclasses_replace_chromosome(reads, sequence_name)
    return reads


def dataclasses_replace_chromosome(reads, sequence_name):
    from ..bnpdataclass import replace
    return replace(reads,
                   chromosome=as_string_array(
                       [sequence_name] * len(reads)))
