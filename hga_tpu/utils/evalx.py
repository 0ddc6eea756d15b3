"""Assembly evaluation — N50, genome fraction, identity (SURVEY.md C16).

Reference parity: the reference evaluates contigs against the known genome
with Python scripts (identity %, N50, #contigs); same capability here, kept
host-side (offline QA, not judged throughput).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from hga_tpu.io.encode import revcomp_str


def n50(lengths: Sequence[int]) -> int:
    ls = sorted((int(x) for x in lengths), reverse=True)
    total = sum(ls)
    acc = 0
    for l in ls:
        acc += l
        if acc * 2 >= total:
            return l
    return 0


def _kmer_set(seq: str, k: int) -> set:
    return {seq[i : i + k] for i in range(len(seq) - k + 1)}


def evaluate_contigs(contigs: List[Tuple[str, str]], reference: str,
                     k: int = 21) -> Dict[str, float]:
    """Alignment-free evaluation: k-mer precision/recall vs the reference.

    identity  — fraction of contig k-mers present in the reference (strand
                agnostic): measures base accuracy + chimera-freeness.
    genome_fraction — fraction of reference k-mers covered by contigs.
    """
    lengths = [len(s) for _, s in contigs]
    ref_k = _kmer_set(reference, k) | _kmer_set(revcomp_str(reference), k)
    contig_k = set()
    hit = 0
    tot = 0
    for _, s in contigs:
        for i in range(len(s) - k + 1):
            km = s[i : i + k]
            contig_k.add(km)
            tot += 1
            if km in ref_k:
                hit += 1
    ref_only = _kmer_set(reference, k)
    covered = sum(1 for km in ref_only
                  if km in contig_k or revcomp_str(km) in contig_k)
    return dict(
        n_contigs=len(contigs),
        total_len=int(sum(lengths)),
        n50=n50(lengths),
        longest=int(max(lengths) if lengths else 0),
        identity=hit / tot if tot else 0.0,
        genome_fraction=covered / len(ref_only) if ref_only else 0.0,
    )
