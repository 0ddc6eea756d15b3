"""Stage golden tests against CHECKED-IN fixtures (SURVEY.md §5 item 2).

The fixture is a tiny deterministic error-free read set; each stage's output
must match the committed golden byte-for-byte.  Regenerate goldens only for
intentional behavior changes (tests/fixtures/ are produced by the snippet in
the git history of this file's commit).
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io.encode import pack_reads, revcomp_str
from hga_tpu.io.fastq import iter_records

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

CFG = AssemblerConfig(k=15, w=5, band=32, batch_reads=256,
                      min_shared_minimizers=2, min_overlap_len=30)


@pytest.fixture(scope="module")
def fixture_reads():
    recs = list(iter_records(os.path.join(FIX, "short.fasta")))
    return pack_reads([r.seq for r in recs], names=[r.name for r in recs],
                      pad_len=112)


def test_golden_spectrum(fixture_reads):
    from hga_tpu.models.spectrum import count_reads

    spec = count_reads(fixture_reads, CFG)
    got = "".join(f"{c}\t{int(n)}\n" for c, n in enumerate(spec.hist))
    with open(os.path.join(FIX, "golden_spectrum.tsv")) as fh:
        assert got == fh.read()


def test_golden_overlaps_paf(fixture_reads):
    from hga_tpu.models.overlap import compute_overlaps
    from hga_tpu.models.seeding import find_candidates

    cands = find_candidates(fixture_reads, CFG)
    ov = compute_overlaps(fixture_reads, cands, CFG)
    got = ov.to_paf(fixture_reads.names, fixture_reads.names)
    with open(os.path.join(FIX, "golden_overlaps.paf")) as fh:
        assert got == fh.read()


def test_golden_contigs(fixture_reads):
    from hga_tpu.models.assembly import assemble
    from hga_tpu.models.overlap import compute_overlaps
    from hga_tpu.models.seeding import find_candidates

    cands = find_candidates(fixture_reads, CFG)
    ov = compute_overlaps(fixture_reads, cands, CFG)
    res = assemble(fixture_reads, ov, CFG)
    golden = [(r.name, r.seq)
              for r in iter_records(os.path.join(FIX, "golden_contigs.fasta"))]
    assert [(n, s) for n, s in res.contigs] == golden
    # and the contig is a verbatim slice of the fixture genome
    genome = next(iter_records(os.path.join(FIX, "genome.fasta"))).seq
    c = res.contigs[0][1]
    assert c in genome or revcomp_str(c) in genome
