"""M0: 2-bit packing, FASTQ/FASTA IO, simulator round-trips."""

import numpy as np
import pytest

from hga_tpu.io import encode as E
from hga_tpu.io import fastq as FQ
from hga_tpu.utils import sim


def test_encode_decode_roundtrip():
    s = "ACGTACGTTTGGCCAA"
    codes, bad = E.encode_bases(s)
    assert bad.sum() == 0
    assert E.decode_bases(codes) == s


def test_encode_ambiguous():
    codes, bad = E.encode_bases("ACGNNT")
    assert list(bad) == [0, 0, 0, 1, 1, 0]
    assert list(codes[:3]) == [0, 1, 2]


def test_revcomp():
    assert E.revcomp_str("ACGT") == "ACGT"
    assert E.revcomp_str("AACG") == "CGTT"
    assert E.revcomp_str("GGGTA") == "TACCC"


def test_pack_unpack_roundtrip(rng):
    seqs = []
    for _ in range(50):
        L = int(rng.integers(1, 300))
        seqs.append("".join(rng.choice(list("ACGT"), size=L)))
    pr = E.pack_reads(seqs, pad_len=304)
    assert pr.packed.shape == (50, 19)
    for i, s in enumerate(seqs):
        assert E.unpack_read(pr, i) == s


def test_pack_reads_n_flag():
    pr = E.pack_reads(["ACGTNACGT" * 5])
    badbits = E.unpack_bad(pr.bad)[0][: int(pr.length[0])]
    expected = np.tile([0, 0, 0, 0, 1, 0, 0, 0, 0], 5)
    np.testing.assert_array_equal(badbits, expected)


def test_unpack_codes_matches_encode(rng):
    s = "".join(rng.choice(list("ACGT"), size=77))
    pr = E.pack_reads([s])
    codes = E.unpack_codes(pr.packed)[0][:77]
    exp, _ = E.encode_bases(s)
    np.testing.assert_array_equal(codes, exp)


def test_fastq_fasta_roundtrip(tmp_path):
    fa = tmp_path / "x.fasta"
    FQ.write_fasta(str(fa), [("c1", "ACGT" * 30), ("c2 desc", "TTTT")], width=17)
    recs = list(FQ.iter_records(str(fa), category=1))
    assert [r.name for r in recs] == ["c1", "c2 desc".split()[0] or "c2"]
    assert recs[0].seq == "ACGT" * 30
    assert recs[1].seq == "TTTT"
    assert all(r.category == 1 for r in recs)

    fq = tmp_path / "y.fastq"
    FQ.write_fastq(str(fq), [("r1", "ACGTA", "IIIII"), ("r2", "GG", "!!")])
    recs = list(FQ.iter_records(str(fq)))
    assert [(r.name, r.seq, r.quality) for r in recs] == [
        ("r1", "ACGTA", "IIIII"),
        ("r2", "GG", "!!"),
    ]


def test_multi_file_categories(tmp_path):
    f1 = tmp_path / "short.fasta"
    f2 = tmp_path / "long.fasta"
    FQ.write_fasta(str(f1), [("s1", "ACGT")])
    FQ.write_fasta(str(f2), [("l1", "GGCC")])
    recs = list(FQ.read_sequence_files([str(f1), str(f2)]))
    assert [r.category for r in recs] == [0, 1]


def test_simulator_deterministic():
    d1 = sim.make_dataset(genome_len=2000, short_cov=5, long_cov=3, seed=7)
    d2 = sim.make_dataset(genome_len=2000, short_cov=5, long_cov=3, seed=7)
    assert d1.genome == d2.genome
    assert d1.short_seqs == d2.short_seqs
    assert d1.long_seqs == d2.long_seqs
    assert len(d1.genome) == 2000
    assert all(set(s) <= set("ACGT") for s in d1.short_seqs)


def test_simulated_reads_come_from_genome():
    d = sim.make_dataset(genome_len=5000, short_cov=3, long_cov=0.5, seed=3,
                         short_err=0.0)
    g2 = d.genome
    for s in d.short_seqs[:20]:
        assert s in g2 or E.revcomp_str(s) in g2
