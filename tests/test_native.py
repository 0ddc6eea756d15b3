"""Native C++ FASTQ parser/packer == Python reference, bit for bit."""

import gzip
import os

import numpy as np
import pytest

from hga_tpu.io import encode as E
from hga_tpu.io import fastq as FQ
from hga_tpu.io import native as NV


pytestmark = pytest.mark.skipif(not NV.available(),
                                reason="native library unavailable")


def _read_native(path, pad_len, batch=7):
    packed, bad, lengths, names = [], [], [], []
    for p, b, l, n in NV.read_packed_batches(path, pad_len, batch_reads=batch):
        packed.append(p)
        bad.append(b)
        lengths.append(l)
        names.extend(n)
    return (np.concatenate(packed), np.concatenate(bad),
            np.concatenate(lengths), names)


def _assert_matches_python(path, pad_len):
    recs = list(FQ.iter_records(path))
    pr = E.pack_reads([r.seq for r in recs], names=[r.name for r in recs],
                      pad_len=pad_len)
    p, b, l, names = _read_native(path, pad_len)
    np.testing.assert_array_equal(p, pr.packed)
    np.testing.assert_array_equal(b, pr.bad)
    np.testing.assert_array_equal(l, pr.length)
    assert names == pr.names


def test_native_fasta(tmp_path, rng):
    seqs = []
    for _ in range(25):
        L = int(rng.integers(1, 300))
        seqs.append("".join(rng.choice(list("ACGTNacgtn"), size=L)))
    path = str(tmp_path / "x.fasta")
    FQ.write_fasta(path, [(f"r{i} extra descr", s) for i, s in enumerate(seqs)],
                   width=60)
    _assert_matches_python(path, pad_len=304)


def test_native_fastq(tmp_path, rng):
    seqs = ["".join(rng.choice(list("ACGTN"), size=int(rng.integers(10, 200))))
            for _ in range(33)]
    path = str(tmp_path / "x.fastq")
    FQ.write_fastq(path, [(f"q{i}", s, "I" * len(s))
                          for i, s in enumerate(seqs)])
    _assert_matches_python(path, pad_len=208)


def test_native_gzip(tmp_path, rng):
    seqs = ["".join(rng.choice(list("ACGT"), size=50)) for _ in range(10)]
    raw = "".join(f">g{i}\n{s}\n" for i, s in enumerate(seqs))
    path = str(tmp_path / "x.fasta.gz")
    with gzip.open(path, "wt") as fh:
        fh.write(raw)
    _assert_matches_python(path, pad_len=64)


def test_native_truncation(tmp_path):
    path = str(tmp_path / "t.fasta")
    FQ.write_fasta(path, [("long", "ACGT" * 50)])  # 200bp, pad 64
    p, b, l, names = _read_native(path, pad_len=64)
    assert l[0] == 64
    pr = E.pack_reads(["ACGT" * 50], pad_len=64)
    np.testing.assert_array_equal(p, pr.packed)
