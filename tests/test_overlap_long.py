"""Anchor-chained segment-DP long-read overlaps (component C8 + long L3).

The key property the round-1 single-diagonal band could NOT deliver: noisy
multi-kb reads whose indel drift exceeds the band still produce overlaps,
because each SEG bucket re-anchors the local diagonal.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io.encode import pack_reads
from hga_tpu.models.overlap_long import compute_overlaps_long
from hga_tpu.utils import sim


def _truth(names):
    out = []
    for n in names:
        _, i, s, strand, L = n.split("_")
        out.append((int(s), int(strand)))
    return out


@pytest.fixture(scope="module")
def long_reads():
    genome = sim.random_genome(30_000, seed=21)
    seqs, names = sim.simulate_long_reads(
        genome, coverage=6, mean_len=6000, min_len=3000,
        error_rate=0.04, seed=22)
    pad = ((max(len(s) for s in seqs) + 15) // 16) * 16
    pr = pack_reads(seqs, names=names, pad_len=pad)
    return genome, pr, names, seqs


def test_long_overlaps_found_with_drift(long_reads):
    genome, pr, names, seqs = long_reads
    cfg = AssemblerConfig(k=15, w=8, min_shared_minimizers=4,
                          min_overlap_len=500, min_identity=0.80)
    ov = compute_overlaps_long(pr, cfg)
    assert ov.n > 0
    # ground truth: genome intervals per read
    t = _truth(names)
    found = 0
    true_pairs = 0
    ivals = [(s, s + len(seq)) for (s, _), seq in zip(t, seqs)]
    got = {(int(a), int(b)) for a, b in zip(ov.a, ov.b)}
    for i in range(pr.n_reads):
        for j in range(i + 1, pr.n_reads):
            olap = min(ivals[i][1], ivals[j][1]) - max(ivals[i][0], ivals[j][0])
            if olap >= 1500:   # comfortably above min_overlap_len
                true_pairs += 1
                if (i, j) in got:
                    found += 1
    assert true_pairs > 5
    assert found / true_pairs >= 0.9, (found, true_pairs)
    # identity sane: 4% error pairwise -> <= ~8-10% edit rate, >= min_identity
    ident = ov.identity()
    assert (ident >= 0.80).all()
    # 4% per-read error means a 6 kb overlap drifts far beyond band=64:
    # every accepted overlap must span well beyond what one band covers
    assert int((ov.a_end - ov.a_start).max()) > 2000


def test_long_overlap_coords_match_truth(long_reads):
    genome, pr, names, seqs = long_reads
    cfg = AssemblerConfig(k=15, w=8, min_shared_minimizers=4,
                          min_overlap_len=500, min_identity=0.80)
    ov = compute_overlaps_long(pr, cfg)
    t = _truth(names)
    # overlap length implied by genome positions vs reported span: the
    # reported a-span must cover >= 80% of the true overlap
    ok = 0
    for r in range(ov.n):
        i, j = int(ov.a[r]), int(ov.b[r])
        gi = (t[i][0], t[i][0] + len(seqs[i]))
        gj = (t[j][0], t[j][0] + len(seqs[j]))
        true_olap = min(gi[1], gj[1]) - max(gi[0], gj[0])
        span = int(ov.a_end[r] - ov.a_start[r])
        if true_olap > 0 and span >= 0.8 * true_olap * (1 - 0.1):
            ok += 1
    assert ok / max(ov.n, 1) >= 0.9


def test_sparse_spurious_chain_rejected():
    """Two UNRELATED reads sharing only two short planted blocks on a
    consistent diagonal must NOT overlap: the anchor gap between the blocks
    is unrelated sequence, and the segment DP must align and charge ALL of
    it (the round-3 engine clamped oversized inner segments to 414 bases,
    under-charging the gap and fabricating 15k overlaps at judged scale —
    the 32-contig fragmentation root cause)."""
    rng = np.random.default_rng(77)
    A = rng.integers(0, 4, 5000)
    B = rng.integers(0, 4, 5000)
    # plant two 40-base shared blocks ~3 kb apart at a consistent diagonal
    B[600:640] = A[500:540]
    B[3600:3640] = A[3500:3540]
    from hga_tpu.io.encode import decode_bases

    seqs = [decode_bases(A.astype(np.uint8)), decode_bases(B.astype(np.uint8))]
    pr = pack_reads(seqs, names=["a", "b"], pad_len=5008)
    cfg = AssemblerConfig(k=15, w=4, min_shared_minimizers=2,
                          min_overlap_len=500, min_identity=0.75)
    ov = compute_overlaps_long(pr, cfg)
    assert ov.n == 0, (ov.n, ov.identity(), ov.a_start, ov.a_end)


def test_true_overlap_with_anchor_desert_survives():
    """A genuine dovetail whose anchors exist only near the shared-block
    ends (minimizers masked in the middle by max_seed_freq) must still be
    found at full span: the split sub-segments align the desert exactly."""
    rng = np.random.default_rng(78)
    core = rng.integers(0, 4, 6000)
    A = np.concatenate([rng.integers(0, 4, 1000), core])
    B = np.concatenate([core, rng.integers(0, 4, 1000)])
    from hga_tpu.io.encode import decode_bases

    seqs = [decode_bases(A.astype(np.uint8)), decode_bases(B.astype(np.uint8))]
    pr = pack_reads(seqs, names=["a", "b"], pad_len=7008)
    cfg = AssemblerConfig(k=15, w=4, min_shared_minimizers=2,
                          min_overlap_len=2000, min_identity=0.90)
    ov = compute_overlaps_long(pr, cfg)
    assert ov.n == 1
    assert int(ov.a_start[0]) <= 1050 and int(ov.a_end[0]) >= 6950
    assert float(ov.identity()[0]) >= 0.99


def test_outlier_anchor_does_not_inflate_span():
    """A true ~6 kb dovetail plus ONE spurious shared block far outside the
    overlap (a k-mer collision) must not let the chain follow the outlier:
    the reported span stays the true overlap, so the longer read is never
    misclassified as contained (the judged-scale contig-break cause)."""
    rng = np.random.default_rng(91)
    g = rng.integers(0, 4, 26_000)
    A = g[:20_000].copy()          # read a: genome prefix (20 kb)
    B = g[14_000:26_000].copy()    # read b: 6 kb true dovetail with a
    # spurious shared 40-mer: copy a block from a's START into b's END —
    # far off the true diagonal (true diag ~ +14000; outlier ~ -9500)
    B[11_500:11_540] = A[2_000:2_040]
    from hga_tpu.io.encode import decode_bases

    seqs = [decode_bases(A.astype(np.uint8)), decode_bases(B.astype(np.uint8))]
    pr = pack_reads(seqs, names=["a", "b"], pad_len=20_000)
    cfg = AssemblerConfig(k=15, w=4, min_shared_minimizers=2,
                          min_overlap_len=500, min_identity=0.75)
    ov = compute_overlaps_long(pr, cfg)
    assert ov.n == 1
    span = int(ov.a_end[0] - ov.a_start[0])
    assert 5_500 <= span <= 6_500, (span, np.asarray(ov.a_start),
                                    np.asarray(ov.a_end))
    assert float(ov.identity()[0]) >= 0.99
    # and the resulting graph keeps both reads (no false containment)
    from hga_tpu.models.assembly import build_string_graph

    gph = build_string_graph(ov, 2, cfg)
    assert not gph.contained.any()


def test_device_prep_matches_host_prep(long_reads):
    """On-device segment-window gather (_seg_prep_fn) produces BYTE-
    identical overlap records to the host materialization it replaced."""
    import dataclasses

    from hga_tpu.models import overlap_long as OL

    genome, pr, names, seqs = long_reads
    cfg = AssemblerConfig(k=15, w=8, min_shared_minimizers=3,
                          min_overlap_len=500, min_identity=0.8)
    ov_dev = compute_overlaps_long(pr, cfg)
    assert OL.LAST_TIMINGS.get("dev_prep") is True
    OL._FORCE_HOST_PREP = True
    try:
        ov_host = compute_overlaps_long(pr, cfg)
    finally:
        OL._FORCE_HOST_PREP = False
    assert OL.LAST_TIMINGS.get("dev_prep") is False
    for f in dataclasses.fields(ov_dev):
        np.testing.assert_array_equal(getattr(ov_dev, f.name),
                                      getattr(ov_host, f.name), err_msg=f.name)


def test_overlap_long_publishes_timing_split(long_reads):
    from hga_tpu.models import overlap_long as OL

    genome, pr, names, seqs = long_reads
    cfg = AssemblerConfig(k=15, w=8, min_shared_minimizers=3,
                          min_overlap_len=500, min_identity=0.8)
    compute_overlaps_long(pr, cfg)
    tm = OL.LAST_TIMINGS
    for key in ("index_s", "anchor_s", "chain_s", "segprep_s", "dp_s",
                "n_anchors", "n_pairs", "n_segments", "bytes_up"):
        assert key in tm, key
    assert tm["n_segments"] > 0 and tm["dp_s"] > 0
