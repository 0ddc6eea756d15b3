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


def _kmers_u64(seq: str, k: int, canonical: bool) -> np.ndarray:
    """All k-mer values of seq as uint64 (k <= 31), vectorized.

    canonical=True returns min(value, revcomp value) per position; N-bearing
    k-mers are dropped (the set-of-strings predecessor treated them as
    ordinary distinct strings; simulated genomes carry no Ns, so the
    metrics are unchanged where they are used)."""
    from hga_tpu.io.encode import encode_bases
    from hga_tpu.utils.oracle import kmer_values

    codes, bad = encode_bases(seq)
    if canonical:
        canon, _, valid = kmer_values(codes, bad, len(seq), k)
        return canon[valid]
    # forward-only values (same loop shape as the oracle)
    m = max(0, len(seq) - k + 1)
    if m == 0:
        return np.zeros(0, np.uint64)
    c64 = codes.astype(np.uint64)
    fwd = np.zeros(m, np.uint64)
    for t in range(k):
        fwd |= c64[t : t + m] << np.uint64(2 * (k - 1 - t))
    badc = np.concatenate([[0], np.cumsum(bad[: len(seq)], dtype=np.int64)])
    return fwd[(badc[k:] - badc[:-k]) == 0]


def evaluate_contigs(contigs: List[Tuple[str, str]], reference: str,
                     k: int = 21, circular: bool = False) -> Dict[str, float]:
    """Alignment-free evaluation: k-mer precision/recall vs the reference.

    identity  — fraction of contig k-mers present in the reference (strand
                agnostic): measures base accuracy + chimera-freeness.
    genome_fraction — fraction of reference k-mers covered by contigs.

    circular=True treats the reference as a circle: the k-1 origin-spanning
    k-mers join the reference set, so a correctly-assembled circular contig
    (an arbitrary rotation of the reference) scores identity 1.0 instead of
    being docked for the k-mers that cross the reference's linear seam.

    Vectorized over sorted uint64 canonical k-mer arrays (the Python
    set-of-strings version cost minutes of host time at 4.6 Mb).
    """
    if circular and len(reference) > k:
        reference = reference + reference[: k - 1]
    lengths = [len(s) for _, s in contigs]
    ref_canon = np.unique(_kmers_u64(reference, k, canonical=True))
    hit = 0
    tot = 0
    contig_sets = []
    for _, s in contigs:
        ck = _kmers_u64(s, k, canonical=True)
        tot += ck.size
        idx = np.searchsorted(ref_canon, ck)
        idx = np.clip(idx, 0, max(ref_canon.size - 1, 0))
        if ref_canon.size:
            hit += int((ref_canon[idx] == ck).sum())
        contig_sets.append(np.unique(ck))
    contig_canon = (np.unique(np.concatenate(contig_sets)) if contig_sets
                    else np.zeros(0, np.uint64))
    # denominator: distinct FORWARD reference k-mers; one is covered iff its
    # canonical value appears in any contig (strand-agnostic), matching the
    # string-set predecessor's semantics
    ref_fwd = np.unique(_kmers_u64(reference, k, canonical=False))
    mask = np.uint64((1 << (2 * k)) - 1)
    rc = np.zeros_like(ref_fwd)
    v = ref_fwd.copy()
    for t in range(k):
        rc = (rc << np.uint64(2)) | (np.uint64(3) - (v & np.uint64(3)))
        v >>= np.uint64(2)
    ref_fwd_canon = np.minimum(ref_fwd, rc & mask)
    idx = np.searchsorted(contig_canon, ref_fwd_canon)
    idx = np.clip(idx, 0, max(contig_canon.size - 1, 0))
    covered = int((contig_canon[idx] == ref_fwd_canon).sum()) if (
        contig_canon.size) else 0
    return dict(
        n_contigs=len(contigs),
        total_len=int(sum(lengths)),
        n50=n50(lengths),
        longest=int(max(lengths) if lengths else 0),
        identity=hit / tot if tot else 0.0,
        genome_fraction=covered / ref_fwd.size if ref_fwd.size else 0.0,
    )


def exact_contig_match(contigs: List[Tuple[str, str]],
                       ref_contigs: List[Tuple[str, str]]) -> Dict:
    """Byte-for-byte contig-set comparison (the reference-parity harness,
    SURVEY.md §5.3 / §8.1-M6: 'bit-identical contigs').

    Contigs compare as unordered SETS of strand-canonical sequences
    (min(seq, revcomp(seq))) — naming and orientation are presentation;
    the bases are the contract.
    """
    ours = {min(s, revcomp_str(s)) for _, s in contigs}
    theirs = {min(s, revcomp_str(s)) for _, s in ref_contigs}
    return dict(
        exact_match=ours == theirs,
        n_ours=len(ours),
        n_ref=len(theirs),
        matched=len(ours & theirs),
        only_ours=len(ours - theirs),
        only_ref=len(theirs - ours),
    )


def segment_identity(contigs: List[Tuple[str, str]], reference: str,
                     mesh=None, seg: int = 384,
                     batch: int = 4096) -> Dict[str, float]:
    """Placement-free verification: every `seg`-sized contig segment's
    GLOBAL-best semi-global edit distance against the whole reference
    (both strands appended), summed into one identity number.

    Unlike alignment_identity (anchored chaining), nothing is seeded — a
    segment that drifted, collapsed a repeat, or is chimeric still finds
    its best placement anywhere and pays its true edit cost.  The sweep is
    the production edit engine (models/overlap.default_edit): on a mesh
    the reference's columns are CHIP-SHARDED and the recurrence streams
    through the ring sequence-parallel engine (parallel/ring_myers) — the
    SURVEY.md §6 long-context path, per-chip memory Lt/n_dev.
    """
    import jax.numpy as jnp

    from hga_tpu.config import AssemblerConfig
    from hga_tpu.io.encode import encode_bases
    from hga_tpu.models.overlap import SENT_BASE, default_edit

    if not contigs:
        return dict(segment_identity=0.0, n_segments=0)
    ndev = mesh.devices.size if mesh is not None else 1
    # shared target: genome . sentinel . revcomp(genome), sentinel-padded
    # to a multiple of the mesh size (ring chunking requirement)
    g_fwd, _ = encode_bases(reference)
    g_rc = 3 - g_fwd[::-1]
    t_true = len(g_fwd) * 2 + 1
    Lt = ((t_true + ndev - 1) // ndev) * ndev
    t_row = np.full(Lt, SENT_BASE, np.int32)
    t_row[: len(g_fwd)] = g_fwd
    t_row[len(g_fwd) + 1 : t_true] = g_rc
    t1 = jnp.asarray(t_row[None, :])

    # cut contigs into fixed-width segments
    qs, ql, owner = [], [], []
    for ci, (_, s) in enumerate(contigs):
        codes, _ = encode_bases(s)
        for o in range(0, len(s), seg):
            piece = codes[o : o + seg].astype(np.int32)
            row = np.full(seg, SENT_BASE, np.int32)
            row[: piece.size] = piece
            qs.append(row)
            ql.append(piece.size)
            owner.append(ci)
    q = np.stack(qs)
    ql = np.array(ql, np.int32)
    n_seg = q.shape[0]

    edit = default_edit(AssemblerConfig(), mesh)
    B = max(2 * ndev, 8)
    total_dist = 0
    for s0 in range(0, n_seg, batch):
        qb = q[s0 : s0 + batch]
        qlb = ql[s0 : s0 + batch]
        nb = qb.shape[0]
        P = ((nb + B - 1) // B) * B
        if nb < P:
            qb = np.pad(qb, ((0, P - nb), (0, 0)),
                        constant_values=SENT_BASE)
            qlb = np.pad(qlb, (0, P - nb))
        r = edit(jnp.asarray(qb), t1, jnp.asarray(qlb),
                 jnp.asarray(np.full(P, t_true, np.int32)))
        total_dist += int(np.asarray(r.dist)[:nb].sum())
    span = int(ql.sum())
    return dict(segment_identity=1.0 - total_dist / max(span, 1),
                n_segments=int(n_seg), segment_dist=int(total_dist))


def alignment_identity(contigs: List[Tuple[str, str]], reference: str,
                       min_identity: float = 0.5) -> Dict[str, float]:
    """TRUE alignment identity of each contig vs the reference genome.

    Reuses the production long-read engine (models/overlap_long.py): the
    reference genome is packed as read 0, every contig as a further read;
    anchor-chained segment edit distance gives per-contig dist/span, i.e.
    an alignment-based identity the k-mer metric cannot provide
    (SURVEY.md §5.3 north-star support).
    """
    from hga_tpu.config import AssemblerConfig
    from hga_tpu.io.encode import pack_reads
    from hga_tpu.models.overlap_long import compute_overlaps_long

    if not contigs:
        return dict(aligned_fraction=0.0, alignment_identity=0.0)
    seqs = [reference] + [s for _, s in contigs]
    pad = ((max(len(s) for s in seqs) + 31) // 32) * 32
    pr = pack_reads(seqs, names=["ref"] + [n for n, _ in contigs],
                    pad_len=pad)
    cfg = AssemblerConfig(k=17, w=8, min_shared_minimizers=3,
                          min_overlap_len=64, min_identity=min_identity)
    ov = compute_overlaps_long(pr, cfg)
    # per contig: best (longest-span) alignment against read 0
    best_span = np.zeros(len(contigs), np.int64)
    best_dist = np.zeros(len(contigs), np.int64)
    for r in range(ov.n):
        if int(ov.a[r]) != 0:
            continue
        c = int(ov.b[r]) - 1
        span = int(ov.b_end[r] - ov.b_start[r])
        if span > best_span[c]:
            best_span[c] = span
            best_dist[c] = int(ov.dist[r])
    lens = np.array([len(s) for _, s in contigs], np.int64)
    aligned = best_span.sum() / max(lens.sum(), 1)
    ident = 1.0 - best_dist.sum() / max(best_span.sum(), 1)
    return dict(aligned_fraction=float(aligned),
                alignment_identity=float(max(ident, 0.0)))
