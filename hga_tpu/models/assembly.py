"""Stage 4 (judged config 4) — overlap graph, transitive reduction, unitigs.

Pipeline: overlap records (stage 3) -> containment removal -> doubled-node
string-graph edges -> device CSR + transitive reduction (ops.graph) -> host
unitig walk + contig stitching -> FASTA/GFA.

Graph representation: every read r contributes two oriented nodes 2r (forward)
and 2r+1 (reverse-complement); a dovetail overlap yields one directed edge
and its complement (the string-graph symmetry), so a unitig and its
reverse-complement are two walks of the same structure and are deduplicated
canonically.  The reference keeps a pointer graph with heap node/edge objects
and walks it sequentially (SURVEY.md C10/C11); here edge *construction and
reduction* run on device over flat tensors, and only the final linear walk —
O(#reads), trivially cheap — stays on host for deterministic output
(SURVEY.md §4.3 build note).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hga_tpu.config import AssemblerConfig
from hga_tpu.io.encode import PackedReads, decode_bases, unpack_codes
from hga_tpu.models.overlap import OverlapRecords
from hga_tpu.ops import graph as G
from hga_tpu.utils.oracle import unitigs_from_edges

log = logging.getLogger(__name__)


@dataclasses.dataclass
class StringGraph:
    """Doubled-node directed string graph (host-side arrays)."""

    n_reads: int
    u: np.ndarray        # int32 — source oriented node (2*read + orient)
    v: np.ndarray        # int32 — target oriented node
    ext: np.ndarray      # int32 — bases the target adds beyond the overlap
    score: np.ndarray    # int32 — overlap score
    contained: np.ndarray  # bool (n_reads,)
    # per-edge alignment identity of the source overlap (branch pruning);
    # 1.0 when the overlap records carry no dist
    ident: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.float64))

    @property
    def n_nodes(self) -> int:
        return 2 * self.n_reads


HANG_CAP = 250     # absolute cap on the length-scaled end-hang tolerance

# auto identity-floor detection (config.graph_min_identity < 0): histogram
# window/resolution and acceptance gates — see derive_graph_identity_floor
FLOOR_HIST_LO = 0.95      # only the corrected-read identity range matters
FLOOR_HIST_BINS = 100     # 0.0005 resolution over [0.95, 1.0]
FLOOR_MIN_UPPER_MODE = 0.99   # upper mode must look like corrected reads
FLOOR_MIN_MASS_FRAC = 0.01    # lower cluster >= 1% of in-window overlaps
FLOOR_VALLEY_DROP = 0.5       # valley <= this x min(peak heights)


def derive_graph_identity_floor(ov: OverlapRecords) -> float:
    """Data-driven graph identity floor: the valley between the same-copy
    (~0.997+) and cross-repeat-copy (~0.99) modes of the overlap identity
    distribution (round-4 verdict item 2 — replaces the hand-set
    --graph-min-identity 0.985 the repeat-bearing judged run needed).

    Same pattern as the k-mer spectrum's solid threshold (utils/oracle
    .solid_threshold_from_hist): smooth the histogram, find the two most
    massive local maxima, and put the floor at the minimum between them.
    Returns 0.0 (no floor) unless the distribution is convincingly bimodal
    in the corrected-read range: the upper mode must sit >= 0.99 (corrected
    reads; raw or short-read overlaps never trigger), the lower cluster
    must hold >= 1% of the in-window overlaps, and the valley must dip to
    <= half the smaller peak.  Repeat-free corrected runs are unimodal and
    come out unchanged.
    """
    if ov.n == 0 or ov.dist is None:
        return 0.0
    ident = ov.identity()
    in_win = ident >= FLOOR_HIST_LO
    if int(in_win.sum()) < 64 or in_win.mean() < 0.5:
        # corrected long-read overlaps concentrate >= 0.95; anything else
        # (raw reads, short reads) is not what this floor is for
        return 0.0
    # short overlaps QUANTIZE identity (1 edit over an 80 bp span is a
    # 0.0125 step), so a short-read assembly's discrete edit counts fake a
    # bimodal histogram; the repeat valley only exists on multi-kb
    # corrected-read overlaps where identity is quasi-continuous
    span = np.maximum(ov.a_end - ov.a_start, ov.b_end - ov.b_start)
    if float(np.median(span[in_win])) < 1000:
        return 0.0
    w = (1.0 - FLOOR_HIST_LO) / FLOOR_HIST_BINS
    hist, edges = np.histogram(ident[in_win], bins=FLOOR_HIST_BINS,
                               range=(FLOOR_HIST_LO, 1.0))
    sm = hist.astype(np.float64)
    sm[1:-1] = (hist[:-2] + hist[1:-1] + hist[2:]) / 3.0
    # local maxima of the smoothed histogram (plateau-tolerant)
    peaks = [i for i in range(FLOOR_HIST_BINS)
             if (i == 0 or sm[i] > sm[i - 1])
             and (i == FLOOR_HIST_BINS - 1 or sm[i] >= sm[i + 1])
             and sm[i] > 0]
    if len(peaks) < 2:
        return 0.0
    hi = max(peaks, key=lambda i: sm[i])          # dominant corrected mode
    if edges[hi] < FLOOR_MIN_UPPER_MODE:
        return 0.0
    lower = [i for i in peaks if i < hi]
    if not lower:
        return 0.0
    lo = max(lower, key=lambda i: sm[i])          # most massive lower mode
    valley = lo + int(np.argmin(sm[lo : hi + 1]))
    if sm[valley] > FLOOR_VALLEY_DROP * min(sm[lo], sm[hi]):
        return 0.0
    mass_low = float(hist[: valley + 1].sum())
    if mass_low < FLOOR_MIN_MASS_FRAC * float(hist.sum()):
        return 0.0
    floor = float(edges[valley + 1])              # upper edge of valley bin
    log.info("auto graph identity floor: %.4f (modes at %.4f / %.4f, "
             "%d/%d overlaps below)", floor, edges[lo], edges[hi],
             int((ident < floor).sum()), ov.n)
    return floor


class _null_ctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def build_string_graph(ov: OverlapRecords, n_reads: int,
                       cfg: AssemblerConfig) -> StringGraph:
    """Classify overlaps into containments/dovetails; emit doubled edges.

    End tolerances are length-aware (see config.hang_frac): a noisy read's
    alignment can stop short of its ends by a few hundred bp.  Junction
    extensions subtract the admitted hang along the diagonal, so stitching
    coordinates stay exact regardless of the tolerance.
    """
    if cfg.graph_min_identity > 0.0:
        keep = ov.identity() >= cfg.graph_min_identity
        if not keep.all():
            log.info("graph identity floor %.3f: %d/%d overlaps kept",
                     cfg.graph_min_identity, int(keep.sum()), ov.n)
            import dataclasses as _dc

            ov = OverlapRecords(**{
                f.name: getattr(ov, f.name)[keep]
                for f in _dc.fields(OverlapRecords)})
    a, b, rel = ov.a, ov.b, ov.rel
    la, lb = ov.a_len, ov.b_len
    hang = lambda L: np.maximum(
        cfg.end_tol, np.minimum(HANG_CAP, (L * cfg.hang_frac))).astype(
            np.int64)
    ha, hb = hang(la), hang(lb)
    as_, ae = ov.a_start, ov.a_end
    # b coordinates in b's ORIENTED frame (the frame the DP aligned in)
    bs_o = np.where(rel == 1, lb - ov.b_end, ov.b_start)
    be_o = np.where(rel == 1, lb - ov.b_start, ov.b_end)

    ident_all = ov.identity() if ov.dist is not None else np.ones(ov.n)
    contained_a = (as_ <= ha) & (ae >= la - ha)
    contained_b = (bs_o <= hb) & (be_o >= lb - hb)
    contained = np.zeros(n_reads, bool)
    # a read equal to another (mutual containment) keeps the smaller id
    eq = contained_a & contained_b
    contained[a[contained_a & ~eq]] = True
    contained[b[contained_b & ~eq]] = True
    contained[np.where(eq, np.maximum(a, b), 0)[eq]] = True

    ok = ~contained[a] & ~contained[b] & ~contained_a & ~contained_b
    dove_ab = ok & (ae >= la - ha) & (bs_o <= hb)
    dove_ba = ok & (be_o >= lb - hb) & (as_ <= ha) & ~dove_ab

    us, vs, exts, scs, ids = [], [], [], [], []
    # suffix(a) ~ prefix(b^rel):  a+ -> b^rel   and   b^(1-rel) -> a-
    # diagonal continuation: the unaligned a-suffix (la - ae) corresponds to
    # b bases be_o..be_o+(la-ae), so b only adds lb - be_o - (la - ae).
    # An edge and its complement are kept or dropped TOGETHER (both exts
    # positive) so the doubled graph stays symmetric.
    i = np.nonzero(dove_ab)[0]
    e1 = lb[i] - be_o[i] - (la[i] - ae[i])
    e2 = as_[i] - bs_o[i]
    i = i[(e1 > 0) & (e2 > 0)]
    e1 = lb[i] - be_o[i] - (la[i] - ae[i])
    e2 = as_[i] - bs_o[i]
    us.append(2 * a[i])
    vs.append(2 * b[i] + rel[i])
    exts.append(e1)
    scs.append(ov.score[i])
    ids.append(ident_all[i])
    us.append(2 * b[i] + (1 - rel[i]))
    vs.append(2 * a[i] + 1)
    exts.append(e2)
    scs.append(ov.score[i])
    ids.append(ident_all[i])
    # suffix(b^rel) ~ prefix(a):  b^rel -> a+   and   a- -> b^(1-rel)
    i = np.nonzero(dove_ba)[0]
    e1 = la[i] - ae[i] - (lb[i] - be_o[i])
    e2 = bs_o[i] - as_[i]
    i = i[(e1 > 0) & (e2 > 0)]
    e1 = la[i] - ae[i] - (lb[i] - be_o[i])
    e2 = bs_o[i] - as_[i]
    us.append(2 * b[i] + rel[i])
    vs.append(2 * a[i])
    exts.append(e1)
    scs.append(ov.score[i])
    ids.append(ident_all[i])
    us.append(2 * a[i] + 1)
    vs.append(2 * b[i] + (1 - rel[i]))
    exts.append(e2)
    scs.append(ov.score[i])
    ids.append(ident_all[i])

    u = np.concatenate(us).astype(np.int32) if us else np.zeros(0, np.int32)
    v = np.concatenate(vs).astype(np.int32) if vs else np.zeros(0, np.int32)
    ext = np.concatenate(exts).astype(np.int32) if exts else np.zeros(0, np.int32)
    sc = np.concatenate(scs).astype(np.int32) if scs else np.zeros(0, np.int32)
    idn = np.concatenate(ids) if ids else np.zeros(0, np.float64)

    # dedupe (u, v) keeping the smallest extension (tightest overlap)
    order = np.lexsort((ext, v, u))
    u, v, ext, sc, idn = u[order], v[order], ext[order], sc[order], idn[order]
    first = np.ones(len(u), bool)
    first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
    g = StringGraph(n_reads=n_reads, u=u[first], v=v[first], ext=ext[first],
                    score=sc[first], contained=contained, ident=idn[first])
    log.info("graph: %d edges (%d contained reads)", g.u.size,
             int(contained.sum()))
    return g


def reduce_graph(g: StringGraph, cfg: AssemblerConfig,
                 read_len: Optional[np.ndarray] = None) -> np.ndarray:
    """Device transitive reduction; returns keep mask over g's edges.

    The length slack auto-scales to ~4% of the median non-contained read
    length (floored by cfg.fuzz): composed long-read overlap coordinates
    jitter by tens-to-hundreds of bp, and an under-sized fuzz leaves
    spurious branch edges that fragment every unitig they touch (measured:
    fuzz=10 left 127/339 branching nodes at 1 Mb scale; fuzz>=100 left 64).
    """
    fuzz = cfg.fuzz
    if read_len is not None and not g.contained.all():
        med = float(np.median(read_len[~g.contained]))
        fuzz = max(fuzz, min(1000, int(0.04 * med)))
    E = max(8, g.u.shape[0])
    pad = E - g.u.shape[0]
    u = np.pad(g.u, (0, pad))
    v = np.pad(g.v, (0, pad))
    ext = np.pad(g.ext, (0, pad))
    sc = np.pad(g.score, (0, pad))
    valid = np.pad(np.ones(g.u.shape[0], bool), (0, pad))
    # the graph is O(#reads) — thousands of edges, not millions.  On the
    # tunneled backend a remote compile of the reduction program costs
    # orders of magnitude more than the work (measured: an 18-minute
    # assembly stage on a cache miss); pin this tiny program to the local
    # CPU backend when one exists alongside an accelerator.
    import jax as _jax

    dev = None
    try:
        if _jax.local_devices()[0].platform != "cpu":
            dev = _jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        dev = None
    with (_jax.default_device(dev) if dev is not None
          else _null_ctx()):
        csr = G.build_csr(jnp.asarray(u), jnp.asarray(v), jnp.asarray(ext),
                          jnp.asarray(sc), jnp.asarray(valid), g.n_nodes)
        keep = G.transitive_reduction(csr, g.n_nodes,
                                      max_out=cfg.max_out_degree, fuzz=fuzz)
    # map the (sorted) CSR keep mask back to g's edge order
    ku = np.asarray(csr.u)
    kv = np.asarray(csr.v)
    kkeep = np.asarray(keep)
    kept_set = {(int(x), int(y)) for x, y, m in zip(ku, kv, kkeep) if m}
    # enforce string-graph symmetry by union: coordinate jitter can reduce
    # one direction but not its complement, and an asymmetric graph breaks
    # the forward path and its reverse-complement at different reads, which
    # defeats complement-path dedup and emits the same reads twice
    out = np.zeros(g.u.shape[0], bool)
    for idx, (x, y) in enumerate(zip(g.u, g.v)):
        e = (int(x), int(y))
        if e in kept_set or _complement_edge(*e) in kept_set:
            out[idx] = True
    return out


def _complement_edge(u: int, v: int) -> Tuple[int, int]:
    """String-graph symmetry: edge u->v pairs with comp(v)->comp(u)."""
    return (v ^ 1, u ^ 1)


def prune_branch_edges(
    edges: List[Tuple[int, int]],
    ident_of: Dict[Tuple[int, int], float],
    margin: float,
) -> List[Tuple[int, int]]:
    """Best-overlap branch pruning (the Celera/miniasm 'best overlap graph'
    heuristic, identity-margin gated): at every node with multiple
    out-edges, drop the branches whose overlap identity trails the best
    branch by more than `margin` — together with their complements, so the
    doubled graph stays symmetric (in-branches are covered by the
    complement node's out-branches).

    This is the LOCAL repeat separator the global identity floor cannot
    be: at a repeat boundary the same-copy continuation aligns at the
    corrected-read identity (~0.997+) while a cross-copy continuation
    carries the family divergence (>= ~2x(1-family identity), >= 0.02 for
    a 99% family) — far beyond identity noise on a multi-kb overlap
    (sigma ~ 0.0015).  Genuinely ambiguous branches (identities within the
    margin — exact repeats) are all kept and still break the unitig, so
    this never fabricates a join; it only removes edges that would fuse
    different repeat copies into one walk.
    """
    from collections import defaultdict

    out = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    drop = set()
    for u, vs in out.items():
        if len(vs) < 2:
            continue
        best = max(ident_of[(u, v)] for v in vs)
        for v in vs:
            if ident_of[(u, v)] < best - margin:
                drop.add((u, v))
                drop.add(_complement_edge(u, v))
    if drop:
        log.info("branch pruning: dropped %d/%d edges (margin %.4f)",
                 len(drop), len(edges), margin)
    return [e for e in edges if e not in drop]


def clean_graph(
    n_nodes: int,
    edges: List[Tuple[int, int]],
    score_of: Dict[Tuple[int, int], int],
    tip_max_len: int = 3,
    bubble_depth: int = 10,
) -> List[Tuple[int, int]]:
    """Host-side tip clipping + simple bubble popping (SURVEY.md L4).

    Tips: dead-end chains of <= tip_max_len nodes hanging off the graph are
    removed (read errors create spurious branch stubs that would otherwise
    break every unitig they touch).  Bubbles: two unambiguous paths from the
    same fork that reconverge within bubble_depth nodes — the lower-scoring
    path is dropped.  Edges are removed together with their complement so
    the doubled graph stays symmetric.  Runs to fixpoint (tips expose new
    tips); the graph is O(#reads), so host cost is negligible.
    """
    from collections import defaultdict

    alive = set(edges)

    def drop(e):
        alive.discard(e)
        alive.discard(_complement_edge(*e))

    changed = True
    while changed:
        changed = False
        out = defaultdict(list)
        ind = defaultdict(list)
        for u, v in alive:
            out[u].append(v)
            ind[v].append(u)
        # --- tips: walk back from every dead end, clip them all this pass ---
        for start in ind.keys():
            if out.get(start):
                continue
            # start is a dead end; walk backwards while unambiguous
            path = [start]
            cur = start
            while (len(path) <= tip_max_len and len(ind.get(cur, [])) == 1):
                prev = ind[cur][0]
                if len(out.get(prev, [])) > 1:
                    # prev is a fork: this chain is a clippable tip
                    for i in range(len(path) - 1):
                        drop((path[i + 1], path[i]))
                    drop((prev, path[-1]))
                    changed = True
                    break
                path.append(prev)
                cur = prev
        if changed:
            continue
        # --- bubbles: forks whose branches reconverge ---
        for u in list(out.keys()):
            branches = out.get(u, [])
            if len(branches) < 2:
                continue
            walks = []
            for b in branches:
                path = [(u, b)]
                cur = b
                while (len(path) < bubble_depth
                       and len(out.get(cur, [])) == 1
                       and len(ind.get(cur, [])) == 1):
                    nxt = out[cur][0]
                    path.append((cur, nxt))
                    cur = nxt
                walks.append((cur, path))
            ends = defaultdict(list)
            for end, path in walks:
                ends[end].append(path)
            for end, paths in ends.items():
                if len(paths) < 2:
                    continue
                paths.sort(key=lambda p: (sum(score_of.get(e, 0) for e in p),
                                          -len(p)), reverse=True)
                for p in paths[1:]:
                    for e in p:
                        drop(e)
                changed = True
    return sorted(alive)


@dataclasses.dataclass
class AssemblyResult:
    contigs: List[Tuple[str, str]]       # (name, sequence)
    paths: List[List[int]]               # oriented-node paths per contig
    n_edges_raw: int
    n_edges_reduced: int
    n_contained: int
    # the graph identity floor actually applied (derived when
    # cfg.graph_min_identity < 0, echoed verbatim otherwise)
    identity_floor: float = 0.0
    # surviving string-graph edges as (u, v, overlap_len) oriented-node
    # triples — the GFA L records (SURVEY.md Appendix A "GFA1 optional")
    edges: List[Tuple[int, int, int]] = dataclasses.field(default_factory=list)
    # per-contig circular flag (parallel to contigs): the unitig walk
    # closed into a cycle — the sequence covers the chromosome exactly
    # once (no duplicated origin) and the contig name carries a
    # "_circular" suffix
    circular: List[bool] = dataclasses.field(default_factory=list)

    def save_fasta(self, path: str) -> None:
        from hga_tpu.io.fastq import write_fasta

        write_fasta(path, self.contigs)

    def to_gfa(self, read_names: List[str], read_lens: np.ndarray,
               read_seqs: Optional[List[str]] = None) -> str:
        """GFA1 with S (optionally with sequence), L (overlap) and P lines."""
        lines = ["H\tVN:Z:1.0"]
        for i, n in enumerate(read_names):
            seq = read_seqs[i] if read_seqs is not None else "*"
            lines.append(f"S\t{n}\t{seq}\tLN:i:{int(read_lens[i])}")
        for u, v, olap in self.edges:
            lines.append(
                f"L\t{read_names[u // 2]}\t{'+-'[u % 2]}"
                f"\t{read_names[v // 2]}\t{'+-'[v % 2]}\t{max(olap, 0)}M")
        for p_i, path in enumerate(self.paths):
            segs = ",".join(
                f"{read_names[n // 2]}{'+-'[n % 2]}" for n in path)
            lines.append(f"P\tcontig_{p_i}\t{segs}\t*")
        return "\n".join(lines) + "\n"


def _oriented_seq(codes: np.ndarray, length: int, orient: int) -> np.ndarray:
    s = codes[:length]
    return (3 - s[::-1]) if orient else s


def _read_overlap_cov(ov: OverlapRecords, n_reads: int):
    """Per-read overlap interval table: returns a function cov(read,
    partner_ok) -> fraction of the read covered by overlaps whose partner
    satisfies partner_ok (a bool array over reads)."""
    rec_r = np.concatenate([ov.a, ov.b])
    rec_p = np.concatenate([ov.b, ov.a])
    rec_s = np.concatenate([ov.a_start, ov.b_start]).astype(np.int64)
    rec_e = np.concatenate([ov.a_end, ov.b_end]).astype(np.int64)
    order = np.argsort(rec_r, kind="stable")
    rec_r, rec_p, rec_s, rec_e = (x[order] for x in
                                  (rec_r, rec_p, rec_s, rec_e))
    bounds = np.searchsorted(rec_r, np.arange(n_reads + 1))

    def cov(read: int, length: int, partner_ok: np.ndarray) -> float:
        lo, hi = bounds[read], bounds[read + 1]
        m = partner_ok[rec_p[lo:hi]]
        if not m.any():
            return 0.0
        ivs = sorted(zip(rec_s[lo:hi][m], rec_e[lo:hi][m]))
        tot = 0
        cur = 0
        for s, e in ivs:
            s = max(s, cur)
            if e > s:
                tot += e - s
                cur = e
        return tot / max(length, 1)

    return cov


def assemble(pr: PackedReads, ov: OverlapRecords,
             cfg: AssemblerConfig) -> AssemblyResult:
    """Config-4 stage: overlaps -> reduced string graph -> stitched contigs.

    Emission is redundancy-filtered: contigs are built longest-first, and a
    contig is dropped when EVERY read in it is >= cfg.redundant_cov covered
    by overlaps with reads already emitted — undetected containments and
    tip/bubble orphans otherwise duplicate already-assembled sequence
    (the reference's containment removal serves the same end, SURVEY.md
    C10; measured at 1 Mb scale this halves total contig length)."""
    if cfg.graph_min_identity < 0:  # auto: fit the bimodal valley
        cfg = cfg.replace(
            graph_min_identity=derive_graph_identity_floor(ov))
    g = build_string_graph(ov, pr.n_reads, cfg)
    keep = reduce_graph(g, cfg, read_len=pr.length) if g.u.size else (
        np.zeros(0, bool))
    edges = [(int(u), int(v)) for u, v, k in zip(g.u, g.v, keep) if k]
    ext_of: Dict[Tuple[int, int], int] = {
        (int(u), int(v)): int(e)
        for u, v, e, k in zip(g.u, g.v, g.ext, keep) if k
    }
    score_of = {(int(u), int(v)): int(s)
                for u, v, s, k in zip(g.u, g.v, g.score, keep) if k}
    if (cfg.graph_branch_margin > 0 and ov.dist is not None and ov.n
            and float(np.median(np.maximum(ov.a_end - ov.a_start,
                                           ov.b_end - ov.b_start))) >= 1000):
        # multi-kb corrected overlaps only: short-read identities are
        # quantized (1 edit ~ 0.0125) and would false-trigger the margin
        ident_of = {(int(u), int(v)): float(i)
                    for u, v, i, k in zip(g.u, g.v, g.ident, keep) if k}
        edges = prune_branch_edges(edges, ident_of, cfg.graph_branch_margin)
    edges = clean_graph(g.n_nodes, edges, score_of,
                        tip_max_len=cfg.tip_max_len)
    paths = unitigs_from_edges(g.n_nodes, edges)
    from collections import Counter

    outdeg = Counter(u for u, _ in edges)
    indeg = Counter(v for _, v in edges)

    def _rot_min(t: Tuple[int, ...]) -> Tuple[int, ...]:
        i = t.index(min(t))
        return t[i:] + t[:i]

    codes = unpack_codes(pr.packed)
    candidates: List[Tuple[List[int], np.ndarray, bool]] = []
    emitted_paths = set()
    emitted_cycles = set()
    for path in sorted(paths, key=lambda p: p[0]):
        read0 = path[0] // 2
        if g.contained[read0] and len(path) == 1:
            continue
        comp = tuple(n ^ 1 for n in reversed(path))
        # circular chromosome: the walk closed into a cycle (SURVEY.md
        # Appendix A — E. coli is circular; the closing edge exists and
        # every node is an unambiguous chain link).  The contig is the
        # concatenation of each edge's extension around the cycle — the
        # genome exactly once, no duplicated origin — rotated so the
        # smallest oriented node starts (deterministic origin).
        is_cycle = (len(path) >= 2 and (path[-1], path[0]) in ext_of
                    and all(outdeg[n] == 1 and indeg[n] == 1 for n in path))
        if is_cycle:
            canon = min(_rot_min(tuple(path)), _rot_min(comp))
            if canon in emitted_cycles:
                continue
            seq_parts = []
            ok = True
            prev = path[-1]
            for v in path:
                ext = ext_of.get((prev, v))
                if ext is None:
                    ok = False
                    break
                r = v // 2
                s = _oriented_seq(codes[r], int(pr.length[r]), v % 2)
                seq_parts.append(s[len(s) - ext:])
                prev = v
            if not ok:
                continue
            seq = np.concatenate(seq_parts)
            if seq.size < cfg.min_contig_len:
                continue
            emitted_cycles.add(canon)
            candidates.append((list(path), seq, True))
            continue
        if tuple(path) > comp and comp in emitted_paths:
            continue
        seq_parts = [
            _oriented_seq(codes[read0], int(pr.length[read0]), path[0] % 2)]
        ok = True
        for u, v in zip(path[:-1], path[1:]):
            ext = ext_of.get((u, v))
            if ext is None:
                ok = False
                break
            r = v // 2
            s = _oriented_seq(codes[r], int(pr.length[r]), v % 2)
            seq_parts.append(s[len(s) - ext:])
        if not ok:
            continue
        seq = np.concatenate(seq_parts)
        if seq.size < cfg.min_contig_len:
            continue
        emitted_paths.add(tuple(path))
        candidates.append((list(path), seq, False))

    # longest-first redundancy filter
    candidates.sort(key=lambda c: (-len(c[1]), c[0][0]))
    covf = _read_overlap_cov(ov, pr.n_reads)
    in_out = np.zeros(pr.n_reads, bool)
    contigs: List[Tuple[str, str]] = []
    kept_paths: List[List[int]] = []
    kept_circ: List[bool] = []
    for path, seq, circ in candidates:
        reads = [n // 2 for n in path]
        redundant = contigs and all(
            covf(r, int(pr.length[r]), in_out) >= cfg.redundant_cov
            for r in reads)
        if redundant:
            continue
        in_out[reads] = True
        name = f"contig_{len(contigs)}" + ("_circular" if circ else "")
        contigs.append((name, decode_bases(seq)))
        kept_paths.append(path)
        kept_circ.append(circ)

    log.info("assembly: %d contigs (N=%s)", len(contigs),
             sorted((len(s) for _, s in contigs), reverse=True)[:5])
    l_edges = [(u, v, int(pr.length[v // 2]) - e)
               for (u, v), e in sorted(ext_of.items())]
    return AssemblyResult(
        contigs=contigs, paths=kept_paths,
        n_edges_raw=int(g.u.size),
        n_edges_reduced=int(np.sum(keep)) if g.u.size else 0,
        n_contained=int(g.contained.sum()),
        identity_floor=float(cfg.graph_min_identity),
        edges=l_edges,
        circular=kept_circ,
    )
