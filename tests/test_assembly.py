"""Config 3+4 end-to-end: overlaps -> string graph -> contigs (the minimum
end-to-end slice of SURVEY.md §8.2)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io import encode as E
from hga_tpu.models.assembly import assemble, build_string_graph
from hga_tpu.models.overlap import compute_overlaps
from hga_tpu.models.seeding import find_candidates
from hga_tpu.utils import sim

CFG = AssemblerConfig(k=15, w=5, band=32, max_seed_freq=16,
                      min_shared_minimizers=2, batch_reads=64,
                      min_overlap_len=30, min_overlap_score=40)


def _assemble_tiled(genome, step=40, rlen=120, flip_some=False):
    starts = list(range(0, len(genome) - rlen + 1, step))
    if starts[-1] != len(genome) - rlen:
        starts.append(len(genome) - rlen)
    seqs = [genome[s : s + rlen] for s in starts]
    if flip_some:
        seqs = [E.revcomp_str(s) if i % 3 == 1 else s
                for i, s in enumerate(seqs)]
    pr = E.pack_reads(seqs, pad_len=128)
    cands = find_candidates(pr, CFG)
    ov = compute_overlaps(pr, cands, CFG, batch_pairs=512)
    return pr, ov, assemble(pr, ov, CFG)


def test_overlap_coords_on_tiled_reads():
    genome = sim.random_genome(1200, seed=31)
    pr, ov, _res = _assemble_tiled(genome)
    # adjacent tiles overlap by 80bp: find record for (i, i+1)
    recs = {(int(a), int(b)): i for i, (a, b) in enumerate(zip(ov.a, ov.b))}
    found = 0
    for i in range(len(pr.names) - 2):
        if (i, i + 1) not in recs:
            continue
        r = recs[(i, i + 1)]
        found += 1
        assert ov.rel[r] == 0
        # expected: a[40:120] == b[0:80]
        assert abs(int(ov.a_start[r]) - 40) <= 2
        assert int(ov.a_end[r]) >= 118
        assert int(ov.b_start[r]) <= 2
        assert abs(int(ov.b_end[r]) - 80) <= 2
    assert found >= len(pr.names) - 4


def test_assembles_single_contig_forward_only():
    genome = sim.random_genome(1500, seed=32)
    _pr, _ov, res = _assemble_tiled(genome)
    seqs = sorted((s for _, s in res.contigs), key=len, reverse=True)
    assert seqs, "no contigs"
    assert seqs[0] == genome or seqs[0] == E.revcomp_str(genome)


def test_assembles_single_contig_mixed_strands():
    genome = sim.random_genome(1500, seed=33)
    _pr, _ov, res = _assemble_tiled(genome, flip_some=True)
    seqs = sorted((s for _, s in res.contigs), key=len, reverse=True)
    assert seqs, "no contigs"
    assert seqs[0] == genome or seqs[0] == E.revcomp_str(genome)


def test_contained_reads_removed():
    genome = sim.random_genome(900, seed=34)
    rlen = 120
    starts = list(range(0, len(genome) - rlen + 1, 40))
    if starts[-1] != len(genome) - rlen:
        starts.append(len(genome) - rlen)
    seqs = [genome[s : s + rlen] for s in starts]
    # add reads fully contained in read 0
    seqs.append(genome[10 : 90])
    seqs.append(E.revcomp_str(genome[20 : 100]))
    pr = E.pack_reads(seqs, pad_len=128)
    cands = find_candidates(pr, CFG)
    ov = compute_overlaps(pr, cands, CFG, batch_pairs=512)
    g = build_string_graph(ov, pr.n_reads, CFG)
    assert g.contained[len(seqs) - 2]
    assert g.contained[len(seqs) - 1]
    res = assemble(pr, ov, CFG)
    seqs_out = sorted((s for _, s in res.contigs), key=len, reverse=True)
    assert seqs_out[0] in (genome, E.revcomp_str(genome))


def test_assembly_with_read_errors():
    genome = sim.random_genome(2000, seed=35)
    seqs, _names = sim.simulate_short_reads(genome, coverage=12, read_len=120,
                                            error_rate=0.005, seed=36)
    pr = E.pack_reads(seqs, pad_len=128)
    cands = find_candidates(pr, CFG)
    ov = compute_overlaps(pr, cands, CFG, batch_pairs=1024)
    res = assemble(pr, ov, CFG)
    assert res.contigs
    longest = max(len(s) for _, s in res.contigs)
    # errorful assembly won't be perfect, but must recover a long contig
    assert longest >= 1000


def test_gfa_has_link_records():
    import numpy as np

    from hga_tpu.config import AssemblerConfig
    from hga_tpu.io.encode import pack_reads
    from hga_tpu.models.assembly import assemble
    from hga_tpu.models.overlap import compute_overlaps
    from hga_tpu.models.seeding import find_candidates
    from hga_tpu.utils import sim

    cfg = AssemblerConfig(k=15, w=5, band=32, batch_reads=256,
                          min_shared_minimizers=2, min_overlap_len=30)
    g = sim.random_genome(1500, seed=4)
    seqs, names = sim.simulate_short_reads(g, coverage=15, read_len=120,
                                           error_rate=0.0, seed=5)
    pr = pack_reads(seqs, names=names, pad_len=128)
    cands = find_candidates(pr, cfg)
    ov = compute_overlaps(pr, cands, cfg)
    res = assemble(pr, ov, cfg)
    assert res.contigs
    gfa = res.to_gfa(pr.names, pr.length)
    l_lines = [l for l in gfa.splitlines() if l.startswith("L\t")]
    assert len(l_lines) > 0
    # L format: L <from> <orient> <to> <orient> <overlap>M
    parts = l_lines[0].split("\t")
    assert len(parts) == 6 and parts[5].endswith("M")
    assert int(parts[5][:-1]) > 0


def test_graph_identity_floor_drops_weak_overlaps():
    """cfg.graph_min_identity filters overlap records before graph build
    (repeat-mode knob: cross-repeat-copy overlaps sit below corrected
    same-locus overlap identity)."""
    from hga_tpu.models.overlap import OverlapRecords

    z = np.zeros(2, np.int32)
    ov = OverlapRecords(
        a=np.array([0, 1], np.int32), b=np.array([1, 2], np.int32),
        rel=z.copy(), score=np.array([100, 100], np.int32),
        a_start=np.array([500, 500], np.int32),
        a_end=np.array([1000, 1000], np.int32),
        b_start=z.copy(), b_end=np.array([500, 500], np.int32),
        a_len=np.array([1000, 1000], np.int32),
        b_len=np.array([1000, 1000], np.int32),
        dist=np.array([1, 50], np.int32))   # identities 0.998, 0.9
    from hga_tpu.models.assembly import build_string_graph
    from hga_tpu.config import AssemblerConfig

    cfg = AssemblerConfig(graph_min_identity=0.99)
    g = build_string_graph(ov, 3, cfg)
    reads_in_graph = {int(u) // 2 for u in g.u} | {int(v) // 2 for v in g.v}
    assert 2 not in reads_in_graph          # the 0.9-identity edge dropped
    assert {0, 1} <= reads_in_graph


def _ident_records(idents, span=2000):
    """OverlapRecords whose .identity() equals `idents` (span-scaled dist)."""
    from hga_tpu.models.overlap import OverlapRecords

    n = len(idents)
    idents = np.asarray(idents, np.float64)
    dist = np.round((1.0 - idents) * span).astype(np.int64)
    z = np.zeros(n, np.int32)
    return OverlapRecords(
        a=np.arange(n, dtype=np.int32), b=np.arange(n, dtype=np.int32) + n,
        rel=z, score=z + 100, a_start=z, a_end=z + span,
        b_start=z, b_end=z + span, a_len=z + span, b_len=z + span,
        dist=dist.astype(np.int32))


def test_auto_identity_floor_bimodal():
    """Two modes (cross-copy ~0.988, same-copy ~0.998) -> floor in valley."""
    from hga_tpu.models.assembly import derive_graph_identity_floor

    rng = np.random.default_rng(0)
    same = np.clip(rng.normal(0.998, 0.0012, 4000), 0.95, 1.0)
    cross = np.clip(rng.normal(0.988, 0.0012, 400), 0.95, 1.0)
    ov = _ident_records(np.concatenate([same, cross]))
    floor = derive_graph_identity_floor(ov)
    assert 0.989 < floor < 0.997, floor
    # the floor separates the clusters: cross below, same above
    ident = ov.identity()
    assert (ident[:4000] >= floor).mean() > 0.98
    assert (ident[4000:] < floor).mean() > 0.95


def test_auto_identity_floor_unimodal_off():
    """Repeat-free corrected runs are unimodal -> no floor."""
    from hga_tpu.models.assembly import derive_graph_identity_floor

    rng = np.random.default_rng(1)
    same = np.clip(rng.normal(0.997, 0.0015, 5000), 0.95, 1.0)
    assert derive_graph_identity_floor(_ident_records(same)) == 0.0


def test_auto_identity_floor_raw_reads_off():
    """Raw-read overlaps (identity ~0.8) never trigger the floor."""
    from hga_tpu.models.assembly import derive_graph_identity_floor

    rng = np.random.default_rng(2)
    raw = np.clip(rng.normal(0.82, 0.03, 5000), 0.0, 1.0)
    assert derive_graph_identity_floor(_ident_records(raw)) == 0.0


def test_branch_pruning_drops_trailing_branch():
    from hga_tpu.models.assembly import prune_branch_edges

    # node 0 branches to 2 (ident .998) and 4 (ident .985): the trailing
    # branch and its complement are dropped; ties within margin are kept
    edges = [(0, 2), (0, 4), (5, 1), (3, 1)]
    ident = {(0, 2): 0.998, (0, 4): 0.985, (5, 1): 0.985, (3, 1): 0.998}
    out = prune_branch_edges(edges, ident, margin=0.008)
    assert (0, 2) in out and (3, 1) in out
    assert (0, 4) not in out and (5, 1) not in out

    # identities within the margin: genuinely ambiguous, everything stays
    ident2 = {(0, 2): 0.998, (0, 4): 0.995, (5, 1): 0.995, (3, 1): 0.998}
    assert prune_branch_edges(edges, ident2, margin=0.008) == edges
