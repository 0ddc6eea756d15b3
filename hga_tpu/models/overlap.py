"""Stage 3 (judged config 3) — banded SW overlap extension over candidates.

Pipeline: candidate pairs (stage 2) -> per-pair banded wavefront DP on device
(ops.align / ops.align_pallas) -> PAF-shaped overlap records.

The band is centered by construction: the target read is re-oriented (reverse
complement when rel=1) and shifted by the candidate's estimated diagonal, so
the DP always runs with its band around the main diagonal — the reference
instead re-anchors its scalar DP per seed chain (SURVEY.md §4.2).

Start coordinates come from a second, reversed DP pass on the matched
prefixes (standard end-then-start trick), keeping the kernel score-only and
traceback-free; base-level CIGARs are only materialized where correction
needs them (models/correction.py).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hga_tpu.config import AssemblerConfig
from hga_tpu.io.encode import PackedReads, unpack_codes
from hga_tpu.models.seeding import SeedingResult
from hga_tpu.ops.align import banded_sw_batch

log = logging.getLogger(__name__)

SENT_BASE = 4  # padding base code: never matches a real base 0..3


def default_sw(cfg: "AssemblerConfig"):
    """Score-only SW dispatch: the Pallas wavefront kernel on TPU for
    short-query shapes, the XLA implementation elsewhere (CPU tests, long
    queries over the full-width budget)."""
    import jax as _jax

    from hga_tpu.ops.align_pallas import (MAX_QUERY_LEN,
                                          banded_sw_batch_pallas)

    plat = _jax.devices()[0].platform

    def sw(q, t, ql, tl, band):
        N, Lq = q.shape
        if plat in ("tpu", "axon") and Lq <= MAX_QUERY_LEN and N % 8 == 0:
            tile = 128 if N % 128 == 0 else 8
            try:
                return banded_sw_batch_pallas(
                    q, t, ql, tl, band=band, match=cfg.match,
                    mismatch=cfg.mismatch, gap=cfg.gap, pair_tile=tile)
            except Exception as e:  # pragma: no cover - compiler fallback
                log.warning("pallas SW fallback to XLA: %s", str(e)[:200])
        return banded_sw_batch(q, t, ql, tl, band=band, match=cfg.match,
                               mismatch=cfg.mismatch, gap=cfg.gap)

    return sw


@dataclasses.dataclass
class OverlapRecords:
    """PAF-shaped overlaps (SURVEY.md Appendix A).

    Coordinates are 0-based half-open in each read's FORWARD frame; rel=1
    means b maps reverse-complemented.  score is the DP score (all-integer).
    """

    a: np.ndarray
    b: np.ndarray
    rel: np.ndarray
    score: np.ndarray
    a_start: np.ndarray
    a_end: np.ndarray
    b_start: np.ndarray
    b_end: np.ndarray
    a_len: np.ndarray
    b_len: np.ndarray

    @property
    def n(self) -> int:
        return int(self.a.shape[0])

    def save(self, path: str) -> None:
        np.savez_compressed(path, **dataclasses.asdict(self))

    @staticmethod
    def load(path: str) -> "OverlapRecords":
        z = np.load(path)
        return OverlapRecords(**{k: z[k] for k in z.files})

    def to_paf(self, names_a, names_b) -> str:
        lines = []
        for i in range(self.n):
            lines.append("\t".join(map(str, [
                names_a[self.a[i]], self.a_len[i], self.a_start[i], self.a_end[i],
                "+-"[int(self.rel[i])],
                names_b[self.b[i]], self.b_len[i], self.b_start[i], self.b_end[i],
                self.score[i],
                max(int(self.a_end[i] - self.a_start[i]),
                    int(self.b_end[i] - self.b_start[i])),
                255,
            ])))
        return "\n".join(lines) + ("\n" if lines else "")


def _oriented_codes(codes: np.ndarray, lengths: np.ndarray,
                    flip: np.ndarray) -> np.ndarray:
    """Reverse-complement rows where flip, respecting true lengths."""
    n, L = codes.shape
    out = codes.copy()
    for i in np.nonzero(flip)[0]:
        l = int(lengths[i])
        out[i, :l] = 3 - codes[i, :l][::-1]
        out[i, l:] = SENT_BASE
    return out


def _window_gather(codes_b: np.ndarray, lengths_b: np.ndarray,
                   off: np.ndarray, Wt: int) -> np.ndarray:
    """t_win[i, x] = codes_b[i, x + off[i]], out-of-range -> SENT_BASE."""
    n, L = codes_b.shape
    x = np.arange(Wt)[None, :] + off[:, None]
    valid = (x >= 0) & (x < lengths_b[:, None])
    xc = np.clip(x, 0, L - 1)
    out = np.take_along_axis(codes_b, xc, axis=1)
    out[~valid] = SENT_BASE
    return out


def compute_overlaps(
    pr: PackedReads,
    cands: SeedingResult,
    cfg: AssemblerConfig,
    sw_fn=None,
    batch_pairs: int = 4096,
) -> OverlapRecords:
    """Run banded DP on every candidate; keep overlaps above thresholds."""
    if cands.n_pairs == 0:
        z = np.zeros(0, np.int32)
        return OverlapRecords(z, z, z, z, z, z, z, z, z, z)
    sw = sw_fn or default_sw(cfg)

    # don't pad a small candidate list up to a huge static batch; round to a
    # power of two so the number of distinct compiled shapes stays bounded
    batch_pairs = min(batch_pairs,
                      max(8, 1 << (cands.n_pairs - 1).bit_length()))

    codes = unpack_codes(pr.packed).astype(np.int32)  # (R, pad_len)
    # mask bases past each read's length so they can never match
    Lpad = codes.shape[1]
    past = np.arange(Lpad)[None, :] >= pr.length[:, None]
    codes[past] = SENT_BASE
    lengths = pr.length.astype(np.int32)

    Lq = Lpad
    Wt = Lq + cfg.band + 8
    outs = {k: [] for k in ("a", "b", "rel", "score", "a_start", "a_end",
                            "b_start", "b_end")}

    for s in range(0, cands.n_pairs, batch_pairs):
        a = cands.a[s : s + batch_pairs].astype(np.int64)
        b = cands.b[s : s + batch_pairs].astype(np.int64)
        rel = cands.rel[s : s + batch_pairs].astype(np.int32)
        diag = cands.diag[s : s + batch_pairs].astype(np.int32)
        nb = a.shape[0]
        P = batch_pairs
        if nb < P:  # pad the tail batch
            padn = P - nb
            a = np.pad(a, (0, padn))
            b = np.pad(b, (0, padn))
            rel = np.pad(rel, (0, padn))
            diag = np.pad(diag, (0, padn))

        q = codes[a]
        qlen = np.where(np.arange(P) < nb, lengths[a], 0).astype(np.int32)
        t_or = _oriented_codes(codes[b], lengths[b], rel == 1)
        # expected j - i = pos_b_oriented - pos_a = -diag: shift t so the
        # band is centered, keeping `band` slack to the left
        off = -diag - cfg.band // 2
        t_win = _window_gather(t_or, lengths[b].astype(np.int64), off, Wt)
        tlen = np.where(np.arange(P) < nb, Wt, 0).astype(np.int32)

        fwd = sw(jnp.asarray(q), jnp.asarray(t_win), jnp.asarray(qlen),
                 jnp.asarray(tlen), cfg.band)
        score = np.asarray(fwd.score)
        qend = np.asarray(fwd.qend)
        tend = np.asarray(fwd.tend)

        # Reverse pass on the matched prefixes for start coordinates: align
        # reversed(q[:qend]) vs reversed(t[:tend]).  The reversed path lives
        # on diagonals (tend - qend) - c with c in [-band, band] and
        # |tend - qend| <= band, so a 2*band reverse band always contains it
        # and the reverse score equals the forward score.  End cells map
        # back as qstart = qend - qend', tstart = tend - tend'.
        qidx = (qend[:, None] - 1) - np.arange(Lq)[None, :]
        qr = np.where(qidx >= 0,
                      np.take_along_axis(q, np.clip(qidx, 0, Lq - 1), 1),
                      SENT_BASE).astype(np.int32)
        tidx = (tend[:, None] - 1) - np.arange(Wt)[None, :]
        tr = np.where(tidx >= 0,
                      np.take_along_axis(t_win, np.clip(tidx, 0, Wt - 1), 1),
                      SENT_BASE).astype(np.int32)
        rev = sw(jnp.asarray(qr), jnp.asarray(tr),
                 jnp.asarray(qend.astype(np.int32)),
                 jnp.asarray(tend.astype(np.int32)), 2 * cfg.band)
        rscore = np.asarray(rev.score)
        qstart = qend - np.asarray(rev.qend)
        tstart = tend - np.asarray(rev.tend)

        # map window coords back to the oriented b frame, then forward frame
        b_or_start = tstart + off
        b_or_end = tend + off
        lb = lengths[b]
        b_fwd_start = np.where(rel == 1, lb - b_or_end, b_or_start)
        b_fwd_end = np.where(rel == 1, lb - b_or_start, b_or_end)

        keep = (
            (np.arange(P) < nb)
            & (score >= cfg.min_overlap_score)
            & ((qend - qstart) >= cfg.min_overlap_len)
            & (rscore >= score)  # reverse pass must reproduce the score
        )
        outs["a"].append(a[keep].astype(np.int32))
        outs["b"].append(b[keep].astype(np.int32))
        outs["rel"].append(rel[keep])
        outs["score"].append(score[keep].astype(np.int32))
        outs["a_start"].append(qstart[keep].astype(np.int32))
        outs["a_end"].append(qend[keep].astype(np.int32))
        outs["b_start"].append(b_fwd_start[keep].astype(np.int32))
        outs["b_end"].append(b_fwd_end[keep].astype(np.int32))

    cat = {k: (np.concatenate(v) if v else np.zeros(0, np.int32))
           for k, v in outs.items()}
    rec = OverlapRecords(
        a_len=lengths[cat["a"]], b_len=lengths[cat["b"]], **cat)
    log.info("overlap: %d candidates -> %d overlaps", cands.n_pairs, rec.n)
    return rec


def compute_overlaps_cross(
    pr_a: PackedReads,
    pr_b: PackedReads,
    cfg: AssemblerConfig,
    sw_fn=None,
    batch_pairs: int = 4096,
) -> OverlapRecords:
    """Judged config 3: overlaps BETWEEN two read sets (short reads as
    queries `a`, long reads as targets `b`).

    The reference queries its short-read index with each long read
    (SURVEY.md §4.2); here the cross-category candidates come from the
    merged sorted minimizer index and each candidate aligns the short read
    against a band-centered window of the long read — same wavefront kernel,
    same coordinate conventions as the all-vs-all path (b coordinates in the
    long read's forward frame; the READ is reverse-complemented for rel=1 so
    alignments share the target's forward context).
    """
    from hga_tpu.models.correction import find_candidates_cross

    a, b, rel, diag = find_candidates_cross(pr_a, pr_b, cfg)
    if len(a) == 0:
        z = np.zeros(0, np.int32)
        return OverlapRecords(z, z, z, z, z, z, z, z, z, z)
    sw = sw_fn or default_sw(cfg)
    batch_pairs = min(batch_pairs, max(8, 1 << (len(a) - 1).bit_length()))

    a_codes = unpack_codes(pr_a.packed).astype(np.int32)
    Lq = a_codes.shape[1]
    a_codes[np.arange(Lq)[None, :] >= pr_a.length[:, None]] = SENT_BASE
    b_codes = unpack_codes(pr_b.packed).astype(np.int32)
    Lb = b_codes.shape[1]
    b_codes[np.arange(Lb)[None, :] >= pr_b.length[:, None]] = SENT_BASE
    b_flat = b_codes.reshape(-1)

    Wt = Lq + cfg.band + 8
    outs = {k: [] for k in ("a", "b", "rel", "score", "a_start", "a_end",
                            "b_start", "b_end")}
    for s in range(0, len(a), batch_pairs):
        aa = a[s : s + batch_pairs].astype(np.int64)
        bb = b[s : s + batch_pairs].astype(np.int64)
        rr = rel[s : s + batch_pairs].astype(np.int32)
        dd = diag[s : s + batch_pairs].astype(np.int32)
        nb = aa.shape[0]
        P = batch_pairs
        if nb < P:
            padn = P - nb
            aa, bb = np.pad(aa, (0, padn)), np.pad(bb, (0, padn))
            rr, dd = np.pad(rr, (0, padn)), np.pad(dd, (0, padn))
        la = pr_a.length[aa].astype(np.int64)
        lb = pr_b.length[bb].astype(np.int64)
        flip = rr == 1
        q = a_codes[aa]
        qidx = (la[:, None] - 1) - np.arange(Lq)[None, :]
        q_rc = np.where(qidx >= 0,
                        np.take_along_axis(q, np.clip(qidx, 0, Lq - 1), 1),
                        SENT_BASE)
        q_rc = np.where(q_rc < 4, 3 - q_rc, q_rc)
        q = np.where(flip[:, None], q_rc, q).astype(np.int32)
        qlen = np.where(np.arange(P) < nb, pr_a.length[aa], 0).astype(np.int32)
        off = np.where(flip, dd + lb - la, -dd).astype(np.int64) - cfg.band // 2
        pos_f = np.arange(Wt)[None, :] + off[:, None]
        in_range = (pos_f >= 0) & (pos_f < lb[:, None])
        vals = b_flat[bb[:, None] * Lb + np.clip(pos_f, 0, Lb - 1)]
        t_win = np.where(in_range, vals, SENT_BASE).astype(np.int32)
        tlen = np.where(np.arange(P) < nb, Wt, 0).astype(np.int32)

        fwd = sw(jnp.asarray(q), jnp.asarray(t_win), jnp.asarray(qlen),
                 jnp.asarray(tlen), cfg.band)
        score = np.asarray(fwd.score)
        qend = np.asarray(fwd.qend)
        tend = np.asarray(fwd.tend)
        qidx2 = (qend[:, None] - 1) - np.arange(Lq)[None, :]
        qr = np.where(qidx2 >= 0,
                      np.take_along_axis(q, np.clip(qidx2, 0, Lq - 1), 1),
                      SENT_BASE).astype(np.int32)
        tidx = (tend[:, None] - 1) - np.arange(Wt)[None, :]
        tr = np.where(tidx >= 0,
                      np.take_along_axis(t_win, np.clip(tidx, 0, Wt - 1), 1),
                      SENT_BASE).astype(np.int32)
        rev = sw(jnp.asarray(qr), jnp.asarray(tr),
                 jnp.asarray(qend.astype(np.int32)),
                 jnp.asarray(tend.astype(np.int32)), 2 * cfg.band)
        rscore = np.asarray(rev.score)
        q_start = qend - np.asarray(rev.qend)
        t_start = tend - np.asarray(rev.tend)

        # window -> long-read forward coords; query coords -> the read's
        # forward frame when the read was flipped
        b_start_f = t_start + off
        b_end_f = tend + off
        a_start_f = np.where(flip, la - qend, q_start)
        a_end_f = np.where(flip, la - q_start, qend)
        keep = ((np.arange(P) < nb)
                & (score >= cfg.min_overlap_score)
                & ((qend - q_start) >= cfg.min_overlap_len)
                & (rscore >= score))
        outs["a"].append(aa[keep].astype(np.int32))
        outs["b"].append(bb[keep].astype(np.int32))
        outs["rel"].append(rr[keep])
        outs["score"].append(score[keep].astype(np.int32))
        outs["a_start"].append(a_start_f[keep].astype(np.int32))
        outs["a_end"].append(a_end_f[keep].astype(np.int32))
        outs["b_start"].append(b_start_f[keep].astype(np.int32))
        outs["b_end"].append(b_end_f[keep].astype(np.int32))

    cat = {k: (np.concatenate(v) if v else np.zeros(0, np.int32))
           for k, v in outs.items()}
    rec = OverlapRecords(
        a_len=pr_a.length[cat["a"]].astype(np.int32),
        b_len=pr_b.length[cat["b"]].astype(np.int32), **cat)
    log.info("overlap-cross: %d candidates -> %d overlaps", len(a), rec.n)
    return rec
