"""The PRODUCTION pipeline on the 8-device virtual mesh vs single device.

SURVEY.md §5.4 / BASELINE config 5: the full hybrid pipeline must run
distributed and emit bit-identical contigs to the 1-device run (fixed
reduction orders make this exact, SURVEY.md §8.3-2).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io.encode import pack_reads
from hga_tpu.models.pipeline import run_pipeline
from hga_tpu.parallel.mesh import make_mesh
from hga_tpu.utils import sim


@pytest.fixture(scope="module")
def hybrid_ds():
    ds = sim.make_dataset(genome_len=3000, short_cov=25, long_cov=12, seed=5,
                          short_err=0.005, long_err=0.08)
    pr_s = pack_reads(ds.short_seqs, names=ds.short_names, pad_len=128)
    pad = ((max(len(s) for s in ds.long_seqs) + 15) // 16) * 16
    pr_l = pack_reads(ds.long_seqs, names=ds.long_names,
                      category=[1] * len(ds.long_seqs), pad_len=pad)
    return ds, pr_s, pr_l


def test_mesh_pipeline_bit_identical(tmp_path, hybrid_ds):
    ds, pr_s, pr_l = hybrid_ds
    assert len(jax.devices()) >= 8, "conftest must force an 8-device mesh"
    cfg = AssemblerConfig(k=15, w=5, band=32, batch_reads=512,
                          min_shared_minimizers=2, min_overlap_len=30)
    r1 = run_pipeline(pr_s, pr_l, cfg, str(tmp_path / "one"), mesh=None)
    mesh = make_mesh(devices=jax.devices()[:8])
    r8 = run_pipeline(pr_s, pr_l, cfg, str(tmp_path / "eight"), mesh=mesh)
    assert r1.polished == r8.polished
    assert r1.contigs == r8.contigs
    assert [s for _, s in r1.polished]  # non-trivial output


def test_mesh_spectrum_matches(hybrid_ds):
    from hga_tpu.models.spectrum import count_reads

    _, pr_s, _ = hybrid_ds
    cfg = AssemblerConfig(k=15, batch_reads=256)
    mesh = make_mesh(devices=jax.devices()[:8])
    s1 = count_reads(pr_s, cfg, mesh=None)
    s8 = count_reads(pr_s, cfg, mesh=mesh)
    np.testing.assert_array_equal(s1.hist, s8.hist)
    assert s1.threshold == s8.threshold
    assert s1.n_distinct == s8.n_distinct
    # the single-device path stores the solid subset only; the mesh path
    # keeps the full distinct set — the SOLID sets must agree bit-exactly
    h1, l1 = s1.solid_set()
    h8, l8 = s8.solid_set()
    np.testing.assert_array_equal(h1, h8)
    np.testing.assert_array_equal(l1, l8)
