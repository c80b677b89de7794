"""Alias tables, Sobol table, and wavefront sampler tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from radish_pt_tpu.sampling.alias import alias_pmf, alias_sample, build_alias_table
from radish_pt_tpu.sampling.rng import SamplerState, make_sampler, sample_1d, sample_4d
from radish_pt_tpu.sampling.sobol import (
    SOBOL_SAMPLE_DIM,
    SOBOL_SAMPLE_NUM,
    generate_sobol_table,
)


def test_alias_table_pmf_exact():
    w = np.array([1.0, 2.0, 3.0, 4.0])
    t = build_alias_table(w)
    np.testing.assert_allclose(alias_pmf(t), w / w.sum(), atol=1e-6)
    assert t.total == pytest.approx(10.0)


def test_alias_table_degenerate():
    t = build_alias_table([5.0])
    np.testing.assert_allclose(alias_pmf(t), [1.0])
    t0 = build_alias_table([0.0, 0.0])
    assert t0.total == 0.0


def test_alias_sampling_histogram(rng_np):
    w = np.array([0.1, 0.5, 0.15, 0.25])
    t = build_alias_table(w)
    n = 40000
    r1 = rng_np.random(n).astype(np.float32)
    r2 = rng_np.random(n).astype(np.float32)
    idx = np.asarray(alias_sample(jnp.asarray(t.prob), jnp.asarray(t.alias), r1, r2))
    hist = np.bincount(idx, minlength=4) / n
    np.testing.assert_allclose(hist, w, atol=0.01)


def test_sobol_table_properties():
    tab = generate_sobol_table(256, 8)
    assert tab.shape == (256, 8) and tab.dtype == np.uint32
    # first dim of an unscrambled Sobol sequence is the van der Corput
    # sequence: stratified — 256 points hit all 256 buckets of width 1/256
    u = tab[:, 0].astype(np.float64) / 2**32
    buckets = np.floor(u * 256).astype(int)
    assert len(np.unique(buckets)) == 256
    # 2D projection (dims 0,1) should be well-stratified in 16x16 cells
    v = tab[:, 1].astype(np.float64) / 2**32
    cells = np.floor(u * 16).astype(int) * 16 + np.floor(v * 16).astype(int)
    assert len(np.unique(cells)) == 256


def test_sampler_lockstep_advance():
    tab = jnp.asarray(np.arange(SOBOL_SAMPLE_NUM * SOBOL_SAMPLE_DIM, dtype=np.uint32))
    s = make_sampler(looper=2, pixel_index=jnp.arange(4))
    assert int(s.ptr) == 2 * SOBOL_SAMPLE_DIM
    r, s2 = sample_1d(tab, s)
    assert r.shape == (4,)
    assert int(s2.ptr) == 2 * SOBOL_SAMPLE_DIM + 1
    # scramble differs per pixel -> values differ
    assert len(np.unique(np.asarray(r))) > 1
    # scramble chain advances
    assert not np.array_equal(np.asarray(s.scramble), np.asarray(s2.scramble))


def test_sampler_uniform_range():
    s = make_sampler(0, jnp.arange(512))
    r4, _ = sample_4d(None, s)  # hash fallback
    r = np.asarray(r4)
    assert (r >= 0).all() and (r < 1).all()
    assert abs(r.mean() - 0.5) < 0.05
