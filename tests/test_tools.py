"""Offline tools: grid converter and majorant analysis."""

import os

import numpy as np


def test_grid_convert_procedural_roundtrip(tmp_path):
    from xraytracer_tpu.tools.grid_convert import main

    out = os.path.join(tmp_path, "g.npy")
    main(["procedural", out, "--res", "16"])
    g = np.load(out)
    assert g.shape == (16, 16, 16) and g.dtype == np.float32
    assert g.max() <= 1.0 and g.min() >= 0.0 and (g > 0).any()


def test_majorant_stats_constant_grid():
    """On a constant grid the block-max majorant is EXACT (efficiency 1)
    and the residual majorant vanishes."""
    from xraytracer_tpu.tools.majorant_stats import chord_integrals

    dens = np.full((16, 16, 16), 0.4, np.float32)
    r = chord_integrals(dens, nb=4, n_chords=200, n_samples=64)
    np.testing.assert_allclose(r["max_majorant"], r["true"], rtol=1e-5)
    assert r["residual"] < 1e-6
    assert r["true"] > 0.0


def test_majorant_stats_orders_majorants():
    """On a structured grid: true <= residual-implied work and
    true <= max-majorant; finer supergrids tighten the max majorant."""
    from xraytracer_tpu.tools.majorant_stats import chord_integrals

    rng = np.random.default_rng(0)
    base = rng.uniform(0.0, 1.0, (4, 4, 4)).astype(np.float32)
    dens = np.kron(base, np.ones((4, 4, 4), np.float32))  # blocky 16^3
    r4 = chord_integrals(dens, nb=4, n_chords=300)
    r8 = chord_integrals(dens, nb=8, n_chords=300)
    assert r4["true"] <= r4["max_majorant"] + 1e-5
    assert r8["max_majorant"] <= r4["max_majorant"] + 1e-5
    assert r4["residual"] <= r4["max_majorant"] + 1e-5
