"""Native host kernels: parity with the pure-Python fallbacks."""

import numpy as np
import pytest


def _synthetic_capture(B=17, K=40, N=9, seed=2):
    rng = np.random.default_rng(seed)
    traj_t = np.sort(rng.uniform(0, 3600.0, (B, K)), axis=1)
    traj_t[:, 0] = 0.0
    traj_y = rng.normal(size=(B, K, N)) * 1000.0
    traj_len = rng.integers(5, K + 1, B).astype(np.int32)
    return traj_t, traj_y, traj_len


@pytest.mark.parametrize("mu,j2,re", [
    (0.0, 0.0, 0.0),                          # plain cubic
    (398600.4418, 0.0, 0.0),                  # quintic, two-body ends
    (398600.4418, 1.08263e-3, 6378.1363),     # quintic, two-body+J2 ends
])
def test_hermite_native_matches_python(mu, j2, re):
    """The cubic (mu=0) and quintic-with-two-body(+J2)-acceleration forms
    of the native kernel match the numpy fallback exactly."""
    from nyx_tpu import native
    from nyx_tpu.mc.results import _hermite_cubic

    if native.lib() is None:
        pytest.skip("no native toolchain")
    traj_t, traj_y, traj_len = _synthetic_capture()
    t_grid = np.linspace(-10.0, 3700.0, 97)  # includes out-of-range clamps
    out = native.hermite_interp_ensemble(traj_t, traj_y, traj_len, t_grid,
                                         mu, j2, re)
    B, K, N = traj_y.shape
    # reference: the per-lane numpy path from Results._interp_all
    expect = np.empty((B, len(t_grid), N))
    for b in range(B):
        k = int(traj_len[b])
        ts = traj_t[b, :k]
        ys = traj_y[b, :k]
        idx = np.clip(np.searchsorted(ts, t_grid), 1, k - 1)
        expect[b] = _hermite_cubic(ts[idx - 1], ts[idx], ys[idx - 1], ys[idx],
                                   t_grid, mu, j2, re)
    np.testing.assert_allclose(out, expect, rtol=1e-12, atol=1e-9)


def test_results_interp_uses_native_consistently():
    """Results.every_value_of is identical with and without the native
    kernel (NYX_NO_NATIVE toggles the fallback)."""
    import os

    from nyx_tpu import Epoch, Frames, Orbit, Spacecraft, native
    from nyx_tpu.dynamics import OrbitalDynamics, SpacecraftDynamics
    from nyx_tpu.mc import MonteCarlo, MvnSpacecraft, StateDispersion
    from nyx_tpu.propagators import IntegratorOptions, Propagator

    if native.lib() is None:
        pytest.skip("no native toolchain")
    epoch = Epoch.from_gregorian_utc(2020, 1, 1)
    orbit = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, epoch,
                            Frames.EME2000)
    mvn = MvnSpacecraft(Spacecraft.from_orbit(orbit),
                        [StateDispersion("sma", 0.5)])
    prop = Propagator.rk89(
        SpacecraftDynamics.new(OrbitalDynamics.two_body(Frames.EME2000)),
        IntegratorOptions(),
    )
    res = MonteCarlo(mvn, seed=5).run_until_epoch(
        prop, None, epoch + 5400.0, 32, n_capture=256
    )
    ts, vals_nat = res.every_value_of("sma", 300.0)
    # force the Python fallback path
    saved = native._LIB, native._TRIED
    try:
        native._LIB, native._TRIED = None, True
        ts2, vals_py = res.every_value_of("sma", 300.0)
    finally:
        native._LIB, native._TRIED = saved
    np.testing.assert_array_equal(ts, ts2)
    np.testing.assert_allclose(vals_nat, vals_py, rtol=1e-12, atol=1e-10)
