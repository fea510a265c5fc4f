"""YAML config round-trips (ConfigRepr, io/mod.rs:182) against the
reference's own fixture files in /root/reference/data/03_tests/config/,
plus the polyfit module."""

import numpy as np
import pytest

REF_CFG = "/root/reference/data/03_tests/config"


class TestGroundStationYaml:
    def test_load_reference_single(self):
        from nyx_tpu.od import GroundStation

        gs = GroundStation.load(f"{REF_CFG}/one_ground_station.yaml")
        assert gs.name == "Demo ground station"
        assert abs(gs.latitude_deg - 2.3522) < 1e-9
        assert abs(gs.longitude_deg - 48.8566) < 1e-9
        assert abs(gs.height_km - 0.4) < 1e-9
        assert gs.elevation_mask_deg == 5.0
        assert gs.measurement_types == ("range_km", "doppler_km_s")
        assert gs.integration_time_s == 60.0
        assert gs.stochastic_noises["range_km"].bias.process_noise == 5.0e-3
        assert gs.stochastic_noises["range_km"].bias.tau_s == 24 * 3600.0

    def test_load_reference_many(self):
        from nyx_tpu.od import GroundStation

        stations = GroundStation.load_many(f"{REF_CFG}/many_ground_stations.yaml")
        assert len(stations) == 2
        names = {g.name for g in stations}
        assert names == {"Demo ground station", "Canberra"}
        canberra = [g for g in stations if g.name == "Canberra"][0]
        assert abs(canberra.latitude_deg + 35.398333) < 1e-9

    def test_roundtrip(self, tmp_path):
        from nyx_tpu.od import GroundStation

        gs = GroundStation.dss65_madrid(12.0)
        gs.integration_time_s = 30.0
        path = tmp_path / "gs.yaml"
        gs.save(path)
        back = GroundStation.load(path)
        assert back.name == gs.name
        assert abs(back.latitude_deg - gs.latitude_deg) < 1e-12
        assert back.elevation_mask_deg == 12.0
        assert back.integration_time_s == 30.0
        assert back.stochastic_noises.keys() == gs.stochastic_noises.keys()
        for k in gs.stochastic_noises:
            assert (
                back.stochastic_noises[k].covariance()
                == gs.stochastic_noises[k].covariance()
            )


class TestSpacecraftYaml:
    def test_load_reference_spacecraft(self):
        from nyx_tpu.io.config import load_spacecraft

        sc = load_spacecraft(f"{REF_CFG}/spacecraft.yaml")
        assert abs(sc.orbit.r_km[0] + 9042.862234) < 1e-9
        assert sc.prop_mass_kg == 50.0
        assert sc.dry_mass_kg == 50.0
        assert sc.cd == 2.2
        assert sc.drag_area_m2 == 0.95
        assert sc.thruster is not None and sc.thruster.isp_s == 300.0
        assert sc.epoch.to_gregorian("UTC")[0] == 2018

    def test_roundtrip(self, tmp_path):
        from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
        from nyx_tpu.io.config import load_spacecraft, save_spacecraft

        orbit = Orbit.keplerian(
            8000.0, 0.01, 30.0, 40.0, 50.0, 60.0,
            Epoch.from_gregorian_utc(2022, 3, 4, 5, 6, 7.0), Frames.EME2000,
        )
        sc = Spacecraft.from_orbit(orbit).with_srp(2.5, 1.9).with_drag(1.5, 2.1)
        path = tmp_path / "sc.yaml"
        save_spacecraft(sc, path)
        back = load_spacecraft(path)
        assert np.abs(back.orbit.r_km - sc.orbit.r_km).max() < 1e-6
        assert np.abs(back.orbit.v_km_s - sc.orbit.v_km_s).max() < 1e-9
        assert back.cr == 1.9 and back.srp_area_m2 == 2.5


class TestTrkConfigYaml:
    def test_load_reference_named(self):
        from nyx_tpu.io.config import load_trk_configs

        cfgs = load_trk_configs(f"{REF_CFG}/tracking_cfg.yaml")
        assert set(cfgs) == {"Demo ground station", "Canberra"}
        c = cfgs["Canberra"]
        assert c.sampling_s == 1.0
        assert c.scheduler.handoff == "eager"
        assert c.scheduler.min_samples == 10
        assert c.scheduler.sample_alignment_s == 10.0

    def test_load_reference_single(self):
        from nyx_tpu.io.config import load_trk_configs

        cfgs = load_trk_configs(f"{REF_CFG}/trk_cfg_od_val.yaml")
        c = cfgs[""]
        assert c.sampling_s == 10.0
        assert c.scheduler.handoff == "overlap"


class TestPolyfit:
    def test_polynomial_eval_deriv(self):
        from nyx_tpu.polyfit import CommonPolynomial, Polynomial

        p = Polynomial((1.0, 2.0, 3.0))  # 1 + 2t + 3t^2
        assert p.eval(0.0) == 1.0
        assert p.eval(2.0) == 1 + 4 + 12
        assert p.deriv(2.0) == 2 + 12.0
        assert p.derivative().coefficients == (2.0, 6.0)
        q = CommonPolynomial.Quadratic(3.0, 2.0, 1.0)
        assert q.coefficients == p.coefficients
        lin = CommonPolynomial.Linear(0.001, 0.1)
        assert abs(lin.eval(50.0) - 0.15) < 1e-15

    def test_lagrange_fit(self):
        from nyx_tpu.polyfit import lagrange

        xs = [0.0, 1.0, 2.0, 3.0]
        ys = [2.0 - 3 * x + x**3 for x in xs]
        p = lagrange(xs, ys)
        for t in np.linspace(-1, 4, 13):
            assert abs(p.eval(t) - (2.0 - 3 * t + t**3)) < 1e-9

    def test_hermite_eval(self):
        from nyx_tpu.polyfit import hermite_eval

        # f = sin, samples of value and derivative
        xs = np.linspace(0.0, 1.0, 5)
        val, dval = hermite_eval(xs, np.sin(xs), np.cos(xs), 0.41)
        assert abs(float(val) - np.sin(0.41)) < 1e-10
        assert abs(float(dval) - np.cos(0.41)) < 1e-7


class TestDer:
    """ASN.1 DER state encoding (cosmic/spacecraft.rs:700-786 Encode/
    Decode parity; X.690 canonical base-2 REALs)."""

    def test_real_canonical_roundtrip(self):
        import math

        from nyx_tpu.io.der import DerReader, encode_real

        for x in [0.0, -0.0, 1.0, -1.0, 1 / 3, math.pi, 6.02e23, -1.6e-19,
                  2.0**-1030, float("inf"), float("-inf"), 7136.635]:
            y = DerReader(encode_real(x)).read_real()
            assert y == x and math.copysign(1, y) == math.copysign(1, x)
        assert math.isnan(DerReader(encode_real(float("nan"))).read_real())

    def test_spacecraft_roundtrip_bit_exact(self):
        from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
        from nyx_tpu.cosmic.spacecraft import Thruster
        from nyx_tpu.io.der import spacecraft_from_der, spacecraft_to_der

        e = Epoch.from_gregorian_utc(2021, 3, 4, 12, 1, 2.5)
        o = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, e,
                            Frames.EME2000)
        sc = Spacecraft.from_thruster(
            o, 100.0, 50.0, Thruster(thrust_N=0.5, isp_s=3000.0)
        )
        back = spacecraft_from_der(spacecraft_to_der(sc))
        np.testing.assert_array_equal(back.orbit.r_km, sc.orbit.r_km)
        np.testing.assert_array_equal(back.orbit.v_km_s, sc.orbit.v_km_s)
        assert back.epoch.to_tai_seconds() == sc.epoch.to_tai_seconds()
        assert (back.cr, back.cd, back.prop_mass_kg) == (sc.cr, sc.cd, 50.0)
        assert back.thruster.isp_s == 3000.0
        assert back.mode == sc.mode
        # encoding is deterministic (DER canonical requirement)
        assert spacecraft_to_der(sc) == spacecraft_to_der(back)

    def test_measurement_type_enum_parity(self):
        """Discriminants match types.rs:36-57 repr values."""
        from nyx_tpu.io.der import MEASUREMENT_TYPE_ENUM

        assert MEASUREMENT_TYPE_ENUM["range_km"] == 0
        assert MEASUREMENT_TYPE_ENUM["doppler_km_s"] == 1
        assert MEASUREMENT_TYPE_ENUM["transmit_freq_rate"] == 9
        assert MEASUREMENT_TYPE_ENUM["z"] == 8


DHALL_CFG = "/root/reference/data/02_config"


class TestDhall:
    """Dhall front-end against the reference's own fixtures
    (data/02_config/*.dhall, serde_dhall output of config.rs:57-133)."""

    def test_prop_config(self):
        from nyx_tpu.dynamics.sequence import load_dhall_propagator

        pc = load_dhall_propagator(f"{DHALL_CFG}/prop_config.dhall")
        assert pc.method == "rk89"
        assert pc.options.init_step_s == 60.0
        assert pc.options.min_step_s == 1e-3
        assert pc.options.max_step_s == 2700.0
        assert pc.options.tolerance == 1e-12
        assert pc.options.attempts == 50
        assert pc.dynamics.point_masses == (399, 301)
        assert pc.dynamics.drag == "stdatm"
        assert pc.dynamics.solar_pressure is False
        gf = pc.dynamics.gravity_field
        assert (gf["degree"], gf["order"], gf["gunzipped"]) == (21, 21, True)
        assert "EGM2008" in gf["path"]

    def test_full_sequence(self):
        from nyx_tpu.dynamics.sequence import load_dhall_sequence

        seq = load_dhall_sequence(f"{DHALL_CFG}/full_seq.dhall")
        assert set(seq.propagators) == {"Near Earth", "Cislunar"}
        assert seq.thruster_sets["BiProp"].thrust_N == 25.0
        assert seq.thruster_sets["BiProp"].isp_s == 300.0
        phases = sorted(seq.seq.items(), key=lambda kv: kv[0].to_tai_seconds())
        assert len(phases) == 4
        assert phases[-1][1].terminate
        # phase 2 applies a staging event with an impulsive maneuver
        staging = phases[1][1]
        assert staging.on_entry.kind == "staging"
        np.testing.assert_allclose(
            staging.on_entry.impulsive_maneuver.dv_km_s, [2.5e-5, 0.0, 0.0]
        )
        # phase 3 is a guided finite burn using the BiProp thruster
        burn = phases[2][1]
        assert burn.guidance["thruster_model"] == "BiProp"
        law = burn.guidance["law"]
        assert law.thrust_prct == 1.0
        assert law.duration_s == 45.0
        seq.validate()

    def test_guidance_config(self):
        from nyx_tpu.dynamics.sequence import _dhall_phase
        from nyx_tpu.io import dhall

        ph = _dhall_phase(dhall.load(f"{DHALL_CFG}/guid_config.dhall"))
        assert ph.name == "Finite Maneuver"
        assert ph.propagator == "Cislunar"
        law = ph.guidance["law"]
        np.testing.assert_allclose(np.asarray(law.vector), [1.0, 0.0, 0.0])
        assert law.frame == "vnc"


class TestToml:
    def test_integrator_options_roundtrip(self, tmp_path):
        """TOML round-trip of IntegratorOptions (options.rs:253-260)."""
        from nyx_tpu.io.config import (
            load_integrator_options,
            save_integrator_options,
        )
        from nyx_tpu.propagators import IntegratorOptions
        from nyx_tpu.propagators.error_ctrl import ErrorControl

        opts = IntegratorOptions(
            init_step_s=30.0, min_step_s=0.01, max_step_s=600.0,
            tolerance=1e-10, attempts=40, error_ctrl=ErrorControl.RSSStep,
        )
        p = tmp_path / "opts.toml"
        save_integrator_options(opts, p)
        back = load_integrator_options(p)
        assert back.init_step_s == 30.0
        assert back.min_step_s == 0.01
        assert back.max_step_s == 600.0
        assert back.tolerance == 1e-10
        assert back.attempts == 40
        assert back.error_ctrl is ErrorControl.RSSStep

    def test_ground_stations_toml_roundtrip(self, tmp_path):
        from nyx_tpu.io.config import load_ground_stations, save_ground_stations
        from nyx_tpu.od import GroundStation

        stations = [
            GroundStation.dss65_madrid(10.0),
            GroundStation.dss34_canberra(5.0),
        ]
        p = tmp_path / "stations.toml"
        save_ground_stations(stations, p)
        back = load_ground_stations(p)
        assert [g.name for g in back] == [g.name for g in stations]
        for a, b in zip(back, stations):
            assert a.latitude_deg == b.latitude_deg
            assert a.longitude_deg == b.longitude_deg
            assert a.elevation_mask_deg == b.elevation_mask_deg

    def test_spacecraft_toml_roundtrip(self, tmp_path):
        from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
        from nyx_tpu.io.config import load_spacecraft, save_spacecraft

        e = Epoch.from_gregorian_utc(2021, 3, 4)
        o = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, e,
                            Frames.EME2000)
        sc = Spacecraft.new(o, 100.0, 20.0, 2.0, 1.8, 1.5, 2.2)
        p = tmp_path / "sc.toml"
        save_spacecraft(sc, p)
        back = load_spacecraft(p)
        np.testing.assert_allclose(back.orbit.r_km, np.asarray(sc.orbit.r_km))
        np.testing.assert_allclose(back.orbit.v_km_s, np.asarray(sc.orbit.v_km_s))
        assert back.prop_mass_kg == sc.prop_mass_kg
