"""Guidance laws: Ruggiero locally-optimal low thrust, finite-burn maneuvers.

Counterpart of the reference's `dynamics/guidance/` (GuidanceLaw trait
mod.rs:111-127, Ruggiero ruggiero.rs:40-510, Maneuver mnvr.rs:39-418,
ImpulsiveManeuver mnvr.rs:39-52). TPU-native design: each law provides two
pure, batched, branchless JAX functions consumed by the jitted RK kernel —

  direction_and_throttle(ctx, t_tdb, y9, mode) -> (u_inertial [B,3], throttle [B])
  next_mode(ctx, t_tdb, y9, mode) -> mode' [B]

Mode transitions are `where`-masks over the lane axis (the batched analogue
of the reference's per-state mutable `GuidanceLaw::next`, applied by the
propagator after every accepted step exactly as Dynamics::finally does).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..cosmic.orbit import keplerian_from_cartesian, rcn_dcm, ric_dcm, vnc_dcm
from ..cosmic.spacecraft import GuidanceMode, Thruster
from ..constants import NAIF, RADIUS_BY_NAIF
from ..md.objective import Objective
from ..md.param import StateParameter
from ..time import Epoch
from ..errors import GuidanceConfigError

HALF_PI = np.pi / 2.0


# ---------------------------------------------------------------------------
# Angle/vector helpers (guidance/mod.rs:129-149)
# ---------------------------------------------------------------------------
def unit_vector_from_plane_angles(alpha, beta):
    """In-plane angle alpha, out-of-plane angle beta -> unit vector in the
    local (RCN) frame (mod.rs:129-135)."""
    return jnp.stack(
        [
            jnp.sin(alpha) * jnp.cos(beta),
            jnp.cos(alpha) * jnp.cos(beta),
            jnp.sin(beta),
        ],
        axis=-1,
    )


def plane_angles_from_unit_vector(vhat):
    """(alpha, beta) radians from a unit vector (mod.rs:138-140)."""
    return jnp.arctan2(vhat[..., 1], vhat[..., 0]), jnp.arcsin(vhat[..., 2])


def unit_vector_from_ra_dec(alpha, delta):
    """Right ascension / declination -> unit vector (mod.rs:143-149)."""
    return jnp.stack(
        [
            jnp.cos(delta) * jnp.cos(alpha),
            jnp.cos(delta) * jnp.sin(alpha),
            jnp.sin(delta),
        ],
        axis=-1,
    )


def ra_dec_from_unit_vector(vhat):
    return jnp.arctan2(vhat[..., 1], vhat[..., 0]), jnp.arcsin(vhat[..., 2])


class LocalFrame:
    """Local orbital frame tags (guidance/mod.rs LocalFrame)."""

    Inertial = "inertial"
    RIC = "ric"
    VNC = "vnc"
    RCN = "rcn"

    @staticmethod
    def dcm_to_inertial(frame: str, r, v):
        """[..., 3, 3] DCM local -> inertial (transpose of the row-frames)."""
        if frame == LocalFrame.Inertial:
            eye = jnp.broadcast_to(jnp.eye(3), r.shape[:-1] + (3, 3))
            return eye
        dcm = {
            LocalFrame.RIC: ric_dcm,
            LocalFrame.VNC: vnc_dcm,
            LocalFrame.RCN: rcn_dcm,
        }[frame](r, v)
        return jnp.swapaxes(dcm, -1, -2)


class GuidanceLaw:
    """Interface contract (guidance/mod.rs:111-127). Concrete laws override
    the two batched hooks; `required_bodies` lists ephemeris bodies the law
    needs in the EomContext (e.g. the Sun for eclipse gating)."""

    def direction_and_throttle(self, ctx, t_tdb, y9, mode):
        raise NotImplementedError

    def next_mode(self, ctx, t_tdb, y9, mode):
        return mode

    def required_bodies(self) -> Tuple[int, ...]:
        return ()


# ---------------------------------------------------------------------------
# Ruggiero (ruggiero.rs:40-510)
# ---------------------------------------------------------------------------
_RUGGIERO_PARAMS = (
    StateParameter.SMA,
    StateParameter.ECC,
    StateParameter.INC,
    StateParameter.RAAN,
    StateParameter.AOP,
)


@dataclass
class Ruggiero(GuidanceLaw):
    """Closed-loop locally-optimal low-thrust law (IEPC 2011-102), the
    reference's `Ruggiero` (ruggiero.rs:40-46). Objectives over up to five
    Keplerian elements (sma km, ecc, inc/raan/aop deg) with per-element
    efficiency thresholds and an optional coast-in-eclipse gate."""

    objectives: Tuple[Objective, ...]
    init_values: Tuple[float, ...]  # objective parameters at the initial state
    eta_thresholds: Tuple[float, ...] = ()
    max_eclipse_prct: Optional[float] = None
    shadow_bodies: Tuple[int, ...] = (NAIF.EARTH,)
    #: read the per-objective efficiency thresholds from
    #: `ctx.guidance_params` ([n_obj] or per-lane [B, n_obj]) instead of
    #: the static `eta_thresholds` tuple. This makes the thresholds a
    #: traced leaf: a whole optimizer population (the reference's
    #: raise_optim.rs NSGA2 individuals) propagates as ONE batched
    #: dispatch with per-lane thresholds, and new generations re-run the
    #: same compiled program with new values — no retrace.
    ctx_eta_thresholds: bool = False

    # -- constructors (ruggiero.rs:54-152) -----------------------------
    @classmethod
    def simple(cls, objectives: Sequence[Objective], initial) -> "Ruggiero":
        return cls.from_thresholds(objectives, [0.0] * len(objectives), initial)

    @classmethod
    def from_thresholds(cls, objectives, eta_thresholds, initial) -> "Ruggiero":
        objectives = tuple(objectives)
        if not 1 <= len(objectives) <= 5:
            raise GuidanceConfigError(
                f"must provide between 1 and 5 objectives, got {len(objectives)}"
            )
        for obj in objectives:
            if obj.parameter not in _RUGGIERO_PARAMS:
                raise GuidanceConfigError(
                    f"objective {obj.parameter} not supported in Ruggiero"
                )
        init_values = tuple(
            float(initial.orbit.value(obj.parameter)) for obj in objectives
        )
        return cls(objectives, init_values, tuple(eta_thresholds))

    @classmethod
    def from_ctx_thresholds(cls, objectives, initial) -> "Ruggiero":
        """Thresholds supplied at propagation time through
        `ctx.guidance_params` (see `ctx_eta_thresholds`); the batched
        analogue of the reference's `Ruggiero::from_ηthresholds`
        (raise_optim.rs:181) for population-per-lane optimization."""
        law = cls.from_thresholds(objectives, [0.0] * len(objectives), initial)
        law.ctx_eta_thresholds = True
        return law

    @classmethod
    def from_max_eclipse(cls, objectives, initial, max_eclipse,
                         shadow_bodies=(NAIF.EARTH,)) -> "Ruggiero":
        law = cls.simple(objectives, initial)
        law.max_eclipse_prct = max_eclipse
        law.shadow_bodies = tuple(shadow_bodies)
        return law

    def required_bodies(self):
        if self.max_eclipse_prct is None:
            return ()
        return (NAIF.SUN,) + tuple(b for b in self.shadow_bodies)

    # ------------------------------------------------------------------
    @staticmethod
    def _osc_value(param: str, kep):
        """Objective-parameter value in the reference's units (km / deg)."""
        if param == StateParameter.SMA:
            return kep["sma"]
        if param == StateParameter.ECC:
            return kep["ecc"]
        return jnp.rad2deg(kep[param])  # inc / raan / aop

    @staticmethod
    def efficiency(param: str, kep, mu, vmag):
        """η ∈ [0,1] of correcting `param` at the osculating orbit
        (ruggiero.rs:159-214)."""
        e = kep["ecc"]
        ta = kep["ta"]
        w = kep["aop"]
        if param == StateParameter.SMA:
            a = kep["sma"]
            return vmag * jnp.sqrt((a * (1.0 - e)) / (mu * (1.0 + e)))
        if param == StateParameter.ECC:
            num = 1.0 + 2.0 * e * jnp.cos(ta) + jnp.cos(ta) ** 2
            return num / (2.0 * (1.0 + e * jnp.cos(ta)))
        if param == StateParameter.INC:
            num = jnp.abs(jnp.cos(w + ta)) * (
                jnp.sqrt(1.0 - e**2 * jnp.sin(w) ** 2) - e * jnp.abs(jnp.cos(w))
            )
            return num / (1.0 + e * jnp.cos(ta))
        if param == StateParameter.RAAN:
            num = jnp.abs(jnp.sin(w + ta)) * (
                jnp.sqrt(1.0 - e**2 * jnp.cos(w) ** 2) - e * jnp.abs(jnp.sin(w))
            )
            return num / (1.0 + e * jnp.cos(ta))
        return jnp.ones_like(e)  # AoP

    def _weight(self, i, kep, mu, vmag, thr=None):
        """Correction weight for objective i, zero when achieved or below the
        efficiency threshold (ruggiero.rs:216-240). `thr` overrides the
        static threshold with a traced ([..] broadcastable) value."""
        obj = self.objectives[i]
        init = self.init_values[i]
        target = obj.desired_value
        tol = obj.tolerance
        osc = self._osc_value(obj.parameter, kep)
        eta = self.efficiency(obj.parameter, kep, mu, vmag)
        threshold = thr if thr is not None else (
            self.eta_thresholds[i] if i < len(self.eta_thresholds) else 0.0
        )
        denom_init = init + tol if abs(init - target) < tol else init
        weight = (target - osc) / abs(target - denom_init)
        # Smooth ramp across [tol, 2 tol] instead of the reference's hard
        # zero at |err| < tol (ruggiero.rs:216-240): a discontinuous thrust
        # cut inside an RK step collapses the adaptive step size to
        # min_step when an element oscillates at the tolerance boundary
        # (continuous-time integration artifact the reference avoids only
        # by per-step scalar evaluation).
        err = jnp.abs(osc - target)
        gate = jnp.clip(err / tol - 1.0, 0.0, 1.0)
        gate = jnp.where(eta < threshold, 0.0, gate)
        return weight * gate

    def _steering_rcn(self, kep, mu, rmag, vmag, thresholds=None):
        """Unit steering vector in the RCN frame (ruggiero.rs direction)."""
        e = kep["ecc"]
        ta = kep["ta"]
        inc = kep["inc"]
        aop = kep["aop"]
        # eccentric anomaly (elliptic)
        ea = jnp.arctan2(jnp.sqrt(1.0 - e**2) * jnp.sin(ta), e + jnp.cos(ta))
        steering = 0.0
        for i, obj in enumerate(self.objectives):
            thr = None if thresholds is None else thresholds[..., i]
            w = self._weight(i, kep, mu, vmag, thr=thr)
            p = obj.parameter
            if p == StateParameter.SMA:
                alpha = jnp.arctan2(e * jnp.sin(ta), 1.0 + e * jnp.cos(ta))
                u = unit_vector_from_plane_angles(alpha, jnp.zeros_like(alpha))
            elif p == StateParameter.ECC:
                alpha = jnp.arctan2(jnp.sin(ta), jnp.cos(ta) + jnp.cos(ea))
                u = unit_vector_from_plane_angles(alpha, jnp.zeros_like(alpha))
            elif p == StateParameter.INC:
                beta = HALF_PI * jnp.sign(jnp.cos(ta + aop))
                u = unit_vector_from_plane_angles(jnp.zeros_like(beta), beta)
            elif p == StateParameter.RAAN:
                beta = HALF_PI * jnp.sign(jnp.sin(ta + aop))
                u = unit_vector_from_plane_angles(jnp.zeros_like(beta), beta)
            else:  # AOP (ruggiero.rs:362-388)
                oe2 = 1.0 - e**2
                e3 = e**3
                sqrt_val = jnp.sqrt(0.25 * (oe2 / e3) ** 2 + 1.0 / 27.0)
                opti_ta_alpha = jnp.arccos(
                    jnp.clip(
                        jnp.cbrt(oe2 / (2.0 * e3) + sqrt_val)
                        - jnp.cbrt(-oe2 / (2.0 * e3) + sqrt_val)
                        - 1.0 / e,
                        -1.0,
                        1.0,
                    )
                )
                opti_ta_beta = jnp.arccos(
                    jnp.clip(-e * jnp.cos(aop), -1.0, 1.0)
                ) - aop
                in_plane = jnp.abs(ta - opti_ta_alpha) < jnp.abs(ta - opti_ta_beta)
                pp = kep["sma"] * oe2
                alpha = jnp.arctan2(-pp * jnp.cos(ta), (pp + rmag) * jnp.sin(ta))
                u_in = unit_vector_from_plane_angles(alpha, jnp.zeros_like(alpha))
                beta = HALF_PI * jnp.sign(-jnp.sin(ta + aop)) * jnp.cos(inc)
                u_out = unit_vector_from_plane_angles(jnp.zeros_like(beta), beta)
                u = jnp.where(in_plane[..., None], u_in, u_out)
            steering = steering + u * w[..., None]
        nrm = jnp.linalg.norm(steering, axis=-1, keepdims=True)
        return jnp.where(nrm > 0.0, steering / jnp.where(nrm > 0.0, nrm, 1.0), 0.0)

    # -- the batched GuidanceLaw hooks ---------------------------------
    def direction_and_throttle(self, ctx, t_tdb, y9, mode):
        r = y9[..., 0:3]
        v = y9[..., 3:6]
        mu = ctx.frame.mu
        kep = keplerian_from_cartesian(r, v, mu)
        rmag = jnp.linalg.norm(r, axis=-1)
        vmag = jnp.linalg.norm(v, axis=-1)
        thresholds = None
        if self.ctx_eta_thresholds:
            if ctx.guidance_params is None:
                raise GuidanceConfigError(
                    "Ruggiero.from_ctx_thresholds needs ctx.guidance_params "
                    "([n_obj] or [B, n_obj] efficiency thresholds)"
                )
            thresholds = jnp.asarray(ctx.guidance_params)
        steer_rcn = self._steering_rcn(kep, mu, rmag, vmag, thresholds)
        dcm = LocalFrame.dcm_to_inertial(LocalFrame.RCN, r, v)
        u = jnp.einsum("...ij,...j->...i", dcm, steer_rcn)
        thrusting = mode == GuidanceMode.Thrust
        nrm = jnp.linalg.norm(steer_rcn, axis=-1)
        throttle = jnp.where(thrusting & (nrm > 0.0), 1.0, 0.0)
        return jnp.where(thrusting[..., None], u, 0.0), throttle

    def _achieved_mask(self, kep):
        ok = True
        for i, obj in enumerate(self.objectives):
            osc = self._osc_value(obj.parameter, kep)
            err = obj.desired_value - (
                obj.multiplicative_factor * osc + obj.additive_factor
            )
            if obj.parameter in StateParameter.ANGLES_DEG:
                err = (err + 180.0) % 360.0 - 180.0
            ok = ok & (jnp.abs(err) <= obj.tolerance)
        return ok

    def next_mode(self, ctx, t_tdb, y9, mode):
        """Thrust until all objectives achieved; optional eclipse coast
        (ruggiero.rs:425-455)."""
        r = y9[..., 0:3]
        v = y9[..., 3:6]
        kep = keplerian_from_cartesian(r, v, ctx.frame.mu)
        achieved = self._achieved_mask(kep)
        want = jnp.where(achieved, GuidanceMode.Coast, GuidanceMode.Thrust)
        if self.max_eclipse_prct is not None:
            from ..cosmic.eclipse import occultation_percentage

            sun_idx = ctx.body_index(NAIF.SUN)
            r_sun = ctx.table.position(sun_idx, t_tdb) - r
            pct = 0.0
            for body in self.shadow_bodies:
                if body == ctx.frame.center:
                    r_occ = -r
                else:
                    r_occ = ctx.table.position(ctx.body_index(body), t_tdb) - r
                pct = jnp.maximum(
                    pct,
                    occultation_percentage(r_sun, r_occ, RADIUS_BY_NAIF[body]),
                )
            want = jnp.where(
                (~achieved) & (pct > self.max_eclipse_prct),
                GuidanceMode.Coast,
                want,
            )
        inhibited = mode == GuidanceMode.Inhibit
        return jnp.where(inhibited, mode, want.astype(mode.dtype))

    # -- host-side status (ruggiero.rs:243-256) -------------------------
    def achieved(self, sc) -> bool:
        for obj in self.objectives:
            val = float(sc.orbit.value(obj.parameter))
            if not obj.assess_raw(val)[0]:
                return False
        return True

    def status(self, sc):
        out = []
        for obj in self.objectives:
            val = float(sc.orbit.value(obj.parameter))
            ok, err = obj.assess_raw(val)
            out.append(f"{obj.parameter} achieved: {ok}\t error = {err:.5f}")
        return out


# ---------------------------------------------------------------------------
# Finite-burn maneuvers (mnvr.rs:39-418)
# ---------------------------------------------------------------------------
@dataclass
class ImpulsiveManeuver:
    """Instantaneous Δv in a local frame (mnvr.rs:39-52)."""

    dv_km_s: np.ndarray
    local_frame: str = LocalFrame.VNC

    def apply(self, sc):
        """Returns the spacecraft after the instantaneous Δv."""
        r = jnp.asarray(sc.orbit.r_km)
        v = jnp.asarray(sc.orbit.v_km_s)
        dcm = LocalFrame.dcm_to_inertial(self.local_frame, r, v)
        dv = np.asarray(dcm @ jnp.asarray(self.dv_km_s, dtype=jnp.float64))
        return sc.with_dv(dv)


@dataclass
class Maneuver(GuidanceLaw):
    """A single finite burn between two epochs (mnvr.rs:67-92). Direction is
    either a fixed vector in `frame` or azimuth/elevation polynomials of time
    since burn start (MnvrRepr, mnvr.rs:131-140). The polynomial coefficients
    are stored most-significant-first (numpy polyval order)."""

    start: Epoch
    end: Epoch
    thrust_prct: float = 1.0
    vector: Optional[np.ndarray] = None  # direction at burn start in `frame`
    azimuth_poly: Optional[np.ndarray] = None  # alpha(t) rad, t since start
    elevation_poly: Optional[np.ndarray] = None
    frame: str = LocalFrame.VNC
    #: optional vector-representation time dependence (thrust targeters):
    #: u(t) = normalize(vector + vector_rate*t + vector_accel*t^2)
    vector_rate: Optional[np.ndarray] = None
    vector_accel: Optional[np.ndarray] = None

    def __post_init__(self):
        self._start_tdb = self.start.to_tdb_seconds()
        self._end_tdb = self.end.to_tdb_seconds()
        if self.vector is None and self.azimuth_poly is None:
            raise GuidanceConfigError("Maneuver needs a vector or angle polynomials")

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_impulsive(cls, dt: Epoch, vector, frame=LocalFrame.VNC) -> "Maneuver":
        """An (almost) impulsive maneuver: 1 ms at full throttle
        (mnvr.rs:183-186)."""
        return cls.from_time_invariant(dt, dt + 1e-3, 1.0, vector, frame)

    @classmethod
    def from_time_invariant(cls, start, end, thrust_lvl, vector, frame):
        return cls(
            start, end, thrust_lvl,
            vector=np.asarray(vector, dtype=np.float64), frame=frame,
        )

    @classmethod
    def constant_direction(cls, start, end, thrust_lvl, alpha_rad, delta_rad,
                           frame=LocalFrame.VNC):
        return cls(
            start, end, thrust_lvl,
            azimuth_poly=np.array([alpha_rad]),
            elevation_poly=np.array([delta_rad]),
            frame=frame,
        )

    @property
    def duration_s(self) -> float:
        return self._end_tdb - self._start_tdb

    def vector_at(self, t_tdb):
        """Direction (in `frame`) at an absolute TDB time (mnvr.rs:205-216)."""
        if self.vector is not None:
            vec = jnp.asarray(self.vector)
            if self.vector_rate is not None or self.vector_accel is not None:
                tau = t_tdb - self._start_tdb
                if self.vector_rate is not None:
                    vec = vec + jnp.asarray(self.vector_rate) * tau
                if self.vector_accel is not None:
                    vec = vec + jnp.asarray(self.vector_accel) * tau**2
            return vec / jnp.linalg.norm(vec)
        t = t_tdb - self._start_tdb
        alpha = jnp.polyval(jnp.asarray(self.azimuth_poly), t)
        delta = jnp.polyval(jnp.asarray(self.elevation_poly), t)
        return unit_vector_from_ra_dec(alpha, delta)

    # -- batched GuidanceLaw hooks ---------------------------------------
    def direction_and_throttle(self, ctx, t_tdb, y9, mode):
        r = y9[..., 0:3]
        v = y9[..., 3:6]
        u_local = self.vector_at(t_tdb)
        dcm = LocalFrame.dcm_to_inertial(self.frame, r, v)
        u = jnp.einsum("...ij,...j->...i", dcm, jnp.broadcast_to(u_local, r.shape))
        # hybrid gate: thrust when the stage time is in the window OR the
        # mode latched Thrust. The time term catches a burn lying inside
        # one long coast step (the latch alone would skip it); the latch
        # keeps stages probing past the step end (RK89 has c=4/3 > 1)
        # thrusting near the burn edges, which keeps the constant-mdot
        # quadrature exact for steps inside the burn.
        in_burn = (t_tdb >= self._start_tdb) & (t_tdb < self._end_tdb)
        thrusting = (
            jnp.broadcast_to(in_burn, jnp.shape(mode))
            | (mode == GuidanceMode.Thrust)
        ) & (mode != GuidanceMode.Inhibit)
        throttle = jnp.where(thrusting, self.thrust_prct, 0.0)
        return jnp.where(thrusting[..., None], u, 0.0), throttle

    def next_mode(self, ctx, t_tdb, y9, mode):
        """Thrust inside [start, end), coast outside (mnvr.rs:392-399; we use
        a half-open window so a propagation resumed exactly at the burn end
        does not thrust for one more step)."""
        in_burn = (t_tdb >= self._start_tdb) & (t_tdb < self._end_tdb)
        want = jnp.where(in_burn, GuidanceMode.Thrust, GuidanceMode.Coast)
        inhibited = mode == GuidanceMode.Inhibit
        want = jnp.broadcast_to(want, jnp.shape(mode))
        return jnp.where(inhibited, mode, want.astype(mode.dtype))

    def __str__(self):
        return (
            f"Finite burn @ {100.0*self.thrust_prct:.2f}% from {self.start} "
            f"for {self.duration_s:.3f} s in {self.frame}"
        )


@dataclass
class ManeuverSequence(GuidanceLaw):
    """Several non-overlapping finite burns handled as one guidance law."""

    maneuvers: Tuple[Maneuver, ...]

    def __post_init__(self):
        self.maneuvers = tuple(
            sorted(self.maneuvers, key=lambda m: m._start_tdb)
        )
        frames = {m.frame for m in self.maneuvers}
        if len(frames) != 1:
            raise GuidanceConfigError("all maneuvers in a sequence must share a frame")

    def direction_and_throttle(self, ctx, t_tdb, y9, mode):
        u = jnp.zeros_like(y9[..., 0:3])
        throttle = jnp.zeros_like(y9[..., 0])
        for m in self.maneuvers:
            in_burn = (t_tdb >= m._start_tdb) & (t_tdb <= m._end_tdb)
            um, tm = m.direction_and_throttle(ctx, t_tdb, y9, mode)
            u = jnp.where(in_burn[..., None] if jnp.ndim(in_burn) else in_burn, um, u)
            throttle = jnp.where(in_burn, tm, throttle)
        return u, throttle

    def next_mode(self, ctx, t_tdb, y9, mode):
        in_any = False
        for m in self.maneuvers:
            in_any = in_any | ((t_tdb >= m._start_tdb) & (t_tdb < m._end_tdb))
        want = jnp.where(in_any, GuidanceMode.Thrust, GuidanceMode.Coast)
        inhibited = mode == GuidanceMode.Inhibit
        want = jnp.broadcast_to(want, jnp.shape(mode))
        return jnp.where(inhibited, mode, want.astype(mode.dtype))


# ---------------------------------------------------------------------------
# Kluever blended control law (kluever.rs:39-310)
# ---------------------------------------------------------------------------
@dataclass
class Kluever(GuidanceLaw):
    """Weighted-objective blended low-thrust law (kluever.rs:39-48).

    Steering angles alpha/beta are blended over the weighted objectives
    (sma, ecc, inc, raan supported), computed in the RCN frame.
    """

    objectives: Tuple[Objective, ...]
    weights: Tuple[float, ...]
    max_eclipse_prct: Optional[float] = None
    shadow_bodies: Tuple[int, ...] = (NAIF.EARTH,)

    @classmethod
    def new(cls, objectives, weights) -> "Kluever":
        return cls(tuple(objectives), tuple(weights))

    @classmethod
    def from_max_eclipse(cls, objectives, weights, max_eclipse) -> "Kluever":
        return cls(tuple(objectives), tuple(weights), max_eclipse)

    def required_bodies(self):
        if self.max_eclipse_prct is None:
            return ()
        return (NAIF.SUN,) + tuple(self.shadow_bodies)

    def direction_and_throttle(self, ctx, t_tdb, y9, mode):
        r = y9[..., 0:3]
        v = y9[..., 3:6]
        mu = ctx.frame.mu
        kep = keplerian_from_cartesian(r, v, mu)
        e = kep["ecc"]
        ta = kep["ta"]
        u_rad = ta + kep["aop"]

        num_a = jnp.zeros_like(e)
        den_a = jnp.zeros_like(e)
        num_b = jnp.zeros_like(e)
        for obj, w0 in zip(self.objectives, self.weights):
            if w0 == 0.0:
                continue
            osc = Ruggiero._osc_value(obj.parameter, kep)
            error = obj.desired_value - osc
            active = jnp.abs(error) >= obj.tolerance
            w = jnp.where(active, w0 * jnp.sign(error), 0.0)
            p = obj.parameter
            if p == StateParameter.SMA:
                num_a = num_a + w * (e * jnp.sin(ta))
                den_a = den_a + w * (1.0 + e * jnp.cos(ta))
            elif p == StateParameter.ECC:
                num_a = num_a + w * jnp.sin(ta)
                den_a = den_a + w * (
                    jnp.cos(ta) + (e + jnp.cos(ta)) / (1.0 + e * jnp.cos(ta))
                )
            elif p == StateParameter.INC:
                num_b = num_b + w * jnp.sign(jnp.cos(u_rad))
            elif p == StateParameter.RAAN:
                num_b = num_b + w * jnp.sign(jnp.sin(u_rad))
            else:
                raise GuidanceConfigError(f"Kluever does not support objective {p}")

        alpha = jnp.arctan2(num_a, den_a)
        beta = jnp.arctan2(num_b, jnp.sqrt(num_a**2 + den_a**2))
        steer_rcn = unit_vector_from_plane_angles(alpha, beta)
        dcm = LocalFrame.dcm_to_inertial(LocalFrame.RCN, r, v)
        u = jnp.einsum("...ij,...j->...i", dcm, steer_rcn)
        thrusting = mode == GuidanceMode.Thrust
        throttle = jnp.where(thrusting, 1.0, 0.0)
        return jnp.where(thrusting[..., None], u, 0.0), throttle

    def next_mode(self, ctx, t_tdb, y9, mode):
        # identical transition logic to Ruggiero (kluever.rs:300-330)
        helper = Ruggiero(
            self.objectives,
            tuple(0.0 for _ in self.objectives),
            max_eclipse_prct=self.max_eclipse_prct,
            shadow_bodies=self.shadow_bodies,
        )
        return helper.next_mode(ctx, t_tdb, y9, mode)

    def achieved(self, sc) -> bool:
        return all(
            obj.assess_raw(float(sc.orbit.value(obj.parameter)))[0]
            for obj in self.objectives
        )


@dataclass
class ThrustDirectionReplay(GuidanceLaw):
    """Replays recorded thrust directions (guidance/replay.rs:32-128):
    reconstructs a flown burn from logged (epoch, inertial unit vector,
    throttle) samples, interpolated on device (zero-order hold on throttle,
    renormalized linear interpolation on direction)."""

    ts_tdb: np.ndarray  # [K] sample epochs, TDB s past J2000, sorted
    directions: np.ndarray  # [K, 3] inertial unit vectors
    throttles: np.ndarray  # [K]

    @classmethod
    def from_samples(cls, epochs, directions, throttles) -> "ThrustDirectionReplay":
        ts = np.array([e.to_tdb_seconds() for e in epochs])
        order = np.argsort(ts)
        return cls(
            ts[order],
            np.asarray(directions, dtype=np.float64)[order],
            np.asarray(throttles, dtype=np.float64)[order],
        )

    def direction_and_throttle(self, ctx, t_tdb, y9, mode):
        ts = jnp.asarray(self.ts_tdb)
        dirs = jnp.asarray(self.directions)
        thr = jnp.asarray(self.throttles)
        i = jnp.clip(jnp.searchsorted(ts, t_tdb) - 1, 0, ts.shape[0] - 2)
        f = jnp.clip(
            (t_tdb - ts[i]) / jnp.maximum(ts[i + 1] - ts[i], 1e-9), 0.0, 1.0
        )
        u = dirs[i] * (1.0 - f[..., None]) + dirs[i + 1] * f[..., None]
        nrm = jnp.linalg.norm(u, axis=-1, keepdims=True)
        u = u / jnp.where(nrm > 0, nrm, 1.0)
        throttle = thr[i]
        in_window = (t_tdb >= ts[0]) & (t_tdb <= ts[-1])
        thrusting = (mode == GuidanceMode.Thrust) & in_window
        return (
            jnp.where(thrusting[..., None], u, 0.0),
            jnp.where(thrusting, throttle, 0.0),
        )

    def next_mode(self, ctx, t_tdb, y9, mode):
        in_window = (t_tdb >= self.ts_tdb[0]) & (t_tdb <= self.ts_tdb[-1])
        want = jnp.where(in_window, GuidanceMode.Thrust, GuidanceMode.Coast)
        inhibited = mode == GuidanceMode.Inhibit
        return jnp.where(inhibited, mode, jnp.broadcast_to(want, jnp.shape(mode)).astype(mode.dtype))


@dataclass
class ParametricManeuver(GuidanceLaw):
    """Finite burn whose 12 parameters are read from
    `ctx.guidance_params` instead of Python closure constants, so one
    compiled propagation serves every corrected/perturbed maneuver of a
    targeting loop (the TPU-native counterpart of the reference's
    parallel-FD thrust targeters, targeter.rs thrust_dir/_rate/_profile).

    Parameter layout ([..., 12], broadcastable against the lane axis so a
    [V+1, 12] batch targets V perturbations at once):

      0 start_tdb   1 end_tdb   2 thrust_level
      3:6  direction vector at burn start (local frame)
      6:9  direction rate  [1/s]
      9:12 direction accel [1/s^2]

    u_local(tau) = normalize(c + r*tau + a*tau^2), tau = t - start.
    """

    frame: str = LocalFrame.RCN

    @staticmethod
    def params_from_maneuver(mnvr: "Maneuver") -> np.ndarray:
        """Initial 12-parameter vector from a constant-vector Maneuver."""
        if mnvr.vector is None:
            raise GuidanceConfigError(
                "ParametricManeuver needs a vector-representation Maneuver "
                "as the initial guess"
            )
        v = np.asarray(mnvr.vector, dtype=np.float64)
        v = v / np.linalg.norm(v)
        return np.concatenate([
            [mnvr._start_tdb, mnvr._end_tdb, mnvr.thrust_prct],
            v, np.zeros(6),
        ])

    def _direction_local(self, p, tau):
        c = p[..., 3:6]
        r = p[..., 6:9]
        a = p[..., 9:12]
        u = c + r * tau[..., None] + a * tau[..., None] ** 2
        return u / jnp.linalg.norm(u, axis=-1, keepdims=True)

    def direction_and_throttle(self, ctx, t_tdb, y9, mode):
        p = ctx.guidance_params
        if p is None:
            raise GuidanceConfigError(
                "ParametricManeuver requires ctx.guidance_params"
            )
        p = jnp.asarray(p)
        tau = t_tdb - p[..., 0]
        u_local = self._direction_local(p, jnp.broadcast_to(tau, y9.shape[:-1]))
        r = y9[..., 0:3]
        v = y9[..., 3:6]
        dcm = LocalFrame.dcm_to_inertial(self.frame, r, v)
        u = jnp.einsum(
            "...ij,...j->...i", dcm, jnp.broadcast_to(u_local, r.shape)
        )
        # pure time gate at RK-stage granularity (unlike Maneuver's hybrid
        # latch): targeting needs the FD Jacobian wrt StartEpoch/Duration
        # to be non-zero and burn edges always fall mid-propagation, where
        # a mode latch would overthrust by up to one accepted step. The
        # adaptive controller localizes the RHS discontinuity by rejection.
        in_burn = (
            jnp.broadcast_to(t_tdb, jnp.shape(mode)) >= p[..., 0]
        ) & (jnp.broadcast_to(t_tdb, jnp.shape(mode)) < p[..., 1])
        thrusting = in_burn & (mode != GuidanceMode.Inhibit)
        throttle = jnp.where(thrusting, p[..., 2], 0.0)
        return jnp.where(thrusting[..., None], u, 0.0), throttle

    def next_mode(self, ctx, t_tdb, y9, mode):
        p = jnp.asarray(ctx.guidance_params)
        in_burn = (t_tdb >= p[..., 0]) & (t_tdb < p[..., 1])
        want = jnp.where(in_burn, GuidanceMode.Thrust, GuidanceMode.Coast)
        inhibited = mode == GuidanceMode.Inhibit
        want = jnp.broadcast_to(want, jnp.shape(mode))
        return jnp.where(inhibited, mode, want.astype(mode.dtype))
