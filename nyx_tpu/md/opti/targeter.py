"""Differential-correction targeter (Newton-Raphson).

Counterpart of the reference's `Targeter` (md/opti/targeter.rs:37-280) with
`try_achieve_fd` (raphson_finite_diff.rs:42) and `try_achieve_dual`
(raphson_hyperdual.rs). TPU-native design instead of the reference's rayon
fan-out (raphson_finite_diff.rs:331): ALL finite-difference perturbations
propagate together as one [V+1, 9] batch in a single jitted RK kernel call
per Newton iteration; the "dual" mode replaces hyperdual arithmetic with the
propagated STM chained through `jax.jacfwd` of the objective map.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...cosmic.spacecraft import Spacecraft
from ...dynamics.guidance import LocalFrame
from ...propagators import integrator
from ...time import Epoch
from ..objective import Objective
from ..param import value as param_value
from .target_variable import Variable, Vary

STATE_DIM = 9


@dataclass
class TargeterSolution:
    """Converged solution (md/opti/solution.rs)."""

    corrected_state: Spacecraft  # state at correction epoch, correction applied
    achieved_state: Spacecraft  # state at achievement epoch
    correction: np.ndarray  # [V]
    iterations: int
    achieved_errors: np.ndarray  # [O] residual error per objective
    converged: bool
    #: corrected finite-burn maneuver (thrust targeters only)
    maneuver: object = None

    @property
    def is_finite_burn(self) -> bool:
        return self.maneuver is not None

    def to_mnvr(self):
        """The corrected Maneuver (solution.rs:64 to_mnvr)."""
        from ...errors import TargetingError

        if self.maneuver is None:
            raise TargetingError("solution is not a finite-burn correction")
        return self.maneuver

    def __str__(self):
        tag = "converged" if self.converged else "NOT CONVERGED"
        return (
            f"TargeterSolution({tag} in {self.iterations} iterations, "
            f"correction {self.correction}, errors {self.achieved_errors})"
        )


class Targeter:
    """V correction variables, O objectives (targeter.rs:37-81)."""

    def __init__(
        self,
        prop,
        variables: Sequence[Variable],
        objectives: Sequence[Objective],
        frame: str = LocalFrame.Inertial,
        iterations: int = 100,
        almanac=None,
    ):
        self.prop = prop
        self.variables = tuple(variables)
        self.objectives = tuple(objectives)
        self.frame = frame
        self.iterations = iterations
        self.almanac = almanac
        self._jit_cache = {}

    # -- constructors (targeter.rs:84-212) ------------------------------
    @classmethod
    def delta_v(cls, prop, objectives, **kw) -> "Targeter":
        return cls(
            prop,
            [Variable.from_vary(v) for v in Vary.VELOCITIES],
            objectives,
            frame=LocalFrame.Inertial,
            **kw,
        )

    @classmethod
    def delta_r(cls, prop, objectives, **kw) -> "Targeter":
        return cls(
            prop,
            [Variable.from_vary(v) for v in Vary.POSITIONS],
            objectives,
            frame=LocalFrame.Inertial,
            **kw,
        )

    @classmethod
    def vnc(cls, prop, objectives, **kw) -> "Targeter":
        return cls(
            prop,
            [Variable.from_vary(v) for v in Vary.VELOCITIES],
            objectives,
            frame=LocalFrame.VNC,
            **kw,
        )

    @classmethod
    def in_frame(cls, prop, varies, objectives, frame, **kw) -> "Targeter":
        return cls(
            prop, [Variable.from_vary(v) for v in varies], objectives,
            frame=frame, **kw,
        )

    # -- finite-burn thrust targeters (targeter.rs:121-211) -------------
    @classmethod
    def thrust_dir(cls, prop, objectives, mnvr0, **kw) -> "Targeter":
        """Correct the burn's (constant) direction vector + throttle."""
        return cls._thrust(
            prop, objectives, mnvr0,
            (Vary.ThrustX, Vary.ThrustY, Vary.ThrustZ, Vary.ThrustLevel),
            **kw,
        )

    @classmethod
    def thrust_dir_rate(cls, prop, objectives, mnvr0, **kw) -> "Targeter":
        """Direction + rates + throttle."""
        return cls._thrust(
            prop, objectives, mnvr0,
            (Vary.ThrustX, Vary.ThrustY, Vary.ThrustZ, Vary.ThrustLevel,
             Vary.ThrustRateX, Vary.ThrustRateY, Vary.ThrustRateZ),
            **kw,
        )

    @classmethod
    def thrust_profile(cls, prop, objectives, mnvr0, **kw) -> "Targeter":
        """Full quadratic direction profile + throttle."""
        return cls._thrust(
            prop, objectives, mnvr0,
            (Vary.ThrustX, Vary.ThrustY, Vary.ThrustZ, Vary.ThrustLevel,
             Vary.ThrustRateX, Vary.ThrustRateY, Vary.ThrustRateZ,
             Vary.ThrustAccelX, Vary.ThrustAccelY, Vary.ThrustAccelZ),
            **kw,
        )

    @classmethod
    def _thrust(cls, prop, objectives, mnvr0, varies, **kw) -> "Targeter":
        from ...dynamics.guidance import ParametricManeuver

        law = ParametricManeuver(frame=mnvr0.frame)
        out = cls(
            prop.with_guidance(law),
            [Variable.from_vary(v) for v in varies],
            objectives,
            frame=mnvr0.frame,
            **kw,
        )
        out._mnvr0 = mnvr0
        out._coast_prop = prop
        return out

    # ------------------------------------------------------------------
    def _apply_correction(self, sc: Spacecraft, correction: np.ndarray) -> Spacecraft:
        """Add the correction (expressed in `self.frame` at `sc`) to the
        position/velocity blocks."""
        delta_local = np.zeros(6)
        for var, c in zip(self.variables, correction):
            delta_local[var.slot] += c
        if self.frame == LocalFrame.Inertial:
            delta = delta_local
        else:
            r = jnp.asarray(sc.orbit.r_km)
            v = jnp.asarray(sc.orbit.v_km_s)
            dcm = np.asarray(LocalFrame.dcm_to_inertial(self.frame, r, v))
            delta = np.concatenate([dcm @ delta_local[0:3], dcm @ delta_local[3:6]])
        vec = sc.to_vector()
        vec[0:6] += delta
        return sc.set_vector(sc.epoch, vec)

    def _objective_values(self, y, mu, radius_km):
        """[..., O] objective-parameter values on flat states y [..., 9]."""
        vals = [
            param_value(obj.parameter, y, mu, radius_km)
            for obj in self.objectives
        ]
        return jnp.stack(vals, axis=-1)

    def _batch_run(self, with_stm: bool, thruster=None):
        key = (with_stm, thruster)
        if key not in self._jit_cache:
            dyn = self.prop.dynamics
            eom = dyn.make_eom(with_stm, thruster=thruster)
            finally_fn = dyn.make_finally()
            opts, method = self.prop.opts, self.prop.method

            @jax.jit
            def run(y0, duration_s, ctx, sc_params):
                return integrator.propagate(
                    eom, y0, duration_s, opts, method,
                    finally_fn=finally_fn, eom_args=(ctx, sc_params),
                )

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _errors(self, achieved: np.ndarray) -> np.ndarray:
        errs = np.empty(len(self.objectives))
        for j, obj in enumerate(self.objectives):
            _, errs[j] = obj.assess_raw(float(achieved[j]))
        return errs

    # ------------------------------------------------------------------
    def try_achieve_from(
        self,
        initial_state: Spacecraft,
        correction_epoch: Epoch,
        achievement_epoch: Epoch,
        method: str = "fd",
    ) -> TargeterSolution:
        """Newton-Raphson to meet the objectives at `achievement_epoch` by
        varying the state at `correction_epoch` (targeter.rs:246,
        raphson_finite_diff.rs:42-360)."""
        if any(v.is_finite_burn for v in self.variables):
            return self._try_achieve_mnvr(
                initial_state, correction_epoch, achievement_epoch
            )
        # 1. bring the state to the correction epoch
        sc0 = initial_state
        dt0 = (correction_epoch - sc0.epoch).to_seconds()
        if abs(dt0) > 1e-9:
            inst = self.prop.with_state(sc0, self.almanac)
            sc0 = inst.for_duration(dt0)
        dt = (achievement_epoch - correction_epoch).to_seconds()

        mu = sc0.frame.mu
        radius_km = sc0.frame.radius_km or 0.0
        dyn = self.prop.dynamics
        ctx = dyn.build_context(correction_epoch, dt, self.almanac)
        sc_params = dict(
            dry_mass_kg=sc0.dry_mass_kg,
            srp_area_m2=sc0.srp_area_m2,
            drag_area_m2=sc0.drag_area_m2,
        )

        correction = np.array([v.init_guess for v in self.variables])
        nvars = len(self.variables)
        use_fd = method == "fd"
        run = self._batch_run(with_stm=not use_fd)
        tols = np.array([o.tolerance for o in self.objectives])

        # damped Newton: a step that worsens the tolerance-weighted error
        # norm is rejected and halved (the undamped reference iteration,
        # raphson_finite_diff.rs:300-360, can limit-cycle on multi-objective
        # problems)
        prev_norm = None
        prev_correction = None
        applied_dx = None
        backtracks = 0

        it = 0
        for it in range(1, self.iterations + 1):
            xc = self._apply_correction(sc0, correction)
            y_nom = xc.to_vector()

            if use_fd:
                # one [V+1, 9] batch: nominal + each perturbed variable
                rows = [y_nom]
                for i, var in enumerate(self.variables):
                    pert = np.zeros(nvars)
                    pert[i] = var.perturbation
                    rows.append(self._apply_correction(sc0, correction + pert).to_vector())
                y0 = jnp.asarray(np.stack(rows))
                res = run(y0, dt, ctx, sc_params)
                yf_all = np.asarray(res.y)
                achieved = np.asarray(
                    self._objective_values(jnp.asarray(yf_all), mu, radius_km)
                )
                errs = self._errors(achieved[0])
            else:
                # "dual": single propagation with STM, chain rule via AD
                y0 = jnp.asarray(
                    np.concatenate([y_nom, np.eye(STATE_DIM).ravel()])
                )[None, :]
                res = run(y0, dt, ctx, sc_params)
                row = np.asarray(res.y[0])
                yf = row[0:STATE_DIM]
                phi = row[STATE_DIM:].reshape(STATE_DIM, STATE_DIM)
                achieved = np.asarray(
                    self._objective_values(jnp.asarray(yf), mu, radius_km)
                )[None, :]
                errs = self._errors(achieved[0])

            if all(
                abs(e) <= o.tolerance for e, o in zip(errs, self.objectives)
            ):
                break

            norm = float(np.linalg.norm(errs / tols))
            if (
                prev_norm is not None
                and norm > prev_norm
                and backtracks < 10
                and np.linalg.norm(applied_dx) > 1e-14
            ):
                # reject the last Newton step: halve it and retry
                applied_dx = applied_dx / 2.0
                correction = prev_correction + applied_dx
                backtracks += 1
                continue
            backtracks = 0

            if use_fd:
                jac = np.empty((len(self.objectives), nvars))
                for i, var in enumerate(self.variables):
                    jac[:, i] = (achieved[i + 1] - achieved[0]) / var.perturbation
            else:
                dobj_dyf = np.asarray(
                    jax.jacfwd(
                        lambda y: self._objective_values(y, mu, radius_km)
                    )(jnp.asarray(yf))
                )  # [O, 9]
                # variable direction in inertial coordinates
                if self.frame == LocalFrame.Inertial:
                    dcm = np.eye(3)
                else:
                    r = jnp.asarray(xc.orbit.r_km)
                    v = jnp.asarray(xc.orbit.v_km_s)
                    dcm = np.asarray(LocalFrame.dcm_to_inertial(self.frame, r, v))
                jac = np.empty((len(self.objectives), nvars))
                for i, var in enumerate(self.variables):
                    e9 = np.zeros(STATE_DIM)
                    block = var.slot // 3 * 3
                    e9[block : block + 3] = dcm[:, var.slot % 3]
                    jac[:, i] = dobj_dyf @ (phi @ e9)

            # errs are (desired - achieved): Newton step solves J dx = errs
            try:
                dx = np.linalg.lstsq(jac, errs, rcond=None)[0]
            except np.linalg.LinAlgError:
                dx = np.linalg.pinv(jac) @ errs
            dx = np.array(
                [var.check_step(d) for var, d in zip(self.variables, dx)]
            )
            prev_norm = norm
            prev_correction = correction.copy()
            correction = np.array(
                [
                    var.apply_bounds(c + d)
                    for var, c, d in zip(self.variables, correction, dx)
                ]
            )
            applied_dx = correction - prev_correction
        else:
            # loop exhausted without break
            xc = self._apply_correction(sc0, correction)
            final = xc.set_vector(
                achievement_epoch,
                np.asarray(res.y)[0][0:STATE_DIM]
                if use_fd
                else np.asarray(res.y[0])[0:STATE_DIM],
            )
            return TargeterSolution(
                xc, final, correction, it, errs, converged=False
            )

        xc = self._apply_correction(sc0, correction)
        yf_nom = (
            np.asarray(res.y)[0][0:STATE_DIM]
            if use_fd
            else np.asarray(res.y[0])[0:STATE_DIM]
        )
        final = xc.set_vector(achievement_epoch, yf_nom)
        return TargeterSolution(xc, final, correction, it, errs, converged=True)

    # reference aliases -------------------------------------------------
    def try_achieve_fd(self, initial_state, correction_epoch, achievement_epoch):
        return self.try_achieve_from(
            initial_state, correction_epoch, achievement_epoch, method="fd"
        )

    def try_achieve_dual(self, initial_state, correction_epoch, achievement_epoch):
        return self.try_achieve_from(
            initial_state, correction_epoch, achievement_epoch, method="dual"
        )


def _try_achieve_mnvr(self, initial_state, correction_epoch, achievement_epoch):
    """Finite-burn correction: Newton-Raphson on the ParametricManeuver's
    12-parameter vector. One compiled propagation serves every iteration —
    the [V+1] nominal+perturbed maneuvers run as a batch with per-lane
    guidance parameters (the reference propagates each FD perturbation on a
    rayon thread, raphson_finite_diff.rs:331; here they are lanes)."""
    from dataclasses import replace as _replace

    from ...cosmic.spacecraft import GuidanceMode
    from ...dynamics.guidance import Maneuver, ParametricManeuver
    from ...errors import TargetingError

    if initial_state.thruster is None:
        raise TargetingError("finite-burn targeting needs a thruster")
    mnvr0 = getattr(self, "_mnvr0", None)
    if mnvr0 is None:
        raise TargetingError(
            "use Targeter.thrust_dir/_dir_rate/_profile to build a "
            "finite-burn targeter"
        )
    params0 = ParametricManeuver.params_from_maneuver(mnvr0)

    # 1. coast to the correction epoch with the unguided propagator
    sc0 = initial_state
    dt0 = (correction_epoch - sc0.epoch).to_seconds()
    if abs(dt0) > 1e-9:
        sc0 = self._coast_prop.with_state(sc0, self.almanac).for_duration(dt0)
    dt = (achievement_epoch - correction_epoch).to_seconds()

    mu = sc0.frame.mu
    radius_km = sc0.frame.radius_km or 0.0
    dyn = self.prop.dynamics
    base_ctx = dyn.build_context(correction_epoch, dt, self.almanac)
    sc_params = dict(
        dry_mass_kg=sc0.dry_mass_kg,
        srp_area_m2=sc0.srp_area_m2,
        drag_area_m2=sc0.drag_area_m2,
    )
    run = self._batch_run(with_stm=False, thruster=sc0.thruster)
    tols = np.array([o.tolerance for o in self.objectives])
    nvars = len(self.variables)

    # initial guidance mode from the burn window at the correction epoch
    t0_tdb = correction_epoch.to_tdb_seconds()
    mode0 = (
        GuidanceMode.Thrust
        if params0[0] <= t0_tdb < params0[1]
        else GuidanceMode.Coast
    )
    y_row = np.concatenate([sc0.to_vector(), [float(mode0)]])

    def apply(correction):
        p = params0.copy()
        for var, c in zip(self.variables, correction):
            p[var.pslot] += c
        return p

    correction = np.array([v.init_guess for v in self.variables])
    prev_norm = None
    prev_correction = None
    applied_dx = None
    backtracks = 0
    it = 0
    for it in range(1, self.iterations + 1):
        p_nom = apply(correction)
        rows = [p_nom]
        for i, var in enumerate(self.variables):
            pert = np.zeros(nvars)
            pert[i] = var.perturbation
            rows.append(apply(correction + pert))
        ctx = _replace(
            base_ctx, guidance_params=jnp.asarray(np.stack(rows))
        )
        y0 = jnp.asarray(np.tile(y_row, (nvars + 1, 1)))
        res = run(y0, dt, ctx, sc_params)
        yf_all = np.asarray(res.y)[:, :STATE_DIM]
        achieved = np.asarray(
            self._objective_values(jnp.asarray(yf_all), mu, radius_km)
        )
        errs = self._errors(achieved[0])
        if all(abs(e) <= o.tolerance for e, o in zip(errs, self.objectives)):
            break

        norm = float(np.linalg.norm(errs / tols))
        if (
            prev_norm is not None
            and norm > prev_norm
            and backtracks < 10
            and np.linalg.norm(applied_dx) > 1e-14
        ):
            applied_dx = applied_dx / 2.0
            correction = prev_correction + applied_dx
            backtracks += 1
            continue
        backtracks = 0

        jac = np.empty((len(self.objectives), nvars))
        for i, var in enumerate(self.variables):
            jac[:, i] = (achieved[i + 1] - achieved[0]) / var.perturbation
        # trust-region equilibration: columns scaled by each variable's
        # natural step, rows by objective tolerance — the raw Jacobian
        # mixes units (throttle ~1, rates ~1e-4/s) and min-norm lstsq on
        # it starves the small-scaled variables
        scale = np.array([v.max_step for v in self.variables])
        w = 1.0 / tols
        try:
            dxs = np.linalg.lstsq(
                jac * scale[None, :] * w[:, None], errs * w, rcond=None
            )[0]
        except np.linalg.LinAlgError:
            dxs = np.linalg.pinv(jac * scale[None, :] * w[:, None]) @ (
                errs * w
            )
        dx = np.array(
            [v.check_step(d) for v, d in zip(self.variables, dxs * scale)]
        )
        prev_norm = norm
        prev_correction = correction.copy()
        # bounds apply to the correction itself, except the throttle whose
        # ABSOLUTE level must stay inside (0, 1]
        correction = np.array(
            [
                var.apply_bounds(c + d)
                if var.component != Vary.ThrustLevel
                else np.clip(c + d, var.min_value - params0[2],
                             var.max_value - params0[2])
                for var, c, d in zip(self.variables, prev_correction, dx)
            ]
        )
        applied_dx = correction - prev_correction

    p_fin = apply(correction)
    converged = all(
        abs(e) <= o.tolerance for e, o in zip(errs, self.objectives)
    )
    final = sc0.set_vector(
        achievement_epoch, np.asarray(res.y)[0][:STATE_DIM]
    )
    vec = p_fin[3:6]
    rate = p_fin[6:9]
    acc = p_fin[9:12]
    mnvr = Maneuver(
        start=mnvr0.start + (p_fin[0] - params0[0]),
        end=mnvr0.end + (p_fin[1] - params0[1]),
        thrust_prct=float(p_fin[2]),
        vector=vec / np.linalg.norm(vec),
        vector_rate=rate if np.any(rate) else None,
        vector_accel=acc if np.any(acc) else None,
        frame=mnvr0.frame,
    )
    return TargeterSolution(
        sc0, final, correction, it, errs, converged, maneuver=mnvr
    )


Targeter._try_achieve_mnvr = _try_achieve_mnvr
del _try_achieve_mnvr
