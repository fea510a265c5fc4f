"""Polynomials: evaluation, derivative, fitting helpers.

Counterpart of the reference's `polyfit` module (polyfit/polynomial.rs:29,
248): fixed-size `Polynomial` with coefficients in INCREASING order of
degree (the reference's convention), `CommonPolynomial`
(Constant/Linear/Quadratic) used by finite-burn angle profiles, and
Lagrange/Hermite fitting helpers. Evaluation is jnp-compatible so
polynomials can live inside jitted guidance laws.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Polynomial:
    """Coefficients low-order-first: p(t) = c0 + c1 t + c2 t^2 + ...
    (polynomial.rs:29)."""

    coefficients: Tuple[float, ...]

    @classmethod
    def from_most_significant(cls, coeffs: Sequence[float]) -> "Polynomial":
        return cls(tuple(reversed([float(c) for c in coeffs])))

    @property
    def order(self) -> int:
        return len(self.coefficients) - 1

    def eval(self, t):
        # Horner, low-order-first storage
        acc = 0.0
        for c in reversed(self.coefficients):
            acc = acc * t + c
        return acc

    def deriv(self, t):
        acc = 0.0
        n = len(self.coefficients)
        for k in range(n - 1, 0, -1):
            acc = acc * t + k * self.coefficients[k]
        return acc

    def derivative(self) -> "Polynomial":
        return Polynomial(
            tuple(k * c for k, c in enumerate(self.coefficients))[1:]
            or (0.0,)
        )

    def coeff_in_order(self, order: int) -> float:
        """(polynomial.rs coeff_in_order)."""
        if order >= len(self.coefficients):
            raise IndexError(f"polynomial has no order-{order} coefficient")
        return self.coefficients[order]

    def __str__(self):
        terms = [
            f"{c:+.6g}{'' if k == 0 else f' t^{k}' if k > 1 else ' t'}"
            for k, c in enumerate(self.coefficients)
        ]
        return "P(t) = " + " ".join(terms)


class CommonPolynomial:
    """Constant/Linear/Quadratic constructors (polynomial.rs:248), stored
    most-significant-first in the reference's enum payloads."""

    @staticmethod
    def Constant(a: float) -> Polynomial:
        return Polynomial((a,))

    @staticmethod
    def Linear(a: float, b: float) -> Polynomial:
        """a t + b."""
        return Polynomial((b, a))

    @staticmethod
    def Quadratic(a: float, b: float, c: float) -> Polynomial:
        """a t^2 + b t + c."""
        return Polynomial((c, b, a))


def lagrange(xs: Sequence[float], ys: Sequence[float]) -> Polynomial:
    """Exact Lagrange interpolating polynomial through the points."""
    coeffs = np.polyfit(np.asarray(xs), np.asarray(ys), len(xs) - 1)
    return Polynomial.from_most_significant(coeffs)


def hermite_eval(xs, ys, ydots, t):
    """Hermite interpolation of value+derivative samples at t; returns
    (value, derivative) — the kernel behind trajectory interpolation
    (md/trajectory/interpolatable.rs hermite)."""
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    ydots = jnp.asarray(ydots)
    n = xs.shape[0]
    # divided-difference Hermite via doubled nodes
    z = jnp.repeat(xs, 2)
    q = jnp.zeros((2 * n, 2 * n))
    q = q.at[0::2, 0].set(ys)
    q = q.at[1::2, 0].set(ys)
    q = q.at[1::2, 1].set(ydots)
    q = q.at[2::2, 1].set(
        (ys[1:] - ys[:-1]) / (xs[1:] - xs[:-1])
    )
    for j in range(2, 2 * n):
        q = q.at[j:, j].set(
            (q[j:, j - 1] - q[j - 1 : -1, j - 1]) / (z[j:] - z[: 2 * n - j])
        )
    # Newton-form evaluation + derivative
    val = q[2 * n - 1, 2 * n - 1]
    dval = 0.0
    for k in range(2 * n - 2, -1, -1):
        dval = dval * (t - z[k]) + val
        val = val * (t - z[k]) + q[k, k]
    return val, dval
