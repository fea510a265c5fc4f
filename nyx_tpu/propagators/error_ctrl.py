"""Integration error estimators, GMAT-compatible.

Batched counterparts of the reference's seven error controls
(nyx-core/src/propagators/error_ctrl.rs:30-150). Each takes the error
estimate vector, the candidate state and the current state (trailing state
axis) and returns a scalar error per lane. Only the first six state entries
(position, velocity) feed the Cartesian controls, matching the reference's
fixed_rows::<3>(0)/(3) blocks.
"""

from __future__ import annotations

import jax.numpy as jnp

REL_ERR_THRESH = 0.1


def _norm(x):
    return jnp.sqrt(jnp.sum(x * x, axis=-1))


def _rss_step_block(err, cand, cur):
    mag = _norm(cand - cur)
    e = _norm(err)
    return jnp.where(mag > jnp.sqrt(REL_ERR_THRESH), e / mag, e)


def _rss_state_block(err, cand, cur):
    mag = 0.5 * _norm(cand + cur)
    e = _norm(err)
    return jnp.where(mag > REL_ERR_THRESH, e / mag, e)


def rss_cartesian_step(err, cand, cur):
    er = _rss_step_block(err[..., 0:3], cand[..., 0:3], cur[..., 0:3])
    ev = _rss_step_block(err[..., 3:6], cand[..., 3:6], cur[..., 3:6])
    return jnp.maximum(er, ev)


def rss_cartesian_state(err, cand, cur):
    er = _rss_state_block(err[..., 0:3], cand[..., 0:3], cur[..., 0:3])
    ev = _rss_state_block(err[..., 3:6], cand[..., 3:6], cur[..., 3:6])
    return jnp.maximum(er, ev)


def rss_step(err, cand, cur):
    return _rss_step_block(err, cand, cur)


def rss_state(err, cand, cur):
    return _rss_state_block(err, cand, cur)


def largest_error(err, cand, cur):
    delta = cand - cur
    e = jnp.where(delta > REL_ERR_THRESH, jnp.abs(err / delta), jnp.abs(err))
    return jnp.max(e, axis=-1)


def largest_state(err, cand, cur):
    mag = jnp.sum(0.5 * jnp.abs(cand + cur), axis=-1)
    e = jnp.sum(jnp.abs(err), axis=-1)
    return jnp.where(mag > REL_ERR_THRESH, e / mag, e)


def largest_step(err, cand, cur):
    mag = jnp.sum(jnp.abs(cand - cur), axis=-1)
    e = jnp.sum(jnp.abs(err), axis=-1)
    return jnp.where(mag > jnp.sqrt(REL_ERR_THRESH), e / mag, e)


class ErrorControl:
    """Named error controls; values are the estimator functions."""

    RSSCartesianStep = staticmethod(rss_cartesian_step)  # default, as GMAT
    RSSCartesianState = staticmethod(rss_cartesian_state)
    RSSStep = staticmethod(rss_step)
    RSSState = staticmethod(rss_state)
    LargestError = staticmethod(largest_error)
    LargestState = staticmethod(largest_state)
    LargestStep = staticmethod(largest_step)
