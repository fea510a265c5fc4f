"""Plotting helpers (matplotlib).

Counterpart of the reference's Python plot helpers
(nyx-py/nyx_space/plots/{md,od}.py, which use plotly — unavailable here).
Each function returns the matplotlib Figure; pass `show=False` in headless
environments and save with `fig.savefig(...)`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_traj(traj, title: str = "Trajectory", step=300.0, show=True):
    """3D trajectory plot (plots/md.py plot_traj)."""
    plt = _plt()
    ts = np.arange(float(traj.ts[0]), float(traj.ts[-1]) + 1e-9, float(step))
    rs = np.stack([traj.interpolate(t)[:3] for t in ts])
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    ax.plot(rs[:, 0], rs[:, 1], rs[:, 2], lw=0.8)
    ax.scatter(*rs[0], color="green", label="start")
    ax.scatter(*rs[-1], color="red", label="end")
    ax.set_xlabel("x (km)")
    ax.set_ylabel("y (km)")
    ax.set_zlabel("z (km)")
    ax.set_title(title)
    ax.legend()
    if show:
        plt.show()
    return fig


def plot_orbital_elements(traj, parameters=("sma", "ecc", "inc", "raan", "aop", "ta"),
                          step=300.0, title="Orbital elements", show=True):
    """Osculating-element time series (plots/plot_orbital_elements.py)."""
    plt = _plt()
    n = len(parameters)
    fig, axes = plt.subplots(n, 1, figsize=(8, 2.2 * n), sharex=True)
    if n == 1:
        axes = [axes]
    for ax, p in zip(axes, parameters):
        ts, vals = traj.sample_values(p, step)
        ax.plot(ts / 3600.0, vals, lw=0.8)
        ax.set_ylabel(p)
        ax.grid(alpha=0.3)
    axes[-1].set_xlabel("hours past start")
    fig.suptitle(title)
    if show:
        plt.show()
    return fig


def plot_groundtrack(traj, body_frame=None, step=120.0, title="Ground track",
                     show=True):
    plt = _plt()
    ts, lat, lon, alt = traj.groundtrack(body_frame, step)
    fig, ax = plt.subplots(figsize=(9, 4.5))
    ax.scatter(lon, lat, s=1)
    ax.set_xlim(-180, 180)
    ax.set_ylim(-90, 90)
    ax.set_xlabel("longitude (deg)")
    ax.set_ylabel("latitude (deg)")
    ax.grid(alpha=0.3)
    ax.set_title(title)
    if show:
        plt.show()
    return fig


def plot_covar(od_solution, indices=(0, 1, 2), labels=("x", "y", "z"),
               sigmas: float = 3.0, title="Covariance", show=True):
    """Sigma envelopes over the solution (plots/od.py plot_covar)."""
    plt = _plt()
    ests = od_solution.estimates
    t0 = ests[0].epoch.to_tai_seconds()
    ts = np.array([e.epoch.to_tai_seconds() - t0 for e in ests]) / 3600.0
    fig, axes = plt.subplots(len(indices), 1, figsize=(8, 2.2 * len(indices)),
                             sharex=True)
    if len(indices) == 1:
        axes = [axes]
    for ax, i, lbl in zip(axes, indices, labels):
        sig = np.array([np.sqrt(e.covar[i, i]) for e in ests]) * sigmas
        ax.fill_between(ts, -sig, sig, alpha=0.3)
        ax.set_ylabel(f"{sigmas:g} sigma {lbl} (km)")
        ax.grid(alpha=0.3)
    axes[-1].set_xlabel("hours past start")
    fig.suptitle(title)
    if show:
        plt.show()
    return fig


def plot_residuals(od_solution, title="Residuals", show=True):
    """Prefit/postfit residuals + rejection markers (plots/od.py
    plot_residuals)."""
    plt = _plt()
    res = [r for r in od_solution.residuals if r is not None]
    t0 = res[0].epoch.to_tai_seconds()
    ts = np.array([r.epoch.to_tai_seconds() - t0 for r in res]) / 3600.0
    ratios = np.array([r.ratio for r in res])
    rejected = np.array([r.rejected for r in res])
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.scatter(ts[~rejected], ratios[~rejected], s=6, label="accepted")
    if rejected.any():
        ax.scatter(ts[rejected], ratios[rejected], s=10, color="red",
                   marker="x", label="rejected")
    ax.axhline(3.0, color="gray", ls="--", lw=0.8)
    ax.set_xlabel("hours past start")
    ax.set_ylabel("residual ratio (sigma)")
    ax.grid(alpha=0.3)
    ax.legend()
    ax.set_title(title)
    if show:
        plt.show()
    return fig


def plot_od_dashboard(od_solution, truth_traj=None, title="OD dashboard",
                      show=True):
    """Residual ratios + position sigmas (+ RIC error vs a truth
    trajectory) in one figure — the reference's od-dashboard view
    (examples/06 od-dashboard.png)."""
    plt = _plt()
    n_rows = 3 if truth_traj is not None else 2
    fig, axes = plt.subplots(n_rows, 1, figsize=(8, 3 * n_rows), sharex=True)
    res = [r for r in od_solution.residuals if r is not None]
    t0 = od_solution.estimates[0].epoch.to_tai_seconds()
    tr = np.array([r.epoch.to_tai_seconds() - t0 for r in res]) / 3600.0
    ratios = np.array([r.ratio for r in res])
    rejected = np.array([r.rejected for r in res])
    ax = axes[0]
    ax.scatter(tr[~rejected], ratios[~rejected], s=5, label="accepted")
    if rejected.any():
        ax.scatter(tr[rejected], ratios[rejected], s=8, color="red",
                   marker="x", label="rejected")
    ax.axhline(3.0, color="gray", ls="--", lw=0.8)
    ax.set_ylabel("ratio (sigma)")
    ax.legend(loc="upper right")
    ax.grid(alpha=0.3)

    te = np.array([
        e.epoch.to_tai_seconds() - t0 for e in od_solution.estimates
    ]) / 3600.0
    sig = np.stack([
        np.sqrt(np.diag(e.covar)[:3]) for e in od_solution.estimates
    ])
    ax = axes[1]
    for j, lbl in enumerate(("x", "y", "z")):
        ax.semilogy(te, sig[:, j] * 1e3, label=f"sigma {lbl}")
    ax.set_ylabel("position sigma (m)")
    ax.legend(loc="upper right")
    ax.grid(alpha=0.3)

    if truth_traj is not None:
        from .cosmic.orbit import ric_dcm
        import jax.numpy as jnp

        errs = []
        for e in od_solution.estimates:
            truth = truth_traj.at(e.epoch)
            dcm = np.asarray(ric_dcm(jnp.asarray(truth.orbit.r_km),
                                     jnp.asarray(truth.orbit.v_km_s)))
            errs.append(dcm @ (
                np.asarray(e.state().orbit.r_km)
                - np.asarray(truth.orbit.r_km)
            ))
        errs = np.stack(errs) * 1e3
        ax = axes[2]
        for j, lbl in enumerate(("radial", "in-track", "cross-track")):
            ax.plot(te, errs[:, j], label=lbl)
        ax.set_ylabel("RIC error (m)")
        ax.legend(loc="upper right")
        ax.grid(alpha=0.3)
    axes[-1].set_xlabel("hours past start")
    fig.suptitle(title)
    if show:
        plt.show()
    return fig


def plot_porkchop(pc, metric="c3_km2_s2", title="Porkchop", show=True,
                  levels=20):
    """Contour plot of a tools.porkchop.Porkchop grid."""
    plt = _plt()
    t0 = pc.dep_epochs[0].to_tai_seconds()
    xs = [
        (e.to_tai_seconds() - t0) / 86_400.0 for e in pc.arr_epochs
    ]
    ys = [
        (e.to_tai_seconds() - t0) / 86_400.0 for e in pc.dep_epochs
    ]
    grid = getattr(pc, metric)
    fig, ax = plt.subplots(figsize=(7, 5))
    cs = ax.contourf(xs, ys, grid, levels=levels, cmap="viridis")
    fig.colorbar(cs, ax=ax, label=metric)
    ax.set_xlabel("arrival (days past first departure)")
    ax.set_ylabel("departure (days past first departure)")
    ax.set_title(title)
    if show:
        plt.show()
    return fig
