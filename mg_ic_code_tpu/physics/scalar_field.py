"""User-specified scalar-field profile (reference: MyPhiFunction.H:11-22)."""

from __future__ import annotations

import jax.numpy as jnp

from mg_ic_code_tpu.config import SolverConfig


def phi_function(x, y, z, cfg: SolverConfig):
    """Gaussian phi = A * exp(-r^2 / lambda) — the reference's Dirichlet-mode
    profile (MyPhiFunction.H:14-15; note the wavelength divides r^2 bare,
    matching the reference exactly)."""
    r2 = x * x + y * y + z * z
    return cfg.phi_amplitude * jnp.exp(-r2 / cfg.phi_wavelength)


def phi_function_periodic(x, y, z, cfg: SolverConfig):
    """Triple-sine profile for periodic BCs (the commented-out variant at
    MyPhiFunction.H:17-20), provided as a selectable alternative."""
    Lx, Ly, Lz = cfg.domain_length
    w = cfg.phi_wavelength
    two_pi = 2.0 * jnp.pi
    return cfg.phi_amplitude * (
        jnp.sin(two_pi * x * w / Lx)
        + jnp.sin(two_pi * y * w / Ly)
        + jnp.sin(two_pi * z * w / Lz)
    )


def phi_profile(x, y, z, cfg: SolverConfig):
    """Profile selected by cfg.phi_profile."""
    if cfg.phi_profile == "sine":
        return phi_function_periodic(x, y, z, cfg)
    return phi_function(x, y, z, cfg)
