"""Fused Pallas TPU kernels for the hot stencil sweeps.

TPU-native re-design of the reference's hottest Fortran kernel
GSRBHELMHOLTZVC3D (VariableCoeffPoissonOperatorF.ChF:56-139; see SURVEY
§3.3 — it runs 4 smooths x 2 colours x levels x V-cycles x Krylov iters) and
of VCCOMPUTERES3D. The XLA lowering of the jnp smoother materialises every
intermediate (pad, ghost-faces, operator, mask-select) and reaches ~18% of
HBM roofline; these kernels fuse one whole half-sweep into a single pass:

    per colour pass: read u(+2 halo planes), rhs, aCoef — write u

Performance-shaping choices (measured on v5e):
  * the x axis is pre-padded with one ghost plane per side (two (ny,nz)
    planes) and streamed as (bx+2)-row slabs by an explicit async copy from
    an ANY-space ref — Mosaic's element-indexed overlapping windows are
    ~40x slower;
  * y/z neighbours come from lane/sublane wrap-rolls with the edge planes
    replaced by the proper homogeneous ghost rule (Dirichlet / Neumann /
    coarse-fine / periodic, SetBCs semantics) via masked selects;
  * lambda = 1/(alpha*a + 6*beta/dx^2) (VariableCoeffPoissonOperator.cpp:
    220-249) is recomputed in-register with an approximate reciprocal (it
    only steers a smoother), saving a full HBM stream;
  * the red-black checkerboard is a multiply-blend against a precomputed
    (ny,nz) parity plane XOR'd with the global x parity — global indices,
    as in the reference (box indices are global in Chombo).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mg_ic_code_tpu.ops.ghosts import (
    CF, PERIODIC, PHYS_DIRICHLET, PHYS_NEUMANN, FaceKinds, cf_homog_weights,
)

DEFAULT_BX = 4


def _ghost(kind: str, u0, u1, rho: float):
    """Homogeneous one-ring ghost value from the two interior planes."""
    if kind == PHYS_DIRICHLET:
        return -2.0 * u0 + (1.0 / 3.0) * u1
    if kind == PHYS_NEUMANN:
        return u0
    if kind == CF:
        w0, w1 = cf_homog_weights(rho)
        return w0 * u0 + w1 * u1
    raise AssertionError(kind)


def xpad_planes(u, kinds: FaceKinds, rho: float):
    """(nx+2, ny, nz) array with the x-face ghost planes attached."""
    if kinds[0][0] == PERIODIC:
        lo_plane, hi_plane = u[-1:], u[:1]
    else:
        lo_plane = _ghost(kinds[0][0], u[:1], u[1:2], rho)
        hi_plane = _ghost(kinds[0][1], u[-1:], u[-2:-1], rho)
    return jnp.concatenate([lo_plane, u, hi_plane], axis=0)


@functools.lru_cache(maxsize=64)
def _parity_plane_np(ny: int, nz: int):
    j = np.arange(ny)[:, None]
    k = np.arange(nz)[None, :]
    return ((j + k) & 1).astype(np.float32)


def _neighbour_sums_yz(uc, kinds: FaceKinds, rho: float):
    """Sum of the four y/z neighbours with ghost rules applied in-register:
    wrap-rolls give periodic faces directly; non-periodic faces overwrite
    the wrapped edge plane with the homogeneous ghost rule via masked
    selects (plane-indexed ref stores do not lower under Mosaic)."""
    total = None
    for axis in (1, 2):
        n_ax = uc.shape[axis]
        vp = jnp.roll(uc, -1, axis)
        vm = jnp.roll(uc, 1, axis)
        if kinds[axis][0] != PERIODIC:
            idx = jax.lax.broadcasted_iota(jnp.int32, uc.shape, axis)

            def pick(pos_from, pos_to):
                sl = [slice(None)] * 3
                sl[axis] = slice(pos_from, pos_to)
                return uc[tuple(sl)]

            ghost_hi = _ghost(
                kinds[axis][1], pick(n_ax - 1, n_ax), pick(n_ax - 2, n_ax - 1),
                rho,
            )
            vp = jnp.where(idx == n_ax - 1, ghost_hi, vp)
            ghost_lo = _ghost(kinds[axis][0], pick(0, 1), pick(1, 2), rho)
            vm = jnp.where(idx == 0, ghost_lo, vm)
        contrib = vp + vm
        total = contrib if total is None else total + contrib
    return total


def _gsrb_kernel(
    u_hbm, rhs_ref, a_ref, m2_ref, o_ref, u_vmem, sem, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, approx_lambda: bool,
):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(u_hbm.at[pl.ds(i * bx, bx + 2)], u_vmem, sem)
    cp.start()
    cp.wait()
    u = u_vmem[...]
    uc = u[1:-1]
    av = a_ref[...]
    rv = rhs_ref[...]
    inv_dx2 = 1.0 / (dx * dx)
    b_inv = beta * inv_dx2

    diag = alpha * av + 6.0 * b_inv
    lam = pl.reciprocal(diag, approx=True) if approx_lambda else 1.0 / diag
    lap = u[2:] + u[:-2] + _neighbour_sums_yz(uc, kinds, rho) - 6.0 * uc
    upd = uc - lam * (alpha * av * uc - b_inv * lap - rv)

    # parity blend: out = upd + par * (uc - upd), par = (gi+gj+gk+base)&1
    xpar = (
        (jax.lax.broadcasted_iota(jnp.int32, (bx, 1, 1), 0) + i * bx + base)
        & 1
    ).astype(u.dtype)
    m2 = m2_ref[...]  # (1, ny, nz) float parity of (j+k)
    par = jnp.abs(m2 - xpar)  # XOR for 0/1 floats
    o_ref[...] = upd + par * (uc - upd)


def _residual_kernel(
    u_hbm, rhs_ref, a_ref, m2_ref, o_ref, u_vmem, sem, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int,
):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(u_hbm.at[pl.ds(i * bx, bx + 2)], u_vmem, sem)
    cp.start()
    cp.wait()
    u = u_vmem[...]
    uc = u[1:-1]
    inv_dx2 = 1.0 / (dx * dx)
    b_inv = beta * inv_dx2
    lap = u[2:] + u[:-2] + _neighbour_sums_yz(uc, kinds, rho) - 6.0 * uc
    o_ref[...] = rhs_ref[...] - (alpha * a_ref[...] * uc - b_inv * lap)


def pick_bx(nx: int, preferred: int = DEFAULT_BX) -> int:
    for bx in (preferred, 8, 4, 2, 1):
        if nx % bx == 0:
            return bx
    return 1


def supported_shape(shape) -> bool:
    """Shapes the kernels handle well; small/odd levels use the XLA path."""
    nx, ny, nz = shape
    return ny % 8 == 0 and nz % 8 == 0 and nx >= 4


def _call(kernel, u, rhs, a, kinds, rho, bx, interpret, **kw):
    nx, ny, nz = u.shape
    bx = pick_bx(nx, bx)
    u_xp = xpad_planes(u, kinds, rho)
    m2 = jnp.asarray(_parity_plane_np(ny, nz), u.dtype)[None]
    kern = functools.partial(kernel, kinds=kinds, rho=rho, bx=bx, **kw)
    return pl.pallas_call(
        kern,
        grid=(nx // bx,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0)),
            pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ny, nz), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((bx + 2, ny, nz), u.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(u_xp, rhs, a, m2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kinds", "rho", "alpha", "beta", "dx", "lo", "color", "bx",
        "interpret", "approx_lambda",
    ),
)
def gsrb_half_sweep(
    u, rhs, a, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, color: int, bx: int = DEFAULT_BX, interpret: bool = False,
    approx_lambda: bool = False,
):
    """One colour of a GSRB sweep as a single fused kernel pass.

    Matches ghosts.fill_ghosts_homogeneous + stencils.gsrb_color on the XLA
    path up to f32 rounding (tests/test_pallas.py)."""
    return _call(
        _gsrb_kernel, u, rhs, a, kinds, rho, bx, interpret,
        alpha=alpha, beta=beta, dx=dx, base=sum(lo) + color,
        approx_lambda=approx_lambda,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kinds", "rho", "alpha", "beta", "dx", "bx", "interpret"),
)
def residual(
    u, rhs, a, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    bx: int = DEFAULT_BX, interpret: bool = False,
):
    """res = rhs - L(u) with homogeneous ghosts, one fused pass."""
    return _call(
        _residual_kernel, u, rhs, a, kinds, rho, bx, interpret,
        alpha=alpha, beta=beta, dx=dx, base=0,
    )
