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
  * y/z neighbours come from lane/sublane wrap-rolls; the four edge planes
    are then RE-computed with the proper ghost rule (Dirichlet / Neumann /
    coarse-fine / periodic, homogeneous SetBCs semantics) and written over
    the bulk result — plane-sized fix-ups instead of full-size masked
    selects;
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


def _edge_ghosts_1d(vals, kind_lo: str, kind_hi: str, rho: float, axis: int):
    """Wrap-roll neighbours of a 2D plane along `axis`, with the plane's own
    end lines replaced by the ghost rule (covers corners consistently)."""
    n_ax = vals.shape[axis]
    vp = jnp.roll(vals, -1, axis)
    vm = jnp.roll(vals, 1, axis)
    if kind_lo != PERIODIC:
        idx = jax.lax.broadcasted_iota(jnp.int32, vals.shape, axis)
        sl = [slice(None)] * 2
        sl[axis] = slice(n_ax - 1, n_ax)
        sl2 = [slice(None)] * 2
        sl2[axis] = slice(n_ax - 2, n_ax - 1)
        vp = jnp.where(
            idx == n_ax - 1,
            _ghost(kind_hi, vals[tuple(sl)], vals[tuple(sl2)], rho),
            vp,
        )
        sl[axis] = slice(0, 1)
        sl2[axis] = slice(1, 2)
        vm = jnp.where(
            idx == 0,
            _ghost(kind_lo, vals[tuple(sl)], vals[tuple(sl2)], rho),
            vm,
        )
    return vp, vm


def _plane_result(
    u, uc, av, rv, lam, *,
    axis: int, side: int, kinds: FaceKinds, rho: float,
    alpha: float, beta_inv_dx2: float,
):
    """Correct stencil result on one y/z edge plane of the block.

    Returns (plane_index_slice, updated_plane) where updated_plane is the
    (bx, n_other) operator application with every ghost rule honoured.
    """
    n_ax = uc.shape[axis]
    pos = 0 if side == 0 else n_ax - 1
    inner = 1 if side == 0 else n_ax - 2

    def pick(arr, p):
        sl = [slice(None)] * 3
        sl[axis] = p
        return arr[tuple(sl)]

    P = pick(uc, pos)  # (bx, n_other)
    P_in = pick(uc, inner)
    kind = kinds[axis][side]
    ghost = _ghost(kind, P, P_in, rho) if kind != PERIODIC else pick(
        uc, n_ax - 1 if side == 0 else 0
    )

    # x neighbours come from the slab's ghosted x planes
    x_hi = pick(u[2:], pos)
    x_lo = pick(u[:-2], pos)

    # the other tangential axis within the plane
    other_axis3 = 2 if axis == 1 else 1
    other_axis2 = 1  # after pick, planes are (bx, n_other)
    vp, vm = _edge_ghosts_1d(
        P, kinds[other_axis3][0], kinds[other_axis3][1], rho, other_axis2
    )

    lap = x_hi + x_lo + ghost + P_in + vp + vm - 6.0 * P
    lofu = alpha * pick(av, pos) * P - beta_inv_dx2 * lap
    upd = P - pick(lam, pos) * (lofu - pick(rv, pos))
    return pos, P, upd, pick


def _bulk_neighbour_sum(u, uc, kinds: FaceKinds):
    """Wrapped-roll neighbour sum (y/z edges wrong unless periodic)."""
    return (
        jnp.roll(uc, -1, 1)
        + jnp.roll(uc, 1, 1)
        + jnp.roll(uc, -1, 2)
        + jnp.roll(uc, 1, 2)
    )


def _needs_fix(kinds: FaceKinds, axis: int) -> bool:
    return kinds[axis][0] != PERIODIC


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
    lap = u[2:] + u[:-2] + _bulk_neighbour_sum(u, uc, kinds) - 6.0 * uc
    upd = uc - lam * (alpha * av * uc - b_inv * lap - rv)

    # parity blend: out = upd + par * (uc - upd), par = (gi+gj+gk+base)&1
    xpar = (
        (jax.lax.broadcasted_iota(jnp.int32, (bx, 1, 1), 0) + i * bx + base)
        & 1
    ).astype(u.dtype)
    m2 = m2_ref[...]  # (1, ny, nz) float parity of (j+k)
    par = jnp.abs(m2 - xpar)  # XOR for 0/1 floats
    o_ref[...] = upd + par * (uc - upd)

    # plane fix-ups for non-periodic y/z faces
    def parity_plane(pos, axis):
        other3 = 2 if axis == 1 else 1
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (bx, uc.shape[other3]), 0
        ) + i * bx + base + pos
        kk = jax.lax.broadcasted_iota(jnp.int32, (bx, uc.shape[other3]), 1)
        return ((ii + kk) & 1).astype(u.dtype)

    for axis in (1, 2):
        if not _needs_fix(kinds, axis):
            continue
        for side in (0, 1):
            pos, P, updp, pick = _plane_result(
                u, uc, av, rv, lam,
                axis=axis, side=side, kinds=kinds, rho=rho,
                alpha=alpha, beta_inv_dx2=b_inv,
            )
            parp = parity_plane(pos, axis)
            outp = updp + parp * (P - updp)
            sl: list = [slice(None)] * 3
            sl[axis] = pos
            o_ref[tuple(sl)] = outp


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
    av = a_ref[...]
    rv = rhs_ref[...]
    inv_dx2 = 1.0 / (dx * dx)
    b_inv = beta * inv_dx2

    lap = u[2:] + u[:-2] + _bulk_neighbour_sum(u, uc, kinds) - 6.0 * uc
    o_ref[...] = rv - (alpha * av * uc - b_inv * lap)

    for axis in (1, 2):
        if not _needs_fix(kinds, axis):
            continue
        for side in (0, 1):
            pos, P, lofu_p, pick = _plane_result_residual(
                u, uc, av, rv, kinds=kinds, rho=rho, axis=axis, side=side,
                alpha=alpha, beta_inv_dx2=b_inv,
            )
            sl: list = [slice(None)] * 3
            sl[axis] = pos
            o_ref[tuple(sl)] = pick(rv, pos) - lofu_p


def _plane_result_residual(
    u, uc, av, rv, *, kinds, rho, axis, side, alpha, beta_inv_dx2
):
    n_ax = uc.shape[axis]
    pos = 0 if side == 0 else n_ax - 1
    inner = 1 if side == 0 else n_ax - 2

    def pick(arr, p):
        sl = [slice(None)] * 3
        sl[axis] = p
        return arr[tuple(sl)]

    P = pick(uc, pos)
    P_in = pick(uc, inner)
    kind = kinds[axis][side]
    ghost = _ghost(kind, P, P_in, rho) if kind != PERIODIC else pick(
        uc, n_ax - 1 if side == 0 else 0
    )
    x_hi = pick(u[2:], pos)
    x_lo = pick(u[:-2], pos)
    other_axis3 = 2 if axis == 1 else 1
    vp, vm = _edge_ghosts_1d(
        P, kinds[other_axis3][0], kinds[other_axis3][1], rho, 1
    )
    lap = x_hi + x_lo + ghost + P_in + vp + vm - 6.0 * P
    lofu = alpha * pick(av, pos) * P - beta_inv_dx2 * lap
    return pos, P, lofu, pick


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
