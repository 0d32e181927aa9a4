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
    CF, PERIODIC, PHYS_DIRICHLET, PHYS_NEUMANN, FaceKinds, cf_homog_weights, ghost_plane,
)

DEFAULT_BX = 4

# the Mosaic default VMEM budget is 16 MB; v5e has ~128 MB usable — a high
# cap lets larger ny*nz slabs compile (measured working up to ~110 MB)
VMEM_LIMIT = 100 * 1024 * 1024


def _i32map(*factors):
    """Block index map emitting int32 constants: under jax_enable_x64 plain
    Python ints in index maps lower as i64, which the TPU-side Mosaic
    compiler rejects (transform functions must be i32)."""
    def index_map(i):
        out = []
        for f in factors:
            if f == "i":
                out.append(i)
            elif isinstance(f, tuple):  # ("i*", k) -> i * k
                out.append(i * f[1])
            else:
                out.append(jnp.int32(f))
        return tuple(out)

    return index_map


def _i32(v):
    """Clamp traced index scalars to int32 (under x64 they promote to i64,
    which Mosaic's memref_slice rejects)."""
    return jax.lax.convert_element_type(v, jnp.int32)


_ghost = ghost_plane  # the shared rule (ops/ghosts.py)


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
    cp = pltpu.make_async_copy(u_hbm.at[pl.ds(_i32(i * bx), bx + 2)], u_vmem, sem)
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
    cp = pltpu.make_async_copy(u_hbm.at[pl.ds(_i32(i * bx), bx + 2)], u_vmem, sem)
    cp.start()
    cp.wait()
    u = u_vmem[...]
    uc = u[1:-1]
    inv_dx2 = 1.0 / (dx * dx)
    b_inv = beta * inv_dx2
    lap = u[2:] + u[:-2] + _neighbour_sums_yz(uc, kinds, rho) - 6.0 * uc
    o_ref[...] = rhs_ref[...] - (alpha * a_ref[...] * uc - b_inv * lap)


def xpad2_planes(u, kinds: FaceKinds, rho: float):
    """(nx+4, ny, nz): TWO x planes per side for the fused red+black sweep.

    Plane -1 is the one-ring ghost; plane -2 only feeds the redundant red
    update of halo rows that edge blocks immediately overwrite with the
    refreshed ghost, so its value is irrelevant — edge-replicated. Periodic
    wraps both planes for real."""
    if kinds[0][0] == PERIODIC:
        return jnp.concatenate([u[-2:], u, u[:2]], axis=0)
    lo1 = _ghost(kinds[0][0], u[:1], u[1:2], rho)
    hi1 = _ghost(kinds[0][1], u[-1:], u[-2:-1], rho)
    return jnp.concatenate([lo1, lo1, u, hi1, hi1], axis=0)


def _gsrb_pair_kernel(
    u_hbm, rhs_hbm, a_hbm, m2_ref, o_ref, u_vmem, rhs_vmem, a_vmem, sem, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, nblk: int, approx_lambda: bool,
):
    """One FULL red+black sweep per launch: red is computed redundantly on
    one halo row per side so black sees post-red neighbours without a second
    HBM pass — per sweep the streams drop from 8N (two half-sweep launches)
    to ~(4 + 8/bx)N."""
    i = pl.program_id(0)
    cps = [
        pltpu.make_async_copy(u_hbm.at[pl.ds(_i32(i * bx), bx + 4)], u_vmem,
                              sem.at[jnp.int32(0)]),
        pltpu.make_async_copy(rhs_hbm.at[pl.ds(_i32(i * bx), bx + 2)], rhs_vmem,
                              sem.at[jnp.int32(1)]),
        pltpu.make_async_copy(a_hbm.at[pl.ds(_i32(i * bx), bx + 2)], a_vmem,
                              sem.at[jnp.int32(2)]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    s = u_vmem[...]  # (bx+4, ny, nz): logical x rows i*bx-2 .. i*bx+bx+1
    av = a_vmem[...]  # (bx+2): logical rows i*bx-1 .. i*bx+bx
    rv = rhs_vmem[...]
    inv_dx2 = 1.0 / (dx * dx)
    b_inv = beta * inv_dx2
    diag = alpha * av + 6.0 * b_inv
    lam = pl.reciprocal(diag, approx=True) if approx_lambda else 1.0 / diag
    m2 = m2_ref[...]

    def colour_pass(block, x_lo, x_hi, a_c, lam_c, rhs_c, row0_off, colour):
        """GSRB update of `block` given x-neighbour slabs; row0_off is the
        global x index of block's first row (relative to i*bx)."""
        lap = (
            x_lo + x_hi + _neighbour_sums_yz(block, kinds, rho) - 6.0 * block
        )
        upd = block - lam_c * (alpha * a_c * block - b_inv * lap - rhs_c)
        xpar = (
            (
                jax.lax.broadcasted_iota(jnp.int32, (block.shape[0], 1, 1), 0)
                + i * bx + row0_off + base + colour
            )
            & 1
        ).astype(block.dtype)
        par = jnp.abs(m2 - xpar)
        return upd + par * (block - upd)

    # red on logical rows -1..bx (bx+2 rows)
    red = colour_pass(
        s[1:-1], s[:-2], s[2:], av, lam, rv, row0_off=-1, colour=0
    )

    if kinds[0][0] != PERIODIC:
        # edge blocks: refresh the x ghost plane from the POST-RED interior
        # (the serial algorithm re-applies BCs between colours)
        lo_ghost = _ghost(kinds[0][0], red[1:2], red[2:3], rho)
        hi_ghost = _ghost(kinds[0][1], red[-2:-1], red[-3:-2], rho)
        first = (i == 0)
        last = (i == nblk - 1)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, red.shape, 0)
        red = jnp.where(first & (row_idx == 0), lo_ghost, red)
        red = jnp.where(last & (row_idx == bx + 1), hi_ghost, red)

    # black on logical rows 0..bx-1 using post-red neighbours
    black = colour_pass(
        red[1:-1], red[:-2], red[2:], av[1:-1], lam[1:-1], rv[1:-1],
        row0_off=0, colour=1,
    )
    o_ref[...] = black


@functools.partial(
    jax.jit,
    static_argnames=(
        "kinds", "rho", "alpha", "beta", "dx", "lo", "bx", "interpret",
        "approx_lambda",
    ),
)
def gsrb_full_sweep(
    u, rhs, a, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, bx: int = DEFAULT_BX, interpret: bool = False,
    approx_lambda: bool = False,
):
    """One full red+black GSRB sweep in a single fused kernel launch.

    Equivalent to two gsrb_half_sweep calls (colour 0 then 1) — tested in
    tests/test_pallas.py — at roughly half the HBM traffic."""
    nx, ny, nz = u.shape
    bx = pick_bx(nx, bx)
    u_xp2 = xpad2_planes(u, kinds, rho)
    if kinds[0][0] == PERIODIC:
        rhs_xp = jnp.concatenate([rhs[-1:], rhs, rhs[:1]], axis=0)
        a_xp = jnp.concatenate([a[-1:], a, a[:1]], axis=0)
    else:
        # halo-row values only feed redundant red updates that get masked /
        # overwritten; zero-pad (aCoef=0 keeps lambda finite)
        rhs_xp = jnp.pad(rhs, ((1, 1), (0, 0), (0, 0)))
        a_xp = jnp.pad(a, ((1, 1), (0, 0), (0, 0)))
    m2 = jnp.asarray(_parity_plane_np(ny, nz), u.dtype)[None]
    nblk = nx // bx
    kern = functools.partial(
        _gsrb_pair_kernel,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=sum(lo), bx=bx, nblk=nblk, approx_lambda=approx_lambda,
    )
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, ny, nz), _i32map(0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bx, ny, nz), _i32map("i", 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((bx + 4, ny, nz), u.dtype),
            pltpu.VMEM((bx + 2, ny, nz), u.dtype),
            pltpu.VMEM((bx + 2, ny, nz), u.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(u_xp2, rhs_xp, a_xp, m2)


def pick_bx(nx: int, preferred: int = DEFAULT_BX) -> int:
    for bx in (preferred, 8, 4, 2, 1):
        if nx % bx == 0:
            return bx
    return 1


def supported_shape(shape) -> bool:
    """Shapes the kernels accept: the sliced HBM DMA needs the lane (last)
    dimension aligned to the (1,128) memref tiling, and sublanes to 8.
    Small/odd levels fall back to the XLA path (they are cheap)."""
    nx, ny, nz = shape
    return ny % 8 == 0 and nz % 128 == 0 and nx >= 4


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
            pl.BlockSpec((bx, ny, nz), _i32map("i", 0, 0)),
            pl.BlockSpec((bx, ny, nz), _i32map("i", 0, 0)),
            pl.BlockSpec((1, ny, nz), _i32map(0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bx, ny, nz), _i32map("i", 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((bx + 2, ny, nz), u.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
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
