"""Single-level geometric multigrid: smoothing, depth chain, bottom solve.

TPU-native re-design of the per-level half of Chombo's AMRMultiGrid +
the reference operator's level contract (VariableCoeffPoissonOperator.cpp):
  * relax            — numMGsmooth red-black GSRB sweeps, each colour
                       preceded by a homogeneous ghost refresh (levelGSRB,
                       :273-332: homogeneousCFInterp + exchange + BCs)
  * residual/restrict— fused residual + full-weighting restriction
                       (restrictResidual :151-194)
  * mg_vcycle        — V-cycle down the depth chain built by MGnewOp
                       (VariableCoeffPoissonOperatorFactory.cpp:139-234),
                       with coefficients pre-coarsened arithmetically or
                       harmonically
  * bottom_solve     — unpreconditioned-ish BiCGStab at the coarsest depth
                       with the reference's preCond (dpsi = lambda*rhs then 2
                       GSRB relaxes, :72-104) as its preconditioner

On one chip a dense level needs no halo exchange between colours — only the
cheap one-ring ghost refresh, which XLA fuses with the sweep.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from mg_ic_code_tpu.grid.boxes import Box
from mg_ic_code_tpu.grid.geometry import HierarchyGeom
from mg_ic_code_tpu.ops import stencils as st
from mg_ic_code_tpu.ops.ghosts import (
    CF, PHYS_DIRICHLET, FaceKinds, face_kinds, fill_ghosts_homogeneous,
)
from mg_ic_code_tpu.solver.bicgstab import bicgstab


@dataclasses.dataclass(frozen=True)
class LevelMGSpec:
    """Static description of one AMR level's MG structure (hashable)."""

    kinds: FaceKinds
    boxes: tuple[Box, ...]  # depth chain; depth 0 = the AMR level box
    dx: tuple[float, ...]
    rho: tuple[float, ...]  # CF homogeneous-ghost ratio per depth
    alpha: float
    beta: float
    nsmooth: int
    avg_type: str = "arithmetic"
    bottom_iters: int = 60
    bottom_tol: float = 1.0e-12
    # MG cycle shape below this level: 1 = V-cycle, 2 = W-cycle (Chombo's
    # numMG / the params.txt `num_mg` key)
    num_mg: int = 1
    # smoother backend: "auto" picks the fused Pallas kernel on TPU for
    # f32 arrays with tile-friendly shapes; "pallas" forces the fused
    # kernel (interpret mode off-TPU, for tests); "xla" never uses kernels.
    # (A checkerboard-PACKED red/black family existed through round 3 but
    # measured 2.6x SLOWER than this dispatch at 256^3 — 1.31e10 vs
    # 3.42e10 DOF/s, docs/PERF.md — and was deleted.)
    smoother: str = "auto"
    # coarsest-depth solve: "auto" = dense direct solve when the bottom box
    # is small enough, else preconditioned BiCGStab (Chombo's default
    # AMRMultiGrid bottom solver); "direct" / "bicgstab" force one
    bottom: str = "auto"
    # reduced-precision colour passes inside the fused Pallas smoother
    # kernels ("bfloat16"), or None for operand-precision arithmetic.
    # Resolved from cfg.smoother_precision by make_amr_spec; only the sweep
    # multiply-adds drop — folding, residual, restrict, prolong stay f32
    # (ops/fused_sweeps._slab_passes).
    smoother_compute: str | None = None
    # device mesh for the explicit-halo production path: when set and the
    # mesh's x axis usefully divides a depth's extent, relax/residual run
    # inside shard_map with ppermute halo exchange (parallel/halo.py) — the
    # TPU counterpart of the reference's per-smooth MPI exchange
    # (VariableCoeffPoissonOperator.cpp:301). None = single device or
    # implicit GSPMD sharding.
    mesh: object = None

    @property
    def ndepths(self) -> int:
        return len(self.boxes)


def make_level_spec(
    geom: HierarchyGeom,
    level: int,
    alpha: float,
    beta: float,
    nsmooth: int,
    avg_type: str = "arithmetic",
    with_depths: bool = True,
    min_size: int = 4,
    smoother: str = "auto",
    num_mg: int = 1,
    mesh=None,
    bottom: str = "auto",
    smoother_compute: str | None = None,
) -> LevelMGSpec:
    boxes = geom.mg_depth_boxes(level, min_size) if with_depths else (
        geom.boxes[level],
    )
    dx0 = geom.dx[level]
    # dxCrse stays the AMR-coarse spacing (2*dx0) while depth dx doubles:
    # rho_d = dxCrse / dx_d = 2^(1-d)  (Chombo keeps m_dxCrse fixed per op)
    return LevelMGSpec(
        kinds=face_kinds(geom, level),
        boxes=boxes,
        dx=tuple(dx0 * 2**d for d in range(len(boxes))),
        rho=tuple(2.0 ** (1 - d) for d in range(len(boxes))),
        alpha=alpha,
        beta=beta,
        nsmooth=nsmooth,
        avg_type=avg_type,
        smoother=smoother,
        num_mg=num_mg,
        mesh=mesh,
        bottom=bottom,
        smoother_compute=smoother_compute,
    )


# bottom boxes up to this many cells get the dense direct solve (the
# factorised operator is tiny next to the level arrays: 512^2 f64 = 2 MB)
DIRECT_BOTTOM_MAX_CELLS = 1024


def _use_direct_bottom(spec: LevelMGSpec) -> bool:
    if spec.bottom == "bicgstab":
        return False
    # a (near-)singular bottom operator (alpha ~ 0 with no Dirichlet/CF
    # face, e.g. pure-Poisson periodic) has a (near-)constant null vector:
    # the dense inverse would be Inf/NaN garbage where BiCGStab stays in
    # the range space and degrades gracefully — never densely invert it.
    # "Near zero" is judged against the Laplacian diagonal beta/dx^2 with
    # aCoef assumed O(1) (the physics pins aCoef that way, ADVICE r2): a
    # mass term below ~1e-10 of the stencil scale puts the condition number
    # past what the f32-LU-seeded Newton-Schulz inverse can refine.
    dx_bot = spec.dx[-1]
    if abs(spec.alpha) <= 1e-10 * abs(spec.beta) / dx_bot**2 and not any(
        k in (PHYS_DIRICHLET, CF) for ax in spec.kinds for k in ax
    ):
        return False
    cells = 1
    for s in spec.boxes[-1].shape:
        cells *= s
    return spec.bottom == "direct" or cells <= DIRECT_BOTTOM_MAX_CELLS


def build_level_coefs(spec: LevelMGSpec, a0, b0=None) -> dict:
    """Coarsen aCoef/bCoef down the depth chain (MGnewOp's CoarseAverage,
    arithmetic or harmonic) and precompute lambda at each depth.

    When the coarsest depth is small, additionally materialise the dense
    bottom operator's inverse: the coarse solve then costs ONE matmul
    instead of a BiCGStab iteration tower (dozens of tiny launch-bound ops
    — the dominant V-cycle cost on TPU). The operator is linear and fixed
    per coefficient build, so this is exact, not approximate."""
    a_chain, b_chain, lam_chain = [a0], [b0], []
    for d in range(1, spec.ndepths):
        a_chain.append(st.coarsen_coef(a_chain[-1], spec.avg_type))
        b_chain.append(
            None if b0 is None else st.coarsen_coef(b_chain[-1], spec.avg_type)
        )
    for d in range(spec.ndepths):
        lam_chain.append(
            st.gsrb_lambda(a_chain[d], spec.alpha, spec.beta, spec.dx[d])
        )
    coefs = {"a": tuple(a_chain), "b": tuple(b_chain), "lam": tuple(lam_chain)}
    if _use_direct_bottom(spec):
        coefs["binv"] = _bottom_inverse(spec, coefs)
    return coefs


def _bottom_inverse(spec: LevelMGSpec, coefs: dict):
    """Dense inverse of the homogeneous-BC operator at the coarsest depth,
    built by applying the operator to the identity basis (vmapped)."""
    d = spec.ndepths - 1
    shape = spec.boxes[d].shape
    m = shape[0] * shape[1] * shape[2]
    dtype = coefs["a"][d].dtype
    eye = jnp.eye(m, dtype=dtype)

    def apply_vec(v):
        return apply_homog(spec, coefs, d, v.reshape(shape)).ravel()

    cols = jax.vmap(apply_vec)(eye)  # row i = A @ e_i = column i of A
    return _dense_inverse(cols.T)


def _newton_refine_inv(a, x, iters: int = 3):
    """Newton-Schulz iteration X <- X(2I - AX): quadratic contraction of
    ||I - AX||, so an f32-accurate seed (~1e-5 residual for the
    well-conditioned coarse operators here) reaches f64 machine precision
    in 2-3 iterations of two m x m MXU matmuls each."""
    eye = jnp.eye(a.shape[0], dtype=a.dtype)
    for _ in range(iters):
        x = x @ (2.0 * eye - a @ x)
    return x


def _dense_inverse(a):
    """Dense inverse that compiles on every backend: TPU XLA implements
    LuDecomposition only for f32, so in f64 on TPU seed with the f32 LU
    inverse and refine with Newton-Schulz instead of calling inv directly."""
    if a.dtype == jnp.float32 or jax.default_backend() != "tpu":
        return jnp.linalg.inv(a)
    seed = jnp.linalg.inv(a.astype(jnp.float32)).astype(a.dtype)
    return _newton_refine_inv(a, seed)


def _ghost(spec: LevelMGSpec, d: int, u):
    return fill_ghosts_homogeneous(u, spec.kinds, spec.rho[d])


def gsrb_half_sweep(spec: LevelMGSpec, coefs: dict, d: int, u, rhs, color):
    """One colour of a GSRB sweep, preceded by its ghost refresh (levelGSRB's
    per-colour CFInterp/exchange/BC sequence). `color` may be traced."""
    u_gh = _ghost(spec, d, u)
    return st.gsrb_color(
        u_gh, rhs, coefs["a"][d], coefs["b"][d], coefs["lam"][d],
        spec.alpha, spec.beta, spec.dx[d], spec.boxes[d].lo, color,
    )


def gsrb_sweep(spec: LevelMGSpec, coefs: dict, d: int, u, rhs):
    """One full red+black GSRB sweep at depth d."""
    for color in (0, 1):
        u = gsrb_half_sweep(spec, coefs, d, u, rhs, color)
    return u


def _kernels_allowed(spec: LevelMGSpec, u) -> bool:
    """Kernel smoothers run on the f32 (mixed-precision preconditioner)
    path; 'auto' additionally requires a real TPU backend ('pallas' forces
    them, running in interpret mode off-TPU for the tests)."""
    if spec.smoother == "xla":
        return False
    if u.dtype != jnp.float32:
        return False
    return spec.smoother == "pallas" or jax.default_backend() == "tpu"


def _slab_plan(shape, n: int) -> tuple[int, int, bool] | None:
    """Pick (nsweeps_per_launch, bx, flat) for the temporally-blocked slab
    kernel: the largest sweep chunk with a feasible block size. Measured on
    v5e: smaller bx wins (more grid steps pipeline better than wider
    slabs), so prefer the smallest feasible bx >= 2*nsweeps. Falls back to
    the flat-lane layout when nz breaks the 128-lane rule."""
    from mg_ic_code_tpu.ops import fused_sweeps as fs

    nx = shape[0]
    for flat in (False, True):
        ok = fs.flat_supported if flat else fs.slab_supported
        for s in range(min(n, 8), 0, -1):
            cands = [
                bx for bx in range(2 * s, nx + 1)
                if nx % bx == 0 and ok(shape, bx, s)
            ]
            if cands:
                return s, min(cands), flat
    return None


# Mid-block width preference for the pipelined kernels, in measured-best
# order; the first width the shape supports wins (1 always does when the
# plan accepted the shape). width w cuts the lo/mid/hi read amplification
# from 3x to (w+2)/w at the cost of a (w+2)*2*nsweeps-row live window in
# VMEM. Measured at 256^3 f32 (scripts/_probe_width.py, interleaved
# marginal, bitwise-equal outputs): w2s4 0.283 ms/sweep vs w1s4 0.414 —
# 1.46x; w4s2/w2s2 in between; w4s4 exceeds VMEM (Mosaic compile fail).
PIPELINED_WIDTHS: tuple = (2, 1)


def _pipelined_width(shape, s: int, flat: bool) -> int:
    """The mid-block width the dispatch stamps on a pipelined plan entry:
    first entry of PIPELINED_WIDTHS this (shape, nsweeps) supports."""
    from mg_ic_code_tpu.ops import fused_sweeps as fs

    sup = fs.flat_pipelined_supported if flat else fs.pipelined_supported
    for w in PIPELINED_WIDTHS:
        if w == 1 or sup(shape, s, width=w):
            return w
    return 1


def _flat_pipelined_plan(shape, n: int) -> tuple[int, int, int] | None:
    """(nsweeps_per_launch, nlaunches, remainder) for the auto-pipelined
    FLAT-layout kernel (fused_sweeps.multisweep_relax_flat_pipelined):
    chunk sizes are multiples of 4 only (bx = 2*nsweeps slices the flat
    layout's sublane dim, so bx must be 8-aligned)."""
    from mg_ic_code_tpu.ops import fused_sweeps as fs

    for s in (8, 4):
        if s > n:
            continue
        if fs.flat_pipelined_supported(shape, s):
            k, rem = divmod(n, s)
            if rem == 0 or (
                rem % 4 == 0 and fs.flat_pipelined_supported(shape, rem)
            ):
                return s, k, rem
    return None


def _pipelined_plan(shape, n: int) -> tuple[int, int, int] | None:
    """Pick (nsweeps_per_launch, nlaunches, remainder) for the
    auto-pipelined slab kernel (fused_sweeps.multisweep_relax_pipelined,
    the fastest smoother: measured 86% of HBM roofline at 256^3 on v5e vs
    70% for the manual-DMA multisweep). Largest chunk whose 3-block
    working set fits VMEM; the remainder must itself be pipelineable or
    the whole plan is rejected (the caller falls back to _slab_plan)."""
    from mg_ic_code_tpu.ops import fused_sweeps as fs

    for s in range(min(n, 8), 0, -1):
        if fs.pipelined_supported(shape, s):
            k, rem = divmod(n, s)
            if rem == 0 or fs.pipelined_supported(shape, rem):
                return s, k, rem
    return None


def _shard_counts(spec: LevelMGSpec, d: int) -> tuple[int, int, int]:
    """(x, y, z) shard counts of the explicit-halo production path at depth
    d: an axis counts as sharded only when the mesh axis divides this
    depth's extent leaving enough local rows (the mesh.level_spec policy).
    Depths too coarse to shard run the single-device path on (replicated)
    arrays — the analogue of Chombo's implicit gather of coarse MG levels
    onto few ranks."""
    if spec.mesh is None:
        return 1, 1, 1
    from mg_ic_code_tpu.parallel.mesh import AXES, MIN_LOCAL_NX

    counts = []
    for arr_axis, name in enumerate(AXES):
        ndev = spec.mesh.shape.get(name, 1)
        n = spec.boxes[d].shape[arr_axis]
        counts.append(
            ndev
            if ndev > 1 and n % ndev == 0 and n // ndev >= MIN_LOCAL_NX
            else 1
        )
    return tuple(counts)


def _shard_count(spec: LevelMGSpec, d: int) -> int:
    """x-slab shard count (the Pallas-in-shard_map kernel path): engaged
    only on 1-D x meshes; 2-D/3-D pencils route through the explicit-halo
    pencil paths via _shard_counts."""
    sx, sy, sz = _shard_counts(spec, d)
    return sx if sy == 1 and sz == 1 else 1


def relax_kernel_plan(shape, n: int, kinds: FaceKinds | None = None):
    """THE single source of truth for the single-device kernel dispatch:
    the launch sequence relax() issues for n homogeneous GSRB sweeps at
    this level shape, as (kind, nsweeps, params) entries with kind in
    {"resident", "wave", "tiled", "pipelined", "flatp", "slab", "flat",
    "legacy", "xla"}.
    relax() executes this plan verbatim; bench.count_launches /
    count_traffic and the dispatch decision-table test inspect it — so a
    dispatch change lands here and nowhere else (round-3 review: the
    ladder was hand-mirrored in four places).

    Preference order: resident (whole level in VMEM, one launch) ->
    time-skewed WAVEFRONT multisweep (non-periodic x: redundancy-free
    temporal blocking, bitwise-equal to the slab families — needs `kinds`
    to prove x is non-periodic, so callers that don't pass kinds keep the
    round-4 ladder) -> 2-D tiled temporal blocks (VMEM-bounded big
    levels) -> pipelined full-row slabs -> slab/flat manual-DMA chunks ->
    legacy per-sweep pair kernel -> the XLA fori_loop body ("xla" entries
    also mop up odd/misaligned leftovers of the tiled/flat paths)."""
    from mg_ic_code_tpu.ops import fused_sweeps as fs
    from mg_ic_code_tpu.ops import pallas_kernels as pk
    from mg_ic_code_tpu.ops import wavefront as wf

    if n <= 0:
        return []
    if fs.resident_supported(shape):
        return [("resident", n, None)]
    wplan = wf.wavefront_plan(shape, n, kinds)
    if wplan is not None:
        s, bxw, wflat = wplan
        return [("wavef" if wflat else "wave", s, bxw)] * (n // s)
    out: list = []
    pplan = _pipelined_plan(shape, n)
    # 512^3-class levels: full-row slabs exceed VMEM so the pipelined
    # plan degrades to 1-2 sweeps/launch; the (x,y)-tiled double-buffered
    # kernel keeps 4-sweep temporal blocking there (docs/PERF.md)
    tplan = fs.tiled_plan(shape, min(n - (n % 2), 4))
    if (
        tplan is not None
        and n >= 2
        and (pplan is None or pplan[0] < min(n, 4))
    ):
        # tiled chunks must be EVEN (Ry = by + 4*chunk needs 8-aligned
        # sublane extents); an odd leftover sweep re-plans below
        k4, r = divmod(n - (n % 2), 4)
        out += [("tiled", 4, tplan)] * k4
        if r:
            out.append(("tiled", r, tplan))
        if n % 2 == 0:
            return out
        n = 1  # remaining odd sweep
        pplan = _pipelined_plan(shape, n)
    if pplan is not None:
        s_max, k, rem = pplan
        out += [("pipelined", s_max,
                 _pipelined_width(shape, s_max, flat=False))] * k
        if rem:
            out.append(("pipelined", rem,
                        _pipelined_width(shape, rem, flat=False)))
        return out
    fpplan = _flat_pipelined_plan(shape, n)
    if fpplan is not None:
        # lane-misaligned (nz % 128 != 0) shapes whose flattened layout
        # pipelines: preferred over the manual-serial-DMA flat kernel for
        # the same reason pipelined beats slab (the DMA rides Mosaic's
        # double-buffered pipeline instead of the critical path)
        s_max, k, rem = fpplan
        out += [("flatp", s_max,
                 _pipelined_width(shape, s_max, flat=True))] * k
        if rem:
            out.append(("flatp", rem,
                        _pipelined_width(shape, rem, flat=True)))
        return out
    plan = _slab_plan(shape, n)
    if plan is not None:
        s_max, bx, flat = plan
        if flat:
            # flat chunks must keep the halo 8-aligned (chunk size
            # multiple of 4); the remainder falls to the XLA body
            out += [("flat", s_max, bx)] * (n // s_max)
            rem = n % s_max
            if rem >= 4:
                out.append(("flat", rem - rem % 4, bx))
                rem = rem % 4
            if rem:
                out.append(("xla", rem, None))
            return out
        return out + [("slab", c, bx) for c in fs.plan_chunks(n, s_max)]
    if pk.supported_shape(shape):
        return out + [("legacy", 1, None)] * n
    return out + [("xla", n, None)]


def relax(spec: LevelMGSpec, coefs: dict, d: int, u, rhs, n: int):
    """n red+black sweeps.

    Kernel path (TPU, f32), in preference order per level shape:
      1. resident  — whole level in VMEM, ONE launch for all n sweeps;
      2. slab multisweep — temporally-blocked chunks of up to 8 sweeps per
         launch (fused_sweeps.multisweep_relax);
      3. legacy fused red+black pair kernel (one launch per sweep).
    XLA path: rolled into a fori_loop with the colour as a traced value so
    the compiled graph holds ONE half-sweep body regardless of n.
    """
    if n <= 0:
        return u

    if coefs["b"][d] is None:
        sx, sy, sz = _shard_counts(spec, d)
        if sy > 1 or sz > 1:
            from mg_ic_code_tpu.parallel import halo

            # 2-D/3-D pencil production path: tiled Pallas kernel on the
            # local pencil with deep ppermute halos (falls back to the
            # overlapped XLA body where the kernel is infeasible or the z
            # lane axis shards)
            return halo.sharded_relax_2d(spec, coefs, d, u, rhs, n)
        if sx > 1:
            from mg_ic_code_tpu.parallel import halo

            return halo.sharded_relax(spec, coefs, d, u, rhs, n)
    elif spec.mesh is not None and _shard_counts(spec, d) != (1, 1, 1):
        # variable bCoef on a sharded level: keep the hand-scheduled
        # explicit-halo communication (generic pencil body; b is
        # cell-centred and needs no halo of its own) instead of silently
        # falling to GSPMD (VERDICT r3 stretch #10)
        from mg_ic_code_tpu.parallel import halo

        relax_fn, _ = halo.make_sharded_level_ops_2d(
            spec, spec.mesh, d, nsweeps=n, with_b=True
        )
        return relax_fn(
            coefs["a"][d], coefs["b"][d], coefs["lam"][d], u, rhs
        )

    if _kernels_allowed(spec, u) and coefs["b"][d] is None:
        from mg_ic_code_tpu.ops import fused_sweeps as fs
        from mg_ic_code_tpu.ops import pallas_kernels as pk

        shape = spec.boxes[d].shape
        interpret = jax.default_backend() != "tpu"
        kw = dict(
            kinds=spec.kinds, rho=spec.rho[d], alpha=spec.alpha,
            beta=spec.beta, dx=spec.dx[d], lo=spec.boxes[d].lo,
            interpret=interpret,
        )
        # the fused-sweep family takes the reduced-precision colour-pass
        # tier; the legacy pair kernel and XLA body stay operand-precision
        fkw = dict(kw, compute_dtype=spec.smoother_compute)
        for kind, s, prm in relax_kernel_plan(shape, n, spec.kinds):
            if kind == "resident":
                u = fs.resident_relax(u, rhs, coefs["a"][d], nsweeps=s, **fkw)
            elif kind in ("wave", "wavef"):
                from mg_ic_code_tpu.ops import wavefront as wf

                fn = (wf.wavefront_relax if kind == "wave"
                      else wf.wavefront_relax_flat)
                u = fn(u, rhs, coefs["a"][d], nsweeps=s, bx=prm, **fkw)
            elif kind == "tiled":
                u = fs.multisweep_relax_tiled(
                    u, rhs, coefs["a"][d], nsweeps=s, bx=prm[0], by=prm[1],
                    **fkw,
                )
            elif kind == "pipelined":
                u = fs.multisweep_relax_pipelined(
                    u, rhs, coefs["a"][d], nsweeps=s, width=prm, **fkw
                )
            elif kind == "slab":
                u = fs.multisweep_relax(
                    u, rhs, coefs["a"][d], nsweeps=s, bx=prm, **fkw
                )
            elif kind == "flatp":
                u = fs.multisweep_relax_flat_pipelined(
                    u, rhs, coefs["a"][d], nsweeps=s, width=prm, **fkw
                )
            elif kind == "flat":
                u = fs.multisweep_relax_flat(
                    u, rhs, coefs["a"][d], nsweeps=s, bx=prm, **fkw
                )
            elif kind == "legacy":
                u = pk.gsrb_full_sweep(u, rhs, coefs["a"][d], **kw)
            else:  # "xla" remainder entries (odd/misaligned leftovers)
                u = jax.lax.fori_loop(
                    0, 2 * s,
                    lambda i, uu: gsrb_half_sweep(
                        spec, coefs, d, uu, rhs, i % 2
                    ),
                    u,
                )
        return u

    if _kernels_allowed(spec, u) and coefs["b"][d] is not None:
        # variable bCoef (the reference's general-b GSRB kernel,
        # VariableCoeffPoissonOperatorF.ChF:56-139): the resident kernel
        # folds b into its P field — one extra VMEM-resident stream
        from mg_ic_code_tpu.ops import fused_sweeps as fs

        shape = spec.boxes[d].shape
        if fs.resident_supported(shape, extra_arrays=2):
            return fs.resident_relax(
                u, rhs, coefs["a"][d], coefs["b"][d], nsweeps=n,
                kinds=spec.kinds, rho=spec.rho[d], alpha=spec.alpha,
                beta=spec.beta, dx=spec.dx[d], lo=spec.boxes[d].lo,
                interpret=jax.default_backend() != "tpu",
            )
        # larger levels: XLA fallback below

    def body(i, uu):
        return gsrb_half_sweep(spec, coefs, d, uu, rhs, i % 2)

    return jax.lax.fori_loop(0, 2 * n, body, u)


def relax_cf(
    spec: LevelMGSpec, coefs: dict, u, rhs, n: int,
    geom: HierarchyGeom, level: int, coarse_u,
):
    """AMR-level relaxation with coarse-fine ghosts interpolated from the
    (now known) coarse correction — the up-sweep post-smooth of AMR-FAC.

    Using homogeneous CF ghosts after prolongation leaves an O(e_coarse)
    ghost error that the operator amplifies by 1/dx^2 per level; with 7
    levels that turns the V-cycle into an amplifier (measured ~6x residual
    growth per level). Physical BCs stay homogeneous (correction equation).

    Implementation: the quadratic CF ghost is w0*u0 + w1*u1 + (8/15)*phi_c
    with phi_c CONSTANT during the post-smooth, and the GSRB update is
    linear in the ghost — so the coarse term folds exactly into the rhs
    (rhs += beta/dx^2 * (8/15)*phi_c at CF-face cells) and the smoothing
    itself runs through `relax`'s homogeneous kernels (resident/pipelined/
    tiled Pallas on TPU) instead of a per-pass XLA ghost-fill loop."""
    if n <= 0:
        return u

    b = coefs["b"][0]
    if b is None and level > 0:
        rhs_cf = cf_folded_rhs(spec, geom, level, rhs, coarse_u)
        return relax(spec, coefs, 0, u, rhs_cf, n)

    # variable bCoef: no folded identity — per-pass ghost-fill XLA loop
    from mg_ic_code_tpu.ops.ghosts import fill_ghosts

    def body(i, uu):
        u_gh = fill_ghosts(
            uu, geom, level, coarse_u=coarse_u, homogeneous_phys=True
        )
        return st.gsrb_color(
            u_gh, rhs, coefs["a"][0], coefs["b"][0], coefs["lam"][0],
            spec.alpha, spec.beta, spec.dx[0], spec.boxes[0].lo, i % 2,
        )

    return jax.lax.fori_loop(0, 2 * n, body, u)


def cf_folded_rhs(spec: LevelMGSpec, geom: HierarchyGeom, level: int,
                  rhs, coarse_u):
    """Fold the (constant-during-post-smooth) coarse CF ghost term into the
    rhs: the quadratic CF ghost is w0*u0 + w1*u1 + (8/15)*phi_c, linear in
    the ghost, so the coarse contribution becomes
    rhs += beta/dx^2 * (8/15)*phi_c at CF-face cells — letting the
    smoothing itself run through `relax`'s homogeneous kernels. The face
    walk (cf_interp.cf_faces) includes non-spanning periodic faces at the
    domain boundary, whose coarse neighbour wraps — the same
    classification the ghost fill uses."""
    from mg_ic_code_tpu.ops import cf_interp as _cfi

    b_inv = spec.beta / (spec.dx[0] * spec.dx[0])
    return _cfi.add_cf_coarse_term(rhs, geom, level, coarse_u, b_inv)


def relax_xla(spec: LevelMGSpec, d: int, a, lam, u, rhs, n: int):
    """Pure-XLA homogeneous GSRB relaxation taking bare arrays (no coefs
    dict), vmappable over a leading patch axis — the batched-sibling
    execution path (solver.composite's forest LoadBalance role). Identical
    math to the XLA fallback body of `relax` (b None)."""
    def body(i, uu):
        u_gh = _ghost(spec, d, uu)
        return st.gsrb_color(
            u_gh, rhs, a, None, lam, spec.alpha, spec.beta, spec.dx[d],
            spec.boxes[d].lo, i % 2,
        )

    return jax.lax.fori_loop(0, 2 * n, body, u)


def residual_xla(spec: LevelMGSpec, d: int, a, u, rhs):
    """Pure-XLA homogeneous residual on bare arrays (vmappable)."""
    return st.residual(
        _ghost(spec, d, u), rhs, a, None, spec.alpha, spec.beta, spec.dx[d]
    )


def residual_homog(spec: LevelMGSpec, coefs: dict, d: int, u, rhs):
    if coefs["b"][d] is None:
        sx, sy, sz = _shard_counts(spec, d)
        if sy > 1 or sz > 1:
            from mg_ic_code_tpu.parallel import halo

            _, residual_fn = halo.make_sharded_level_ops_2d(
                spec, spec.mesh, d
            )
            return residual_fn(coefs["a"][d], u, rhs)
        if sx > 1:
            from mg_ic_code_tpu.parallel import halo

            return halo.sharded_residual(spec, coefs, d, u, rhs)
    elif spec.mesh is not None and _shard_counts(spec, d) != (1, 1, 1):
        from mg_ic_code_tpu.parallel import halo

        _, residual_fn = halo.make_sharded_level_ops_2d(
            spec, spec.mesh, d, with_b=True
        )
        return residual_fn(coefs["a"][d], coefs["b"][d], u, rhs)
    if _kernels_allowed(spec, u) and coefs["b"][d] is None:
        from mg_ic_code_tpu.ops import fused_sweeps as fs
        from mg_ic_code_tpu.ops import pallas_kernels as pk

        shape = spec.boxes[d].shape
        kw = dict(
            kinds=spec.kinds, rho=spec.rho[d], alpha=spec.alpha,
            beta=spec.beta, dx=spec.dx[d],
            interpret=jax.default_backend() != "tpu",
        )
        if fs.resident_supported(shape):
            return fs.resident_residual(u, rhs, coefs["a"][d], **kw)
        if pk.supported_shape(shape):
            return pk.residual(u, rhs, coefs["a"][d], **kw)
    if _kernels_allowed(spec, u) and coefs["b"][d] is not None:
        from mg_ic_code_tpu.ops import fused_sweeps as fs

        shape = spec.boxes[d].shape
        if fs.resident_supported(shape, extra_arrays=2):
            return fs.resident_residual(
                u, rhs, coefs["a"][d], coefs["b"][d],
                kinds=spec.kinds, rho=spec.rho[d], alpha=spec.alpha,
                beta=spec.beta, dx=spec.dx[d],
                interpret=jax.default_backend() != "tpu",
            )
    return st.residual(
        _ghost(spec, d, u), rhs, coefs["a"][d], coefs["b"][d],
        spec.alpha, spec.beta, spec.dx[d],
    )


def apply_homog(spec: LevelMGSpec, coefs: dict, d: int, u):
    return st.apply_op(
        _ghost(spec, d, u), coefs["a"][d], coefs["b"][d],
        spec.alpha, spec.beta, spec.dx[d],
    )


def jacobi_sweep(spec: LevelMGSpec, coefs: dict, d: int, u, rhs,
                 weight: float = 0.5):
    """Weighted Jacobi relaxation: u += w * lambda * (rhs - L(u)) — the
    reference's levelJacobi alternative smoother
    (VariableCoeffPoissonOperator.cpp:360-385, weight 0.5)."""
    res = residual_homog(spec, coefs, d, u, rhs)
    return u + weight * coefs["lam"][d] * res


def level_precond(spec: LevelMGSpec, coefs: dict, d: int, rhs):
    """The reference's smoother-grade preconditioner: u = lambda * rhs
    followed by 2 GSRB relaxations (preCond,
    VariableCoeffPoissonOperator.cpp:72-104)."""
    u = coefs["lam"][d] * rhs
    return relax(spec, coefs, d, u, rhs, 2)


def bottom_solve(spec: LevelMGSpec, coefs: dict, d: int, u, rhs):
    """Coarsest-depth solve: dense direct solve when precomputed (small
    bottom boxes — one matmul), else BiCGStab preconditioned by the level
    preCond (Chombo's AMRMultiGrid default bottom solver is BiCGStab)."""
    res = residual_homog(spec, coefs, d, u, rhs)
    if coefs.get("binv") is not None:
        # one step of iterative refinement: e <- e + X(r - A e) contracts
        # the error by ||I - AX|| per step, so an inverse that the f32-LU
        # seed + Newton-Schulz left at ~1e-k residual still yields a
        # near-exact bottom solve (guards the ill-conditioned tail the
        # static singularity check cannot see; ADVICE r2)
        binv = coefs["binv"]
        e = (binv @ res.ravel()).reshape(res.shape)
        r2 = res - apply_homog(spec, coefs, d, e)
        e = e + (binv @ r2.ravel()).reshape(res.shape)
        return u + e
    # f32 (mixed-precision preconditioner) cannot reach the f64 bottom
    # tolerance; stop at what the precision supports
    tol = spec.bottom_tol if u.dtype == jnp.float64 else max(
        spec.bottom_tol, 1.0e-6
    )
    out = bicgstab(
        functools.partial(apply_homog, spec, coefs, d),
        res,
        precond_fn=functools.partial(level_precond, spec, coefs, d),
        tol=tol,
        max_iter=spec.bottom_iters,
    )
    return u + out.x


def mg_vcycle(spec: LevelMGSpec, coefs: dict, u, rhs, d: int = 0):
    """Correction-scheme gamma-cycle over the depth chain: pre-smooth, fused
    restrict(residual), recurse gamma times (gamma = spec.num_mg: 1 gives
    the V-cycle, 2 the W-cycle — Chombo's numMG), piecewise-constant
    prolong, post-smooth.

    Where the remaining sub-chain is entirely resident-class (and
    unsharded, constant bCoef, gamma = 1), the whole tower below runs as
    TWO fused Pallas launches + an XLA bottom solve instead of two
    launches per depth (ops/coarse_tower — VERDICT r4 #3: the coarse
    depths were launch-bound, not compute-bound)."""
    if (
        _kernels_allowed(spec, u)
        and all(
            _shard_counts(spec, dd) == (1, 1, 1)
            for dd in range(d, spec.ndepths)
        )
    ):
        from mg_ic_code_tpu.ops import coarse_tower as ct

        if ct.tower_supported(spec, coefs, d):
            return ct.tower_vcycle(spec, coefs, d, u, rhs)
    u = relax(spec, coefs, d, u, rhs, spec.nsmooth)
    if d + 1 < spec.ndepths:
        rc = st.restrict_residual(
            _ghost(spec, d, u), rhs, coefs["a"][d], coefs["b"][d],
            spec.alpha, spec.beta, spec.dx[d],
        )
        ec = jnp.zeros_like(rc)
        for _ in range(max(spec.num_mg, 1)):
            ec = mg_vcycle(spec, coefs, ec, rc, d + 1)
        u = st.prolong_inc(u, ec)
        u = relax(spec, coefs, d, u, rhs, spec.nsmooth)
    else:
        u = bottom_solve(spec, coefs, d, u, rhs)
    return u


# jitted entry points (spec and depth are static)
mg_vcycle_jit = jax.jit(mg_vcycle, static_argnums=(0, 4))
relax_jit = jax.jit(relax, static_argnums=(0, 2, 5))
residual_homog_jit = jax.jit(residual_homog, static_argnums=(0, 2))
build_level_coefs_jit = jax.jit(build_level_coefs, static_argnums=(0,))
