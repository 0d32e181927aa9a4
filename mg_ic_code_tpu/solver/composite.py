"""Composite (multi-level AMR) operator, V-cycle preconditioner and linear
solve.

TPU-native re-design of Chombo's MultilevelLinearOp + AMRMultiGrid as driven
by the reference (Main_PoissonSolver.cpp:103-184):

  * composite_apply/residual — the AMR hierarchy as ONE linear operator on
    the list of per-level arrays: each level applies L with quadratic
    coarse-fine ghosts interpolated from the same vector's coarser component
    (QuadCFInterp coupling) and physical BCs; no reflux, matching the
    reference's disabled reflux (VariableCoeffPoissonOperator.cpp:264-271).
  * amr_vcycle — correction-scheme V-cycle across AMR levels (homogeneous CF
    ghosts during smoothing), with the full MG depth chain + bottom solve
    below the base level.
  * precond — m_num_mg_iterations AMR V-cycles (MultilevelLinearOp::preCond).
  * solve_linear — BiCGStab over the composite vector with volume-weighted
    dots and max-norm convergence (solver.m_normType = 0).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from mg_ic_code_tpu.config import SolverConfig
from mg_ic_code_tpu.grid.geometry import HierarchyGeom
from mg_ic_code_tpu.ops import stencils as st
from mg_ic_code_tpu.ops.ghosts import fill_ghosts
from mg_ic_code_tpu.solver import multigrid as mg
from mg_ic_code_tpu.solver import reductions as red
from mg_ic_code_tpu.solver.bicgstab import BiCGStabResult, bicgstab


@dataclasses.dataclass(frozen=True)
class AMRSolverSpec:
    """Static description of the composite solver (hashable; jit-static)."""

    geom: HierarchyGeom
    alpha: float
    beta: float
    nsmooth: int
    num_mg_iterations: int
    avg_type: str
    level_specs: tuple[mg.LevelMGSpec, ...]
    tol: float = 1.0e-10
    max_iter: int = 100
    # stop when an iteration shrinks the residual by less than this factor
    # (Chombo BiCGStabSolver m_hang default 1e-8; params.txt `hang` key)
    hang: float = 1.0e-8
    # preCondSolverDepth (MultilevelLinearOp): when >= 0 the preconditioner
    # is itself an inner BiCGStab solve (loosely converged), preconditioned
    # by the AMR V-cycles — the reference's commented-out deep-precondition
    # mode (params.txt:32). -1 = plain V-cycle preconditioning.
    pre_cond_solver_depth: int = -1
    # run the MG preconditioner in reduced precision ("float32") while the
    # outer Krylov stays f64 — the TPU-native mixed-precision mode (f64 is
    # software-emulated on TPU; the preconditioner only needs smoother-grade
    # accuracy). None = same precision as the operands.
    precond_dtype: str | None = None

    @property
    def num_levels(self) -> int:
        return self.geom.num_levels


def make_amr_spec(
    geom: HierarchyGeom, cfg: SolverConfig, mesh=None
) -> AMRSolverSpec:
    """`mesh` (jax.sharding.Mesh, optional) switches the hot smoother and
    residual onto the explicit shard_map + ppermute-halo production path
    wherever a depth's x extent shards usefully (multigrid._shard_count)."""
    level_specs = tuple(
        mg.make_level_spec(
            geom, l, cfg.alpha, cfg.beta, cfg.num_mg_smooth,
            cfg.coefficient_average_type,
            # depth chains below the base level only (ref ratio 2 puts all
            # intermediate MG depths under AMR level 0)
            with_depths=(l == 0),
            smoother=cfg.smoother,
            num_mg=cfg.num_mg,
            mesh=mesh,
            bottom=cfg.bottom_solver,
        )
        for l in range(geom.num_levels)
    )
    return AMRSolverSpec(
        geom=geom,
        alpha=cfg.alpha,
        beta=cfg.beta,
        nsmooth=cfg.num_mg_smooth,
        num_mg_iterations=cfg.num_mg_iterations,
        avg_type=cfg.coefficient_average_type,
        level_specs=level_specs,
        tol=cfg.tolerance,
        max_iter=cfg.max_iterations,
        hang=cfg.hang,
        pre_cond_solver_depth=cfg.pre_cond_solver_depth,
        precond_dtype=(
            "float32" if cfg.precond_precision == "single" else None
        ),
    )


def build_coefs(spec: AMRSolverSpec, a_list, b_list=None) -> tuple[dict, ...]:
    """Per-level coefficient structures (with depth chains under level 0).

    With mixed-precision preconditioning, each level also carries an "lp"
    sub-dict holding float32 casts of the whole depth chain."""
    out = []
    lp_dtype = jnp.float32 if spec.precond_dtype == "float32" else None
    for l in range(spec.num_levels):
        b0 = None if b_list is None else b_list[l]
        c = mg.build_level_coefs(spec.level_specs[l], a_list[l], b0)
        if lp_dtype is not None:
            cast = lambda t: tuple(
                None if x is None else x.astype(lp_dtype) for x in t
            )
            c = dict(c)
            c["lp"] = {k: cast(c[k]) for k in ("a", "b", "lam")}
            if c.get("binv") is not None:
                # the dense bottom inverse must ride along or the f32
                # preconditioner silently falls back to the launch-bound
                # BiCGStab bottom tower (code-review r2)
                c["lp"]["binv"] = c["binv"].astype(lp_dtype)
        out.append(c)
    return tuple(out)


def _lp(coefs_l: dict, use_lp: bool) -> dict:
    return coefs_l["lp"] if use_lp and "lp" in coefs_l else coefs_l


# --------------------------------------------------------------- operator


def composite_apply(
    spec: AMRSolverSpec, coefs, u_list, homogeneous_phys: bool = True,
    use_lp: bool = False,
):
    """A(u) on the composite vector. CF ghosts always couple to the coarser
    component of u itself (that coupling is part of the linear operator);
    the `homogeneous_phys` flag only zeroes physical BC values. `use_lp`
    selects the low-precision coefficient set (the preconditioner's inner
    residuals)."""
    geom = spec.geom
    out = []
    for l in range(spec.num_levels):
        u_gh = fill_ghosts(
            u_list[l], geom, l,
            coarse_u=u_list[geom.parent[l]] if l > 0 else None,
            homogeneous_phys=homogeneous_phys,
        )
        c = _lp(coefs[l], use_lp)
        out.append(
            st.apply_op(
                u_gh, c["a"][0], c["b"][0], spec.alpha, spec.beta, geom.dx[l]
            )
        )
    return out


def composite_residual(
    spec: AMRSolverSpec, coefs, u_list, rhs_list, homogeneous_phys: bool = True
):
    au = composite_apply(spec, coefs, u_list, homogeneous_phys)
    return [r - a for r, a in zip(rhs_list, au)]


# ----------------------------------------------------------------- V-cycle


def amr_vcycle(spec: AMRSolverSpec, coefs, r_list, use_lp: bool = False):
    """One AMR V-cycle on the correction equation A e = r, from zero initial
    correction. Downsweep smooths each level with homogeneous CF ghosts and
    replaces the covered part of the next-coarser residual with the
    restricted fine residual; the base level runs the full MG depth chain;
    upsweep prolongs (piecewise-constant) and post-smooths."""
    geom = spec.geom
    nl = spec.num_levels
    r = list(r_list)
    e: list = [None] * nl

    # entries are ordered children-after-parents, so the reverse sweep
    # visits every child before (and restricts into) its parent — with
    # multi-patch levels, sibling patches write DISJOINT covered regions
    for l in range(nl - 1, 0, -1):
        ls = spec.level_specs[l]
        cl = _lp(coefs[l], use_lp)
        el = jnp.zeros_like(r[l])
        el = mg.relax(ls, cl, 0, el, r[l], spec.nsmooth)
        res_l = mg.residual_homog(ls, cl, 0, el, r[l])
        rc = st.restrict_full(res_l)
        p = geom.parent[l]
        r[p] = r[p].at[geom.child_slices(p, l)].set(rc)
        e[l] = el

    e[0] = mg.mg_vcycle(
        spec.level_specs[0], _lp(coefs[0], use_lp), jnp.zeros_like(r[0]), r[0]
    )

    for l in range(1, nl):
        ls = spec.level_specs[l]
        p = geom.parent[l]
        ec = e[p][geom.child_slices(p, l)]
        e[l] = st.prolong_inc(e[l], ec)
        # post-smooth with CF ghosts interpolated from the coarse
        # correction (homogeneous ghosts here amplify the CF mismatch by
        # 1/dx^2 per level — see mg.relax_cf)
        e[l] = mg.relax_cf(
            ls, _lp(coefs[l], use_lp), e[l], r[l], spec.nsmooth,
            geom, l, e[p],
        )
    return e


def precond(spec: AMRSolverSpec, coefs, r_list):
    """MultilevelLinearOp::preCond — m_num_mg_iterations AMR-MG iterations,
    each a composite-residual evaluation plus a V-cycle.

    With precond_dtype set, the whole preconditioner runs in reduced
    precision (cast in, cast out); the outer Krylov arithmetic stays in the
    operand dtype. With pre_cond_solver_depth >= 0 the V-cycle chain wraps
    into an inner loosely-converged BiCGStab (deep-precondition mode)."""
    if spec.pre_cond_solver_depth >= 0:
        inner = bicgstab(
            functools.partial(composite_apply, spec, coefs),
            r_list,
            precond_fn=functools.partial(_vcycle_precond, spec, coefs),
            dot_fn=functools.partial(red.composite_dot, geom=spec.geom),
            norm_fn=functools.partial(
                red.composite_max_norm, geom=spec.geom
            ),
            tol=1.0e-4,
            max_iter=8 + 4 * spec.pre_cond_solver_depth,
        )
        return inner.x
    return _vcycle_precond(spec, coefs, r_list)


def _vcycle_precond(spec: AMRSolverSpec, coefs, r_list):
    """The plain m_num_mg_iterations-V-cycle preconditioner body."""
    out_dtype = r_list[0].dtype
    use_lp = (
        spec.precond_dtype == "float32" and out_dtype == jnp.float64
    )
    if use_lp:
        r_list = [r.astype(jnp.float32) for r in r_list]
    e = [jnp.zeros_like(r) for r in r_list]
    for it in range(spec.num_mg_iterations):
        res = (
            r_list
            if it == 0
            else _composite_residual_coefs(
                spec, coefs, e, r_list, use_lp
            )
        )
        de = amr_vcycle(spec, coefs, res, use_lp)
        e = [a + b for a, b in zip(e, de)]
    if use_lp:
        e = [x.astype(out_dtype) for x in e]
    return e


def _composite_residual_coefs(spec, coefs, u_list, rhs_list, use_lp):
    """Composite residual with the (possibly low-precision) coefficient
    set, for the inner precond iterations."""
    au = composite_apply(spec, coefs, u_list, True, use_lp)
    return [r - a for r, a in zip(rhs_list, au)]


# ------------------------------------------------------------------ solve


def solve_linear(
    spec: AMRSolverSpec,
    coefs,
    rhs_list,
    x0_list=None,
    tol: float | None = None,
    max_iter: int | None = None,
) -> BiCGStabResult:
    """BiCGStab on the composite system, preconditioned by AMR multigrid.

    Inhomogeneous physical BCs are folded into the initial residual (the
    Krylov iteration itself runs with homogeneous BCs), as Chombo's
    solver.define(..., homogeneousBC=false) + solve() arrangement does.
    """
    geom = spec.geom
    if x0_list is None:
        x0_list = [jnp.zeros_like(r) for r in rhs_list]

    r0 = composite_residual(spec, coefs, x0_list, rhs_list, False)

    result = bicgstab(
        functools.partial(composite_apply, spec, coefs),
        r0,
        precond_fn=functools.partial(precond, spec, coefs),
        dot_fn=functools.partial(red.composite_dot, geom=geom),
        norm_fn=functools.partial(red.composite_max_norm, geom=geom),
        tol=spec.tol if tol is None else tol,
        max_iter=spec.max_iter if max_iter is None else max_iter,
        hang=spec.hang,
    )
    x = [a + b for a, b in zip(x0_list, result.x)]
    return result._replace(x=x)


@functools.partial(jax.jit, static_argnums=(0,))
def solve_linear_jit(spec: AMRSolverSpec, coefs, rhs_list, x0_list):
    return solve_linear(spec, coefs, rhs_list, x0_list)


composite_apply_jit = jax.jit(composite_apply, static_argnums=(0, 3, 4))
composite_residual_jit = jax.jit(composite_residual, static_argnums=(0, 4))
amr_vcycle_jit = jax.jit(amr_vcycle, static_argnums=(0,))
precond_jit = jax.jit(precond, static_argnums=(0,))
build_coefs_jit = jax.jit(build_coefs, static_argnums=(0,))
