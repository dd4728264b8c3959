"""The flagship model: drag-minimizing obstacle shape optimization in
steady incompressible Navier-Stokes channel flow, dim-generic (2D / 3D).

This is the TPU-native re-design of the reference drivers ``2d_admm.lua`` /
``3d_admm.lua`` end to end:

 outer loop (2d:782-1527)
   adjoint solve (2d:790-793)           -> solvers.ns_solver.adjoint_solve
   J' assembly + mask (2d:811-814)      -> solvers.ns_solver.shape_gradient
   step-size control loop (2d:836)      -> run(): sigma-halving retries
     ADMM loop (2d:868-1253)            -> optim.admm.admm_inner (jitted)
   mesh transform (2d:1284)             -> X += u (pure array op; revert is
                                           exact because we keep X)
   NS re-solve + drag (2d:1286-1294)    -> solvers.ns_solver.newton_solve
   descent test (2d:1300-1306)          -> same Armijo-style condition
   failure catalogue (2d:1308-1322)     -> history + telemetry files

The 2D sign/feature conventions are used everywhere (SURVEY.md section 2c):
the 3D driver's divergences (negated B vectors, plain drag comparison) are
algebraically absorbed by the consistent KKT formulation in optim.admm.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geomgen
from ..core.mesh import Hierarchy, MeshLevel, refine
from ..ops import deformation as dfm
from ..ops import navier_stokes as nsops
from ..ops.geometry import elem_geometry
from ..ops.p1space import P1VectorSpace
from ..optim import admm
from ..solvers import mg, ns_solver
from ..utils import debug


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """All reference CLI knobs (2d_admm.lua:43-87) in one place."""

    dim: int = 2
    num_refs: int = 3  # -numRefs
    num_steps: int = 400  # -numSteps
    visc: float = 0.02  # -visc
    stab: float = 0.0  # -stab
    sigma_threshold: float = 0.3  # -sigma_threshold
    scaling: float = 1.0  # -scaling
    line_search_param: float = 1e-5  # -line_search
    do_nothing: bool = True  # -bDoNothing
    vorder: int = 2  # velocity order (reference: constant vorder=2)
    b2nd_order: bool = False  # -b2ndOrder (2d:86): J'' term in the x-update
    high_order_scaling: float = 1.0  # -hscaling (2d:51)
    diameter: float = 6.0
    max_attempts_per_step: int = 12  # bound on the reference's while(true)
    grid_path: str | None = None  # load a .ugx instead of generating
    # NS pressure-block preconditioner: "mass" (lumped mass/nu Stokes
    # surrogate, default) vs "pcd" (Kay-Loghin-Wathen pressure
    # convection-diffusion Schur approximation).  PCD needs ~30-45% fewer
    # GMRES iterations (r1: 1380 vs 2460 at 2D refs=2 visc=0.02) but its
    # per-application cost measured ~7x on v5e (3D refs=2 visc=0.05:
    # 142 ms vs 22 ms per preconditioned iteration), so mass wins
    # wall-clock 4.75x there (12 s vs 57 s warm solve, same 3 Newton
    # iterations).  Revisit if the PCD pressure block's apply cost is
    # brought down to the scalar-V-cycle level it should be.
    pressure_precond: str = "mass"
    # velocity-block strength: V-cycle-preconditioned Richardson steps per
    # preconditioner application (patch NS backend).  >1 trades cheap
    # gather-free V-cycles for outer GMRES iterations (= expensive P2
    # jvps): measured outer iters 1380/1020/840 at 1/2/3 (2D refs=2 pcd)
    vel_inner: int = 1
    # ADMM linear-algebra backend: "patch" (brick-lattice stencil fast path,
    # ~6x on TPU; needs geomgen brick metadata), "global" (block-ELL, any
    # simplex mesh), or "auto" (patch when available)
    backend: str = "auto"
    # assembled lattice NS Jacobian (ops.ns_patchjac): the Krylov matvec
    # becomes a gather-free einsum over stored per-element blocks instead
    # of a matrix-free jvp re-running the quadrature loop every iteration
    # (the reference's AssembledOperator strategy, 2d_admm.lua:271).
    # "auto": on when patch metadata exists and W fits ns_jac_mem_cap
    ns_assembled_jac: str = "auto"  # "auto" | "on" | "off"
    ns_jac_mem_cap: float = 6e9  # bytes of W above which auto falls back
    # step-size control on ADMM failure: the 2D driver halves sigma
    # (2d_admm.lua:1269) but the 3D driver halves the J' scaling
    # (3d_admm.lua:1322).  Halving sigma TIGHTENS the gradient constraint
    # (retries get strictly harder - measured on grids/box_3D_elongated it
    # dead-ends step 1); halving scaling shrinks the step instead.  "auto"
    # follows the reference's dimension-specific convention.
    admm_failure_control: str = "auto"  # "auto" | "sigma" | "scaling"
    # -bNewtonOutput (2d:83): write __NewtonStats_step_N_ /
    # __NewtonIterations_step_N_ per accepted step.  Forces the host-stepped
    # ADMM driver (the per-iteration histories live on the host there).
    newton_output: bool = False
    # -bDebugOutput (2d:80): per-step mesh dump Mesh_lev{numRefs}_step{N}.ugx
    # (SaveGridLevelToFile, 2d:788) + VTUs of the x-update debug fields
    # ConsistentLu_step_N / RHSBigProb_N / delta_u (2d:962-1076).  The
    # reference writes the VTUs once per Newton iteration; here they hold
    # the LAST Newton iteration of the last ADMM iteration (the jitted
    # loops never materialize earlier iterates).  Forces the host-stepped
    # ADMM driver.
    debug_output: bool = False
    # -bDebugNodalPositions (2d:81, 3d:1393-1399): per accepted step, a VTU
    # "grid_positions" whose nodal vector field is the current (deformed)
    # vertex coordinates
    debug_nodal_positions: bool = False
    # -debugNans: host-side finite checks at every outer-loop phase boundary
    # (adjoint / J' / assemble / ADMM / NS re-solve); raises
    # utils.debug.NonFiniteError naming the phase (SURVEY section 5 NaN-
    # debugging row).  Combine with jax_debug_nans for op-level location.
    debug_nans: bool = False
    admm: admm.ADMMConfig = dataclasses.field(default_factory=admm.ADMMConfig)
    ns: ns_solver.NewtonConfig = dataclasses.field(default_factory=ns_solver.NewtonConfig)


def f32_presets(cfg: "ProblemConfig") -> "ProblemConfig":
    """Solver tolerances reachable in float32 (TPU default).  f64 targets
    like 1e-12 defect norms are below the f32 noise floor; these presets
    keep the same outer logic with achievable inner targets.

    The 3D x-update stop thresholds sit above the MEASURED f32 floors on
    the reference box grid (refs=1: |g| stalls ~4e-5 - the rounding floor
    of the constraint functionals over 10k+ elements on an O(200)-volume
    domain - and |DeltaLambda| bounces at ~7e-4 once the Krylov solves hit
    their own f32 floor).  With the r2 presets (1e-4/1e-5) the 3D Newton
    could NEVER report convergence, so every ADMM step "failed" and the
    step-size control halved scaling to dust (the round-2 TPU 3D attempt's
    0/16 accepted steps).  2D keeps the tighter values (its floors are an
    order lower and the 18-step refined.ugx trajectory validated them)."""
    import dataclasses as _dc

    if cfg.dim == 3:
        ns_tol_f, g_tol_f = 2e-3, 2e-4
    else:
        ns_tol_f, g_tol_f = 1e-4, 1e-5
    return _dc.replace(
        cfg,
        admm=_dc.replace(
            cfg.admm, ns_tol=max(cfg.admm.ns_tol, ns_tol_f),
            ns_abs_tol=max(cfg.admm.ns_abs_tol, 1e-5),
            ns_abs_llambda_tol=max(cfg.admm.ns_abs_llambda_tol, g_tol_f),
            lin_abs_tol=max(cfg.admm.lin_abs_tol, 1e-7),
            lin_rel_tol=max(cfg.admm.lin_rel_tol, 1e-7),
            # f32 BiCGStab floor grows with mesh size; accept stagnated
            # solves at <= 1e-4 relative (ADMMConfig.lin_accept_rel)
            lin_accept_rel=max(cfg.admm.lin_accept_rel, 1e-4),
        ),
        ns=_dc.replace(
            cfg.ns, accept_tol=max(cfg.ns.accept_tol, 1e-4),
            abs_tol=max(cfg.ns.abs_tol, 1e-6),
            lin_rel_tol=max(cfg.ns.lin_rel_tol, 1e-4),
            lin_abs_tol=max(cfg.ns.lin_abs_tol, 1e-6),
            # f32 noise floor: ~1e-6 relative is reachable with the exact
            # transposed block preconditioner; acceptBest keeps the best
            # iterate if GMRES stalls above it
            adj_rel_tol=max(cfg.ns.adj_rel_tol, 1e-6),
        ),
    )


def _continuation_ladder(visc: float, start: float = 0.16):
    """Geometric viscosity ladder start -> visc (empty tail if visc >= start)."""
    nus = []
    nu = start
    while nu > visc * 1.0001:
        nus.append(nu)
        nu *= 0.5
    nus.append(visc)
    return nus


@dataclasses.dataclass
class StepRecord:
    step: int
    drag: float
    drag_diff: float
    shape_derivative: float
    sigma: float
    scaling: float
    admm_iters: int
    newton_iters: int
    lin_iters: int
    attempts: int
    wall_time: float
    # per-solve-slot Krylov iteration sums (rhs, B_vol, B_x, B_y(, B_z)) -
    # the reference's sum_rhssolver/sum_b*solver counters (2d:1379-1381)
    solver_iters: tuple = ()


class ObstacleShapeOpt:
    """End-to-end shape optimization problem on a channel/obstacle mesh."""

    def __init__(self, cfg: ProblemConfig, hier: Hierarchy | None = None):
        self.cfg = cfg
        if hier is None:
            if cfg.grid_path is not None:
                hier = Hierarchy.from_ugx(cfg.grid_path, cfg.num_refs)
            else:
                # fixed-diagonal 2D quads carry brick metadata for the patch
                # backend (same geometry class; diagonals not alternated)
                diag = "alt" if cfg.backend == "global" else "fixed"
                base = (
                    geomgen.channel_2d(diag=diag)
                    if cfg.dim == 2
                    else geomgen.channel_3d()
                )
                levels = [base]
                for _ in range(cfg.num_refs):
                    levels.append(refine(levels[-1]))
                hier = Hierarchy(levels)
        assert hier.dim == cfg.dim
        self.hier = hier
        lvl = hier.fine
        self.def_space = P1VectorSpace.build(hier, dirichlet=("inlet", "wall", "outlet"))
        self.struct = self.def_space.mg_structure()
        self.ns_space = nsops.NSSpace.build(
            lvl,
            vorder=cfg.vorder,
            do_nothing=cfg.do_nothing,
            diameter=cfg.diameter,
        )
        self.elems = jnp.asarray(lvl.elems)
        self.free = self.def_space.free_mask()
        # NS preconditioner space: nu-weighted vector-Laplacian GMG on the
        # P1 space whose vertices coincide with the P2 velocity dofs
        # (once-refined hierarchy; see ns_solver.ns_gmg_precond_data)
        ns_dir = ("inlet", "wall", "obstacle_surface") + (
            () if cfg.do_nothing else ("outlet",)
        )
        if cfg.vorder == 2:
            pre_hier = Hierarchy(hier.levels + [refine(lvl)])
        else:
            pre_hier = hier
        self.pre_space = P1VectorSpace.build(pre_hier, dirichlet=ns_dir)
        # jacobi smoothing: the convection-diffusion operator is nonsymmetric
        self.pre_struct = dataclasses.replace(
            self.pre_space.mg_structure(pre_smooth=2, post_smooth=2),
            smoother="jacobi",
        )
        # NS velocity-block preconditioner on the patch (stencil) backend
        # when brick metadata is available: gather-free V-cycles, ~11x
        # cheaper per application than the block-ELL SpMV at 3D scale
        self.use_patch_ns = (
            cfg.backend in ("auto", "patch")
            and hier.levels[0].bricks is not None
        )
        if self.use_patch_ns:
            from ..core.patches import build_patchset as _bps
            from ..ops import sparsity as _sp_ns
            from ..ops.convdiff import convdiff_elem_mats as _cd_mats
            from ..solvers import patch_mg as _pmg_ns

            self.pre_ps = _bps(pre_hier, dirichlet=ns_dir)
            # smoother_w="f32": the NS preconditioner is transposed via
            # jax.vjp for the adjoint solve (transpose_M).  The pencil
            # kernel DOES carry a custom vjp now (pallas_stencil.apply_w_pc
            # differentiates in x), so this is a precision choice, not an
            # AD limitation: the conv-diff velocity block is nonsymmetric
            # and its bf16-rounded transpose has not been validated against
            # the adjointness check that killed the hand-built surrogates
            self._pre_struct_p = _pmg_ns.PatchMGStructure(
                self.pre_ps, pre_smooth=2, post_smooth=2, smoother="jacobi",
                smoother_w="f32",
            )
            self._pre_tabs_p = _pmg_ns.make_level_tables(
                self.pre_ps, jnp.asarray(lvl.coords).dtype
            )
            _pre_pat0 = self.pre_space.patterns[0]
            _pre_fixed0 = np.asarray(self.pre_space.fixed[0])
            _pre_elems0 = jnp.asarray(pre_hier.levels[0].elems)
            _d = cfg.dim

            def _pre_base_dense(arg):  # (V0, 2d) stacked [coords | velocity]
                c0, w0 = arg[:, :_d], arg[:, _d:].T
                em = _cd_mats(c0, _pre_elems0, w0, cfg.visc)
                v0 = _sp_ns.assemble_values(_pre_pat0, em)
                v0 = _sp_ns.bake_dirichlet(
                    _pre_pat0, v0, jnp.asarray(_pre_fixed0)
                )
                return jnp.linalg.inv(_sp_ns.to_dense(_pre_pat0, v0))

            self._pre_base_dense = _pre_base_dense
        self.obstacle_vmask = jnp.asarray(
            lvl.subset_vertices["obstacle_surface"]
        ).astype(jnp.asarray(lvl.coords).dtype)
        self.X0 = jnp.asarray(lvl.coords)
        _, _, _, vol = elem_geometry(self.X0, self.elems)
        self.ref_volume = jnp.sum(vol)
        self.ref_barycenter = dfm.barycenter(self.X0, self.elems, jnp.zeros_like(self.X0.T))

        # jitted pipeline pieces (static self via closure; arrays traced)
        a = cfg.admm
        # ---- ADMM backend selection -------------------------------------
        # patch (brick-lattice stencil) when the mesh carries brick metadata;
        # b2ndOrder's extra_hvp lives on global fields, so it forces global
        self.use_patch = (
            cfg.backend in ("auto", "patch")
            and hier.levels[0].bricks is not None
            and not cfg.b2nd_order
        )
        if cfg.backend == "patch" and not self.use_patch:
            raise ValueError(
                "backend='patch' needs brick metadata (geomgen mesh) and "
                "b2nd_order=False"
            )
        if self.use_patch:
            from ..core.patches import build_patchset
            from ..ops import patchstencil as pst
            from ..ops import sparsity as _sp
            from ..ops.deformation import deformation_corner_block_fn
            from ..solvers import patch_mg as _pmg

            self.patchset = build_patchset(hier, dirichlet=("inlet", "wall", "outlet"))
            self._pmg_struct = _pmg.PatchMGStructure(self.patchset)
            self._pmg_tabs = _pmg.make_level_tables(
                self.patchset, jnp.asarray(lvl.coords).dtype
            )
            _pat0 = self.def_space.patterns[0]
            _fixed0 = np.asarray(self.def_space.fixed[0])
            _elems0 = jnp.asarray(hier.levels[0].elems)

            def _base_dense_fn(coords0):
                em0 = dfm.deformation_elem_mats(coords0, _elems0, a.c_eps, a.tau, a.c_mass)
                v0 = _sp.assemble_values(_pat0, em0)
                v0 = _sp.bake_dirichlet(_pat0, v0, jnp.asarray(_fixed0))
                return jnp.linalg.inv(_sp.to_dense(_pat0, v0))

            _assemble_p = jax.jit(
                lambda X, tabs: _pmg.assemble_patch_mg(
                    self.patchset, self._pmg_struct, X,
                    deformation_corner_block_fn(a.c_eps, a.tau, a.c_mass),
                    _base_dense_fn, tabs=tabs, sym=True,
                )
            )
            self._assemble = lambda X: _assemble_p(X, self._pmg_tabs)
            self._pst = pst
        else:
            # per-level compile-cached ELL assembly
            self._assemble = lambda X: self.def_space.assemble_mg(
                self.struct, X, a.c_eps, a.tau, a.c_mass
            )
        # level-k patchset for the NS-side lattice operators (assembled
        # Jacobian + patch PCD); shared with the ADMM backend when present
        if self.use_patch_ns:
            from ..core.patches import build_patchset as _bps_k

            self._ps_k = self.patchset if self.use_patch else _bps_k(hier)

        # ---- assembled NS Jacobian ----------------------------------------
        # lattice blocks (ops.ns_patchjac) on brick meshes; per-element
        # blocks (ops.ns_elljac) on unstructured .ugx meshes - the
        # reference's own grids, where the matrix-free jvp/vjp fallback
        # cost 312 ms/adjoint-iteration vs 30 on the lattice (ROADMAP r4)
        self.use_ns_jac = (
            self.use_patch_ns
            and cfg.vorder == 2
            and cfg.ns_assembled_jac != "off"
        )
        self.use_ell_jac = (
            not self.use_patch_ns
            and cfg.vorder == 2
            and cfg.ns_assembled_jac != "off"
        )
        if self.use_ell_jac:
            from ..ops import ns_elljac as _elljac

            _ewiring = _elljac.build_wiring(self.ns_space)
            _isz_e = jnp.asarray(lvl.coords).dtype.itemsize
            _need_e = _elljac.jac_memory_bytes(_ewiring, _isz_e)
            if cfg.ns_assembled_jac == "on" or _need_e <= cfg.ns_jac_mem_cap:
                self._ns_jac_builder = _elljac.make_assemble_fn(
                    self.ns_space, _ewiring, stab=cfg.stab
                )
                self._ns_jv, self._ns_jtv = _elljac.make_matvec_fns(
                    self.ns_space, _ewiring
                )
                _ell_bt = _elljac.make_bt_fn(self.ns_space, _ewiring)
                self._ns_bt = lambda zp, W: _ell_bt(zp, W)
                self._ns_b = _elljac.make_b_fn(self.ns_space, _ewiring)
                # treat as assembled-Jacobian-enabled everywhere below
                self.use_ns_jac = True
            else:
                self.use_ell_jac = False  # W would not fit; matrix-free jvp
        elif self.use_ns_jac:
            from ..ops import ns_patchjac as _nsjac
            from ..solvers import patch_mg as _pmg_j

            _ps_k = self._ps_k
            _wiring = _nsjac.build_wiring(_ps_k)
            _isz = jnp.asarray(lvl.coords).dtype.itemsize
            _need = _nsjac.jac_memory_bytes(_ps_k, _wiring, _isz)
            if cfg.ns_assembled_jac == "on" or _need <= cfg.ns_jac_mem_cap:
                _tab_f = self._pre_tabs_p[-1]
                _tab_c = (
                    self._pmg_tabs[-1]
                    if self.use_patch
                    else _pmg_j.make_level_tables(
                        _ps_k, jnp.asarray(lvl.coords).dtype
                    )[-1]
                )
                self._ns_jac_builder = _nsjac.make_assemble_fn(
                    self.ns_space, _ps_k, self.pre_ps, _wiring, stab=cfg.stab
                )
                self._ns_jv, self._ns_jtv = _nsjac.make_matvec_fns(
                    self.ns_space, _ps_k, self.pre_ps, _wiring, _tab_f, _tab_c
                )
                self._ns_bt = _nsjac.make_bt_fn(
                    self.ns_space, _ps_k, self.pre_ps, _wiring, _tab_f
                )
            else:
                self.use_ns_jac = False  # W would not fit; matrix-free jvp

        p2iso = cfg.vorder == 2
        # velocity-block data/action, backend-selected (patch vs block-ELL)
        if self.use_patch_ns:
            _parents_fine = (
                jnp.asarray(self.pre_space.parents[-1]) if p2iso else None
            )

            def _vel_pre_raw(X, s, nu, adjoint):
                return ns_solver.ns_gmg_precond_data_patch(
                    self.ns_space, self.pre_ps, self._pre_struct_p,
                    self._pre_tabs_p, self._pre_base_dense, _parents_fine,
                    X, nu, s=s, p2_iso=p2iso, adjoint=adjoint,
                )

            def _zero_s(X):
                return self.ns_space.pack(
                    jnp.zeros((cfg.dim, self.ns_space.n_vel), X.dtype),
                    jnp.zeros((self.ns_space.n_vertices,), X.dtype),
                )

            _vel_jit = {
                False: jax.jit(lambda X, s, nu: _vel_pre_raw(X, s, nu, False)),
                True: jax.jit(lambda X, s, nu: _vel_pre_raw(X, s, nu, True)),
            }

            def _vel_pre(X, s=None, adjoint=False, nu=None):
                return _vel_jit[bool(adjoint)](
                    X, _zero_s(X) if s is None else s,
                    cfg.visc if nu is None else nu,
                )

            def _vel_M(pre_data):
                return ns_solver.patch_velocity_M(
                    self.pre_ps, self._pre_struct_p, pre_data,
                    iters=cfg.vel_inner,
                )
        else:

            def _vel_pre(X, s=None, adjoint=False, nu=None):
                # with_transpose: store the exact A^T values per level so the
                # vjp-transposed preconditioner of the adjoint solve
                # (transpose_M) never emits a TPU scatter - the V-cycle's
                # reverse sweep costs the same as its forward sweep
                return ns_solver.ns_gmg_precond_data(
                    self.ns_space, self.pre_space, self.pre_struct, X,
                    cfg.visc if nu is None else nu,
                    s=s, p2_iso=p2iso, adjoint=adjoint, with_transpose=True,
                )

            def _vel_M(pre_data):
                return None  # ns_gmg_M/ns_pcd_M fall back to the ELL V-cycle

        # NOTE on nu: the preconditioner data is assembled at the CURRENT
        # continuation viscosity (the ladder would otherwise smooth with
        # target-visc operators while solving the nu-rung system).  The
        # triangular B^T coupling inside ns_gmg_M/ns_pcd_M is exact for any
        # visc (the pressure term of the momentum residual is
        # viscosity-independent), so cfg.visc there is not a mismatch.
        if cfg.pressure_precond == "pcd":
            # PCD Schur approximation (viscosity-robust pressure block;
            # ns_solver.ns_pcd_precond_data)
            self.p_space, self.p_struct = ns_solver.ns_pcd_spaces(
                hier, cfg.do_nothing
            )
            if self.use_patch_ns:
                # patch-backend PCD: Ap hierarchy + fine Fp stencil assemble
                # and apply gather-free on the level-k lattice
                from ..ops.convdiff import convdiff_elem_mats as _cd_p
                from ..ops import sparsity as _sp_p
                from ..solvers import patch_mg as _pmg_p

                _cdtype = jnp.asarray(lvl.coords).dtype
                self._pcd_tabs = ns_solver.pcd_patch_tables(
                    hier, self._ps_k, _cdtype
                )
                self._pcd_struct_p = _pmg_p.PatchMGStructure(
                    self._ps_k, pre_smooth=2, post_smooth=2, smoother="jacobi",
                    smoother_w="f32",
                )
                _p_pat0 = self.p_space.patterns[0]
                _p_fixed0 = np.asarray(self.p_space.fixed[0])
                _p_elems0 = jnp.asarray(hier.levels[0].elems)
                _dd = cfg.dim

                def _ap_base_dense(arg):  # (V0, 2d) stacked [coords | w]
                    c0, w0 = arg[:, :_dd], arg[:, _dd:].T
                    em = _cd_p(c0, _p_elems0, w0, 1.0, ncomp=1)
                    v0 = _sp_p.assemble_values(_p_pat0, em)
                    v0 = _sp_p.bake_dirichlet(
                        _p_pat0, v0, jnp.asarray(_p_fixed0)
                    )
                    return jnp.linalg.inv(_sp_p.to_dense(_p_pat0, v0))

                def _ns_pre(X, s=None, adjoint=False, nu=None):
                    pre_data, _ = _vel_pre(X, s=s, adjoint=adjoint, nu=nu)
                    pcd = ns_solver.ns_pcd_precond_data_patch(
                        self.ns_space, self._ps_k, self._pcd_struct_p,
                        self._pcd_tabs, _ap_base_dense, X,
                        cfg.visc if nu is None else nu, s=s, adjoint=adjoint,
                    )
                    return (pre_data,) + pcd + (X,)

                def _M_fn(r, pre_data, ap_data, W_fp, mp, X, W=None):
                    bt_fn = (
                        (lambda zp: self._ns_bt(zp, W))
                        if W is not None
                        else None
                    )
                    schur_fn = ns_solver.pcd_schur_patch_M(
                        self.ns_space, self._ps_k, self._pcd_struct_p,
                        self._pcd_tabs, ap_data, W_fp, mp,
                    )
                    return ns_solver.ns_pcd_M(
                        self.ns_space, self.pre_struct, pre_data, None,
                        None, None, None, mp,
                        coords=X, visc=cfg.visc, stab=cfg.stab,
                        vel_M=_vel_M(pre_data), bt_fn=bt_fn,
                        schur_fn=schur_fn,
                    )(r)
            else:

                def _ns_pre(X, s=None, adjoint=False, nu=None):
                    pre_data, _ = _vel_pre(X, s=s, adjoint=adjoint, nu=nu)
                    pcd = ns_solver.ns_pcd_precond_data(
                        self.ns_space, self.p_space, self.p_struct, X,
                        cfg.visc if nu is None else nu, s=s, adjoint=adjoint,
                    )
                    return (pre_data,) + pcd + (X,)

                def _M_fn(r, pre_data, ap_data, fp_vals, mp, X, W=None):
                    bt_fn = (
                        (lambda zp: self._ns_bt(zp, W))
                        if W is not None
                        else None
                    )
                    return ns_solver.ns_pcd_M(
                        self.ns_space, self.pre_struct, pre_data, self.p_space,
                        self.p_struct, ap_data, fp_vals, mp,
                        coords=X, visc=cfg.visc, stab=cfg.stab,
                        vel_M=_vel_M(pre_data), bt_fn=bt_fn,
                    )(r)
        else:

            def _ns_pre(X, s=None, adjoint=False, nu=None):
                return _vel_pre(X, s=s, adjoint=adjoint, nu=nu) + (X,)

            def _M_fn(r, pre_data, pdiag, X, W=None):
                # block-triangular coupling (coords/visc): ~1.6x fewer GMRES
                # iterations than the diagonal form (see ns_gmg_M)
                bt_fn = (
                    (lambda zp: self._ns_bt(zp, W)) if W is not None else None
                )
                return ns_solver.ns_gmg_M(
                    self.ns_space, self.pre_struct, pre_data, pdiag,
                    vel_M=_vel_M(pre_data),
                    coords=X, visc=cfg.visc, stab=cfg.stab, bt_fn=bt_fn,
                )(r)

        self._ns_pre = _ns_pre
        # monolithic Newton rebuilds the preconditioner at each iterate via
        # M_builder (frozen-at-s0 data costs 3.8x the GMRES iterations and
        # Newton's quadratic rate - see ns_solver.newton_solve)
        _jac_kw = (
            dict(
                jac_builder=lambda c, s, nu: self._ns_jac_builder(c, s, nu),
                jv_fn=lambda x, W: self._ns_jv(x, W),
            )
            if self.use_ns_jac
            else {}
        )
        self._ns_solve_pre = jax.jit(
            lambda X, s0, visc: ns_solver.newton_solve(
                self.ns_space, X, s0, visc, cfg.stab, cfg.ns,
                M_builder=lambda s: (
                    lambda r: _M_fn(r, *_ns_pre(X, s=s, nu=visc))
                ),
                **_jac_kw,
            )
        )
        # adjoint: EXACT transpose of the forward block preconditioner
        # (built at the converged state) via jax.vjp - reproduces the
        # forward solve's Krylov convergence on J^T (ns_solver.transpose_M;
        # measured 18x fewer iterations than the old diagonal surrogate,
        # which was the only stable hand-built option)
        def _adjoint_impl(X, s, lam0):
            m_args = _ns_pre(X, s=s)
            Jt_fn = None
            if self.use_ns_jac:
                W = self._ns_jac_builder(X, s, cfg.visc)
                Jt_fn = lambda x: self._ns_jtv(x, W)
                m_args = m_args + (W,)  # assembled B^T inside M too
            MT = ns_solver.transpose_M(
                lambda r: _M_fn(r, *m_args),
                self.ns_space.n_state, X.dtype,
            )
            return ns_solver.adjoint_solve(
                self.ns_space, X, s, cfg.visc, cfg.stab, cfg.ns, M=MT,
                Jt_fn=Jt_fn, x0=lam0,
            )

        self._adjoint_pre = jax.jit(_adjoint_impl)

        # host-chunked adjoint for large problems: the Arnoldi cycle is
        # split over bounded device executions (solvers.krylov.gmres_chunk_*)
        # with the basis resident on the device between executions.  This
        # keeps the FULL restart length - the r3 design capped the restart
        # itself at adj_exec_restart=100 for tunnel survival, which STARVES
        # the Krylov space exactly like the forward solve's restart=60
        # pathology (NewtonConfig.lin_restart note): measured at 3D refs=2
        # visc=0.02, the warm adjoint burned its full 1000-iteration budget
        # at restart 100 (250 s/step, 63% of the whole optimization step).
        # The lstsq residual estimate after each chunk also gives mid-cycle
        # early exit (the monolithic cycle always ran its full length).
        def _adj_wiring(X, s, m_args):
            MT = ns_solver.transpose_M(
                lambda r: _M_fn(r, *m_args), self.ns_space.n_state, X.dtype
            )

            def R(ss):
                return nsops.ns_residual(self.ns_space, X, ss, cfg.visc, cfg.stab)

            if self.use_ns_jac:
                W = m_args[-1]
                Jt = lambda v: self._ns_jtv(v, W)
            else:
                _, vjp = jax.vjp(R, s)
                Jt = lambda v: vjp(v)[0]
            gJ = jax.grad(
                lambda ss: nsops.drag(self.ns_space, X, ss, cfg.visc)
            )(s)
            return Jt, MT, gJ

        from ..solvers import krylov as _krylov
        from ..solvers.ns_solver import _restart_len as _rl_init

        # chunk length = the measured-safe per-execution iteration count;
        # restart length = the memory-budgeted full basis, rounded to whole
        # chunks (the chunk kernel has a static trip count)
        self._adj_ch = max(1, int(cfg.ns.adj_exec_restart))
        # mult=2 (restart ~400): measured r4 on the flagship, a single
        # 800-length f32 cycle FLOORS at est ~1.5e-4 from j=400 onward
        # (Arnoldi orthogonality loss) while two 400-cycles reach 1e-6 -
        # the restart re-anchors accuracy at the updated iterate, so
        # longer cycles past ~400 only burn iterations at the floor
        _rl_full = _rl_init(
            cfg.ns, int(self.ns_space.n_state),
            jnp.asarray(self.X0).dtype.itemsize, mult=2,
        )
        self._adj_rl = max(self._adj_ch, (_rl_full // self._adj_ch) * self._adj_ch)

        def _adj_start_impl(X, s, x, m_args):
            Jt, _, gJ = _adj_wiring(X, s, m_args)
            return _krylov.gmres_chunk_start(Jt, -gJ, x, self._adj_rl)

        def _adj_chunk_impl(X, s, V, Z, H, beta, j0, m_args):
            Jt, MT, _ = _adj_wiring(X, s, m_args)
            return _krylov.gmres_chunk_arnoldi(
                Jt, MT, V, Z, H, beta, j0, self._adj_ch
            )

        self._adj_start = jax.jit(_adj_start_impl)
        self._adj_chunk = jax.jit(_adj_chunk_impl)
        self._adj_finish = jax.jit(_krylov.gmres_chunk_finish)

        # GCRO-DR recycling (krylov.gcro_*): the adjoint operator drifts
        # slowly across optimization steps, so the slow modes its restarted
        # cycles keep re-discovering are carried in a recycle space U
        # (harmonic Ritz vectors), re-imaged against the current operator
        # at the cost of adj_recycle_k plain applies per step
        def _adj_prepare_impl(X, s, U, m_args):
            Jt, _, _ = _adj_wiring(X, s, m_args)
            return _krylov.gcro_prepare(Jt, U)

        def _adj_start_defl_impl(X, s, x, U, C, m_args):
            Jt, _, gJ = _adj_wiring(X, s, m_args)
            return _krylov.gcro_chunk_start(Jt, -gJ, x, U, C, self._adj_rl)

        def _adj_chunk_defl_impl(X, s, C, V, Z, H, B, beta, j0, m_args):
            Jt, MT, _ = _adj_wiring(X, s, m_args)
            return _krylov.gcro_chunk_arnoldi(
                Jt, MT, C, V, Z, H, B, beta, j0, self._adj_ch
            )

        self._adj_prepare = jax.jit(_adj_prepare_impl)
        self._adj_start_defl = jax.jit(_adj_start_defl_impl)
        self._adj_chunk_defl = jax.jit(_adj_chunk_defl_impl)
        self._adj_finish_defl = jax.jit(_krylov.gcro_chunk_finish)
        self._adj_gj_norm = jax.jit(
            lambda X, s: jnp.linalg.norm(
                jax.grad(
                    lambda ss: nsops.drag(self.ns_space, X, ss, cfg.visc)
                )(s)
            )
        )

        def _adjoint_stepped(X, s, lam0):
            import os as _os

            dbg = _os.environ.get("ADJ_DEBUG") == "1"
            _t00 = time.perf_counter()

            def _t():
                return time.perf_counter()

            def _p(msg):
                # absolute offset since function entry: the axon tunnel's
                # fetches do not reliably block where expected, so local
                # timers alone mislocate the wall time
                print(f"    [adj +{_t() - _t00:7.2f}s] {msg}", flush=True)

            t0 = _t()
            ncfg = cfg.ns
            target = float(
                max(
                    ncfg.lin_abs_tol,
                    ncfg.adj_rel_tol * float(self._adj_gj_norm(X, s)),
                )
            )
            t1 = _t()
            m_args = _ns_pre(X, s=s)
            jax.block_until_ready(jax.tree_util.tree_leaves(m_args)[0])
            t2 = _t()
            if self.use_ns_jac:
                m_args = m_args + (self._ns_jac_jit(X, s, cfg.visc),)
                jax.block_until_ready(m_args[-1])
            t3 = _t()
            if dbg:
                _p(
                    f"gj_norm {t1 - t0:.2f}s pre {t2 - t1:.2f}s "
                    f"W {t3 - t2:.2f}s target {target:.3e}"
                )
            x = lam0
            total = 0
            budget = 4 * ncfg.lin_max_iters
            rn = jnp.asarray(jnp.inf, s.dtype)
            beta_prev = None
            k_r = max(0, int(getattr(ncfg, "adj_recycle_k", 0)))
            # harmonic Ritz quality needs the cycle length to dwarf the
            # recycle dimension: at rl/k < 8 the selected directions are
            # noise and deflating them perturbs the restart path for no
            # gain (measured: 2D refs=1 fixture at rl=24/k=6 took MORE
            # iterations recycled than plain)
            if self._adj_rl < 8 * k_r:
                k_r = 0
            U = C = None
            if (
                k_r > 0
                and self._cur_adj_U is not None
                and self._cur_adj_U.shape[0] == k_r
            ):
                tc = _t()
                U, C = self._adj_prepare(X, s, self._cur_adj_U, m_args)
                jax.block_until_ready(C)
                total += k_r  # k plain applies (no M): charged to the budget
                if dbg:
                    _p(f"recycle prepare k={k_r} {_t() - tc:.2f}s")
            while True:
                tc = _t()
                if U is not None:
                    x_p, V, Z, H, B, beta = self._adj_start_defl(
                        X, s, x, U, C, m_args
                    )
                else:
                    V, Z, H, beta = self._adj_start(X, s, x, m_args)
                    B, x_p = None, x
                rn = beta
                bf = float(beta)
                if dbg:
                    _p(f"start {_t() - tc:.2f}s beta {bf:.3e}"
                       + (" [defl]" if U is not None else ""))
                if bf <= target or total >= budget:
                    x = x_p
                    break
                if beta_prev is not None and not (
                    bf < beta_prev * (1.0 - 1e-6)
                ):
                    # cycle stagnated (f32 floor); keep the iterate beta was
                    # measured at (the U-projection never grows the residual)
                    x = x_p
                    break
                beta_prev = bf
                x = x_p
                j, est = 0, beta
                while j < self._adj_rl and float(est) > target and total < budget:
                    tc = _t()
                    if U is not None:
                        V, Z, H, B, est = self._adj_chunk_defl(
                            X, s, C, V, Z, H, B, beta,
                            jnp.asarray(j, jnp.int32), m_args,
                        )
                    else:
                        V, Z, H, est = self._adj_chunk(
                            X, s, V, Z, H, beta, jnp.asarray(j, jnp.int32),
                            m_args,
                        )
                    j += self._adj_ch
                    total += self._adj_ch
                    if dbg:
                        _p(f"chunk j={j} {_t() - tc:.2f}s est {float(est):.3e}")
                tc = _t()
                if U is not None:
                    x = self._adj_finish_defl(x, Z, H, B, beta, U)
                else:
                    x = self._adj_finish(x, Z, H, beta)
                jax.block_until_ready(x)
                if dbg:
                    _p(f"finish {_t() - tc:.2f}s")
                if k_r > 0:
                    tc = _t()
                    Un, Cn = _krylov.gcro_update_recycle(
                        U, C, V, Z, H, B, k_r, j
                    )
                    # keep the jitted kernels' shapes stable: only adopt a
                    # full-rank refresh (rank loss here is degenerate)
                    if Un.shape[0] == k_r:
                        U, C = Un, Cn
                    if dbg:
                        _p(f"recycle update {_t() - tc:.2f}s "
                           f"k={int(Un.shape[0])}")
            if k_r > 0 and U is not None:
                self._cur_adj_U = U
            return x, rn, jnp.asarray(total, jnp.int32)

        self._adjoint_stepped_fn = _adjoint_stepped

        # host-stepped Newton for large problems: monolithic Newton programs
        # (130+ MB code, multi-minute single executions) are unreliable
        # through the TPU tunnel and compile minutes-slow
        self._ns_stepped = int(lvl.num_elems) > 20000
        self._ns_step_cache = {}

        if self.use_ns_jac:
            # per-iterate args = preconditioner data + assembled Jacobian
            # blocks (shared by the Krylov matvec AND the B^T coupling)
            self._ns_jac_jit = jax.jit(
                lambda X, s, nu: self._ns_jac_builder(X, s, nu)
            )

            def _pre_full(X, s, nu):
                return self._ns_pre(X, s=s, nu=nu) + (
                    self._ns_jac_jit(X, s, nu),
                )

            _stepped_kw = dict(
                jv_fn=lambda x, W: self._ns_jv(x, W), jv_from_m=True
            )
        else:

            def _pre_full(X, s, nu):
                return self._ns_pre(X, s=s, nu=nu)

            _stepped_kw = {}

        # forward GCRO-DR recycle space, carried across Newton iterates,
        # continuation rungs, and optimization steps (newton_solve_stepped
        # re-images it per iterate)
        self._ns_recycle = {}

        def _ns_solve(X, s0, visc=None, verbose=False):
            nu = cfg.visc if visc is None else visc
            if self._ns_stepped or verbose:
                return ns_solver.newton_solve_stepped(
                    self.ns_space, X, s0, nu, cfg.stab, cfg.ns,
                    M_fn=_M_fn, m_args=_pre_full(X, s0, nu),
                    pre_fn=lambda s: _pre_full(X, s, nu),
                    step_jit_cache=self._ns_step_cache,
                    verbose=verbose, recycle=self._ns_recycle,
                    **_stepped_kw,
                )
            return self._ns_solve_pre(X, s0, nu)

        def _adjoint(X, s):
            # warm start from the previous step's adjoint (zeros initially);
            # the residual target is vs |rhs|, so this only cuts iterations
            lam0 = (
                self._cur_lam_adj
                if self._cur_lam_adj is not None
                else jnp.zeros_like(s)
            )
            if self._ns_stepped:
                return self._adjoint_stepped_fn(X, s, lam0)
            return self._adjoint_pre(X, s, lam0)

        self._ns_solve = _ns_solve
        self._adjoint = _adjoint
        self._jprime = jax.jit(
            lambda X, s, lam: ns_solver.shape_gradient(
                self.ns_space, X, s, lam, cfg.visc, cfg.stab, self.obstacle_vmask
            ).T
            * self.free  # (C, V); deformation BCs also fix inlet/wall/outlet
        )
        self._drag = jax.jit(lambda X, s: nsops.drag(self.ns_space, X, s, cfg.visc))

        def _admm_impl(mgdata, X, Jp, sigma, scaling, s, lam_adj):
            extra = None
            if cfg.b2nd_order:
                # second-order term (-b2ndOrder, 2d:86, 389-419): the
                # directional derivative of the frozen-(s, lambda) shape
                # gradient - AD replaces the hand-coded J'' element terms
                def jprime_of_X(XX):
                    return (
                        ns_solver.shape_gradient(
                            self.ns_space, XX, s, lam_adj, cfg.visc, cfg.stab,
                            self.obstacle_vmask,
                        ).T
                        * self.free
                    )

                def extra(x):
                    return cfg.high_order_scaling * jax.jvp(
                        jprime_of_X, (X,), (x.T,)
                    )[1]

            if self.use_patch:
                from ..optim.spaces import PatchOps

                ps = self.patchset
                pst = self._pst
                pops = PatchOps(self._pmg_struct, mgdata, pst.to_patch(ps.fine, X.T))
                Jp_p = pst.to_patch(ps.fine, Jp)
                st = admm.admm_inner_ops(
                    a, pops, Jp_p, sigma, scaling,
                    self.ref_volume, self.ref_barycenter, extra_hvp=None,
                )
                # hand the host a GLOBAL u (X update + shape derivative)
                u_g = pst.from_patch(ps.fine, st.u, X.shape[0], mode="owner")
                return dataclasses.replace(st, u=u_g)
            return admm.admm_inner(
                a, self.struct, mgdata, X, self.elems, self.free, Jp,
                sigma, scaling, self.ref_volume, self.ref_barycenter,
                extra_hvp=extra,
            )

        self._admm_full = jax.jit(_admm_impl)
        # host-stepped ADMM for large problems (one device execution per
        # ADMM iteration; see optim.admm.admm_inner_stepped)
        self._admm_stepped_on = self.use_patch and int(lvl.num_elems) > 20000
        if self.use_patch:
            from ..optim.spaces import PatchOps

            _struct_p = self._pmg_struct
            _ps = self.patchset

            def _patch_ops_builder(mgdata, coords_p):
                return PatchOps(_struct_p, mgdata, coords_p)

            self._patch_ops_builder = _patch_ops_builder
            self._patch_conv = jax.jit(
                lambda X, Jp: (
                    self._pst.to_patch(_ps.fine, X.T),
                    self._pst.to_patch(_ps.fine, Jp),
                )
            )
            self._patch_u_to_global = jax.jit(
                lambda u, n=lvl.num_vertices: self._pst.from_patch(
                    _ps.fine, u, n, mode="owner"
                )
            )
        self._admm_kernel_cache = {}

        # global-representation builder for the host-stepped driver (used
        # when per-iteration u output is requested on the block-ELL backend)
        _g_struct, _g_elems, _g_free = self.struct, self.elems, self.free

        def _global_ops_builder(mgdata, coords):
            from ..optim.spaces import GlobalOps

            return GlobalOps(_g_struct, mgdata, coords, _g_elems, _g_free)

        self._global_ops_builder = _global_ops_builder

        def _admm_dispatch(mgdata, X, Jp, sigma, scaling, iter_cb=None,
                           newton_hist_out=None, full_stats_out=None,
                           debug_out=None):
            # the host-stepped driver runs when the problem is large (one
            # device execution per ADMM iteration), when the caller wants
            # every iterate's u (-bOutputIntermediateUp, 2d:84), when
            # per-Newton-iteration telemetry is requested (-bNewtonOutput,
            # 2d:1256-1259), or when -bDebugOutput field dumps are wanted -
            # the monolithic jitted loop never materializes intermediates
            if (self._admm_stepped_on or iter_cb is not None
                    or newton_hist_out is not None or debug_out is not None):
                if self.use_patch:
                    coords_p, Jp_p = self._patch_conv(X, Jp)
                    cb = (
                        None
                        if iter_cb is None
                        else lambda k, up: iter_cb(k, self._patch_u_to_global(up))
                    )
                    st = admm.admm_inner_stepped(
                        a, self._patch_ops_builder, (mgdata, coords_p), Jp_p,
                        float(sigma), float(scaling),
                        self.ref_volume, self.ref_barycenter,
                        self._admm_kernel_cache, iter_cb=cb,
                        newton_hist_out=newton_hist_out,
                        full_stats_out=full_stats_out,
                        debug_out=debug_out,
                    )
                    if debug_out:
                        for k in ("Lu", "rhs_large", "du"):
                            debug_out[k] = self._patch_u_to_global(debug_out[k])
                    return dataclasses.replace(st, u=self._patch_u_to_global(st.u))
                return admm.admm_inner_stepped(
                    a, self._global_ops_builder, (mgdata, X), Jp,
                    float(sigma), float(scaling),
                    self.ref_volume, self.ref_barycenter,
                    self._admm_kernel_cache, iter_cb=iter_cb,
                    newton_hist_out=newton_hist_out,
                    full_stats_out=full_stats_out,
                    debug_out=debug_out,
                )
            return self._admm_full(
                mgdata, X, Jp, sigma, scaling, self._cur_s, self._cur_lam_adj
            )

        self._admm = _admm_dispatch
        self._cur_s = None
        self._cur_lam_adj = None
        self._cur_adj_U = None  # GCRO-DR recycle space, carried across steps
        # element-inversion check must be relative to the undeformed mesh's
        # orientation (brick/Kuhn meshes carry mixed signed orientations)
        _s0 = jnp.sign(elem_geometry(self.X0, self.elems)[1])
        self._min_det = jax.jit(
            lambda X: jnp.min(_s0 * elem_geometry(X, self.elems)[1])
        )

    # ------------------------------------------------------------------
    def _write_mesh_ugx(self, path: str, X) -> None:
        """Per-step mesh dump at the CURRENT (deformed) coordinates - the
        -bDebugOutput SaveGridLevelToFile parity (reference 2d:788)."""
        from ..core.ugx import SubsetInfo, UgxGrid, write_ugx

        lvl = self.hier.fine
        coords = np.zeros((lvl.num_vertices, 3))
        coords[:, : lvl.dim] = np.asarray(X)
        elems = np.asarray(lvl.elems)
        empty = np.zeros((0,), np.int32)
        subsets = {
            name: SubsetInfo(
                name=name,
                vertices=np.nonzero(mask)[0].astype(np.int32),
                edges=empty, faces=empty, volumes=empty,
            )
            for name, mask in lvl.subset_vertices.items()
        }
        write_ugx(
            path,
            UgxGrid(
                name="defGrid",
                coords=coords,
                edges=np.asarray(lvl.edges),
                triangles=elems if lvl.dim == 2 else np.zeros((0, 3), np.int32),
                tetrahedrons=(
                    elems if lvl.dim == 3 else np.zeros((0, 4), np.int32)
                ),
                subsets=subsets,
            ),
        )

    def initial_state(self, X) -> jnp.ndarray:
        g = nsops.inlet_values(self.ns_space, X)
        return self.ns_space.pack(g, jnp.zeros(self.ns_space.n_pressure))

    # ---- warm-state sidecar -------------------------------------------
    # The supervisor restarts the process on every tunnel fault; without
    # this, each restart cold-starts the adjoint (zeros initial guess, no
    # recycle space) and re-pays the full first-solve Krylov cost.  Saved
    # SEPARATELY from checkpoint.npz: it is a pure accelerator (results
    # are identical without it) and ~50 MB at flagship size, so it stays
    # out of the committed trajectory records.
    def _save_warm_sidecar(self, checkpoint_path: str) -> None:
        try:
            arrs = {}
            if self._cur_lam_adj is not None:
                arrs["lam_adj"] = np.asarray(self._cur_lam_adj)
            if self._cur_adj_U is not None:
                arrs["adj_U"] = np.asarray(self._cur_adj_U)
            ns_u = self._ns_recycle.get("U")
            if ns_u is not None:
                arrs["ns_U"] = np.asarray(ns_u)
            if not arrs:
                return
            tmp = checkpoint_path + ".warm.tmp.npz"
            np.savez(tmp, **arrs)
            os.replace(tmp, checkpoint_path + ".warm.npz")
        except Exception as e:  # noqa: BLE001 - never fail a step on this
            print(f"warm sidecar save failed ({e!r})", flush=True)

    def _load_warm_sidecar(self, checkpoint_path: str) -> None:
        path = checkpoint_path + ".warm.npz"
        if not os.path.exists(path):
            return
        try:
            with np.load(path) as z:
                n = int(self.ns_space.n_state)
                if "lam_adj" in z and z["lam_adj"].shape == (n,):
                    self._cur_lam_adj = jnp.asarray(z["lam_adj"])
                if "adj_U" in z and z["adj_U"].shape[-1:] == (n,):
                    self._cur_adj_U = jnp.asarray(z["adj_U"])
                if "ns_U" in z and z["ns_U"].shape[-1:] == (n,):
                    self._ns_recycle["U"] = jnp.asarray(z["ns_U"])
            print(
                f"warm sidecar restored ({', '.join(sorted(z.files))})",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"warm sidecar load failed ({e!r})", flush=True)

    def run(
        self,
        num_steps: int | None = None,
        telemetry=None,
        callback: Callable | None = None,
        verbose: bool = False,
        resume: dict | None = None,
        checkpoint_path: str | None = None,
        profiler=None,
        catalog_failures: bool = True,
        admm_iter_cb: Callable | None = None,
    ) -> list[StepRecord]:
        """Full optimization loop.  Returns per-accepted-step records.

        resume: dict from io.checkpoint.load_checkpoint (X, s, sigma, step,
        drag_old); checkpoint_path: save after every accepted step;
        profiler: utils.profiling.Profiler (ProfileLUA parity, 2d:14);
        admm_iter_cb(step, attempt, k, u): fired with every ADMM iterate's
        deformation u (C, V) (-bOutputIntermediateUp, 2d:84) - forces the
        host-stepped ADMM driver."""
        from ..utils.profiling import NULL

        prof = profiler if profiler is not None else NULL
        cfg = self.cfg
        num_steps = num_steps if num_steps is not None else cfg.num_steps
        history: list[StepRecord] = []
        failures: list[dict] = []
        if resume is not None:
            X = jnp.asarray(resume["X"])
            s = jnp.asarray(resume["s"])
            sigma = float(resume["sigma"])
            drag_old = float(resume["drag_old"])
            start_step = int(resume["step"]) + 1
            if checkpoint_path is not None:
                self._load_warm_sidecar(checkpoint_path)
            # restore the accepted-step history so telemetry files stay
            # contiguous across restarts (one __Drag.txt for the whole run)
            if "history_json" in resume:
                import json as _json

                for rd in _json.loads(str(resume["history_json"])):
                    rd["solver_iters"] = tuple(rd.get("solver_iters", ()))
                    history.append(StepRecord(**rd))
            if "failures_json" in resume:
                import json as _json

                failures = _json.loads(str(resume["failures_json"]))
        else:
            X = self.X0
            s0 = self.initial_state(X)
            # viscosity continuation for the cold start (the reference warm-
            # starts every subsequent solve from the previous flow field).
            # Adaptive: a failed rung is retried from the last converged
            # state at the geometric mean viscosity (measured 3D refs=2:
            # the 0.08 -> 0.05 halving stalled Newton, while inserting
            # 0.064/0.055 rungs converged each in 3 iterations)
            s = s0
            nus = list(_continuation_ladder(cfg.visc))
            nu_ok = None
            bisects = 0
            i = 0
            conv = jnp.asarray(True)
            while i < len(nus):
                nu = nus[i]
                t_rung = time.perf_counter()
                s_try, it, nrm, conv = self._ns_solve(X, s, visc=nu)
                if bool(conv):
                    if verbose:
                        print(
                            f"continuation: nu={nu:.4f} newton={int(it)} "
                            f"|R|={float(nrm):.2e} "
                            f"[{time.perf_counter() - t_rung:.0f}s]"
                        )
                    s, nu_ok = s_try, nu
                    i += 1
                    continue
                if bisects >= 6:
                    break
                prev = nu_ok if nu_ok is not None else nus[0] * 2.0
                mid = float(np.sqrt(prev * nu))
                if verbose:
                    print(
                        f"continuation: nu={nu} failed (|R|={float(nrm):.2e}), "
                        f"inserting rung nu={mid:.4f}"
                    )
                nus.insert(i, mid)
                bisects += 1
            if not bool(conv):
                raise RuntimeError(f"initial NS solve failed: residual {float(nrm)}")
            drag_old = float(self._drag(X, s))
            sigma = cfg.sigma_threshold
            start_step = 0
            if checkpoint_path is not None:
                # checkpoint the POST-LADDER state as "step -1": the cold
                # viscosity continuation is the longest uncheckpointed
                # prefix (~10 min at 3D refs=2), and a device fault there
                # would otherwise re-pay it on every resume
                from ..io.checkpoint import save_checkpoint as _sc

                _sc(
                    checkpoint_path, step=-1, X=X, s=s, sigma=sigma,
                    drag_old=drag_old,
                    extra={"drag_init": drag_old, "history_json": "[]",
                           "failures_json": "[]"},
                )
        drag_init = (
            float(resume["drag_init"])
            if resume is not None and "drag_init" in resume
            else drag_old
        )

        def _vtu(name, coords, fields):
            if telemetry is None:
                return
            from ..io.vtk import write_vtu

            write_vtu(
                f"{telemetry.out_dir}/{name}.vtu", np.asarray(coords),
                np.asarray(self.elems),
                point_data={k: np.asarray(v) for k, v in fields.items()},
            )

        for step in range(start_step, num_steps):
            t0 = time.perf_counter()
            if cfg.debug_output and telemetry is not None:
                # SaveGridLevelToFile parity (2d:788): per-step mesh dump
                self._write_mesh_ugx(
                    f"{telemetry.out_dir}/Mesh_lev{cfg.num_refs}_step{step}.ugx",
                    X,
                )
            with prof.phase("adjoint"):
                lam_adj, adj_res, adj_iters = self._adjoint(X, s)
            if verbose:
                print(
                    f"  adjoint: {int(adj_iters)} its |r|={float(adj_res):.2e}",
                    flush=True,
                )
            if cfg.debug_nans:
                debug.check_finite("adjoint", lam_adj=lam_adj)
            with prof.phase("jprime", sync=None):
                Jp = self._jprime(X, s, lam_adj)
            if cfg.debug_nans:
                debug.check_finite("jprime", Jp=Jp)
            self._cur_s, self._cur_lam_adj = s, lam_adj
            self._cur_Jp = Jp  # exposed for -bDebugSensitivity output (2d:816)
            self._cur_X = X  # current (pre-update) mesh, for iterate output
            scaling = cfg.scaling  # reset each step (reference 2d:807)
            accepted = False
            attempts = 0
            while not accepted and attempts < cfg.max_attempts_per_step:
                attempts += 1
                with prof.phase("assemble"):
                    mgdata = self._assemble(X)
                if cfg.debug_nans:
                    debug.check_finite(
                        "assemble",
                        **{
                            f"mgdata_leaf{i}": leaf
                            for i, leaf in enumerate(
                                jax.tree_util.tree_leaves(mgdata)
                            )
                        },
                    )
                with prof.phase("admm", sync=None):
                    icb = (
                        None
                        if admm_iter_cb is None
                        else (
                            lambda k, u, _s=step, _a=attempts: admm_iter_cb(
                                _s, _a, k, u
                            )
                        )
                    )
                    newton_hist: list | None = (
                        [] if (cfg.newton_output and telemetry is not None) else None
                    )
                    full_stats: list = []
                    debug_out: dict | None = (
                        {} if (cfg.debug_output and telemetry is not None) else None
                    )
                    st = self._admm(
                        mgdata, X, Jp, jnp.asarray(sigma), jnp.asarray(scaling),
                        iter_cb=icb, newton_hist_out=newton_hist,
                        full_stats_out=full_stats, debug_out=debug_out,
                    )
                    jax.block_until_ready(st.u)
                if cfg.debug_nans:
                    debug.check_finite("admm", u=st.u, lam=st.lam)
                if bool(st.failed):
                    # 2d:1269 halves sigma; 3d:1322 halves scaling instead
                    fc = cfg.admm_failure_control
                    if fc == "auto":
                        fc = "scaling" if cfg.dim == 3 else "sigma"
                    if fc == "scaling":
                        scaling *= 0.5
                        if verbose:
                            print(f"step {step}: ADMM failed, scaling -> {scaling}")
                    else:
                        sigma *= 0.5
                        if verbose:
                            print(f"step {step}: ADMM failed, sigma -> {sigma}")
                    continue
                X_new = X + st.u.T
                with prof.phase("min_det"):
                    tangled = float(self._min_det(X_new)) <= 0.0
                if tangled:
                    sigma *= 0.5
                    if verbose:
                        print(f"step {step}: mesh tangled, sigma -> {sigma}")
                    continue
                with prof.phase("ns_solve"):
                    # per-Newton ConvCheck lines on the stepped path (the
                    # reference prints each Newton step too,
                    # obstacle_optim_util.lua:71-97); verbose only ADDS
                    # prints when the stepped driver is already active
                    s_new, nit, nnrm, nconv = self._ns_solve(
                        X_new, s, verbose=self._ns_stepped
                    )
                if cfg.debug_nans:
                    debug.check_finite("ns_solve", s=s_new)
                if not bool(nconv):
                    sigma *= 0.5
                    if verbose:
                        print(f"step {step}: NS diverged ({float(nnrm):.2e}), sigma -> {sigma}")
                    continue
                with prof.phase("drag"):
                    drag_new = float(self._drag(X_new, s_new))
                shape_deriv = float(st.scaling * jnp.vdot(Jp, st.u))
                ddiff = drag_new - drag_old
                # descent test (reference 2d:1300-1306)
                if ddiff > 0.0 or ddiff > cfg.line_search_param * shape_deriv:
                    failures.append(
                        dict(step=step, drag=drag_new, diff=ddiff, sigma=sigma)
                    )
                    if catalog_failures:
                        # failed-field VTU (reference 2d:1317-1321: nodal u
                        # as "u_fail" into failed_flows_step_N_failure)
                        _vtu(
                            f"failed_flows_step_{step}_failure_"
                            f"{len(failures) - 1}",
                            X, {"u_fail": np.asarray(st.u).T},
                        )
                    sigma *= 0.5  # revert is implicit: X unchanged
                    if verbose:
                        print(f"step {step}: not a descent ({ddiff:+.3e}), sigma -> {sigma}")
                    continue
                # accept
                X, s, drag_old = X_new, s_new, drag_new
                accepted = True
                rec = StepRecord(
                    step=step,
                    drag=drag_new,
                    drag_diff=abs(ddiff),
                    shape_derivative=shape_deriv,
                    sigma=sigma,
                    scaling=float(st.scaling),
                    admm_iters=int(st.admm_it),
                    newton_iters=int(st.total_newton),
                    lin_iters=int(st.total_lin_iters),
                    attempts=attempts,
                    wall_time=time.perf_counter() - t0,
                    solver_iters=tuple(
                        int(x) for x in np.asarray(st.solver_iters)
                    ),
                )
                history.append(rec)
                if verbose:
                    print(
                        f"step {step}: drag {drag_new:.6f} ({ddiff:+.2e}) "
                        f"admm={rec.admm_iters} newton={rec.newton_iters} "
                        f"sigma={sigma} [{rec.wall_time:.2f}s]"
                    )
                if telemetry is not None:
                    telemetry.log_step(dataclasses.asdict(rec))
                    # full per-iteration history when the stepped driver ran
                    # (keeps pre-restart rows across fake-convergence
                    # restarts, reference 2d:1221); the fixed-size
                    # state array otherwise
                    if full_stats:
                        stats = np.asarray(full_stats)
                    else:
                        stats = np.asarray(st.stats)[: max(int(st.admm_it), 1)]
                    telemetry.write_admm_stats(
                        step,
                        {f"c{i}": stats[:, i].tolist() for i in range(stats.shape[1])},
                    )
                    if newton_hist is not None:
                        # written whenever -bNewtonOutput is set, even when
                        # the last ADMM iteration applied no Newton rows
                        # (the reference writes unconditionally, 2d:1256-1259)
                        telemetry.write_newton_stats(step, newton_hist)
                        telemetry.write_newton_iterations(step, newton_hist)
                    if debug_out:
                        # -bDebugOutput VTUs (2d:962-1076): last Newton
                        # iteration's Lu / large-problem RHS / increment
                        _vtu(f"ConsistentLu_step_{step}", X,
                             {"up": np.asarray(debug_out["Lu"]).T})
                        _vtu(f"RHSBigProb_{step}", X,
                             {"up": np.asarray(debug_out["rhs_large"]).T})
                        _vtu(f"delta_u_step_{step}", X,
                             {"u": np.asarray(debug_out["du"]).T})
                    if cfg.debug_nodal_positions:
                        # -bDebugNodalPositions (3d:1393-1399): deformed
                        # nodal coordinates as a vector field
                        _vtu(f"grid_positions_step_{step}", X,
                             {"u": np.asarray(X)})
                    steps = [r.step for r in history]
                    # 2D normalizes the shape-derivative column by
                    # scaling*sigma (2d:1348); 3D stores it raw (3d:1343)
                    telemetry.write_drag(
                        steps,
                        [r.drag for r in history],
                        [r.drag / drag_init for r in history],
                        [r.drag_diff for r in history],
                        [
                            r.shape_derivative / (r.scaling * r.sigma)
                            if cfg.dim == 2
                            else r.shape_derivative
                            for r in history
                        ],
                    )
                    telemetry.write_iterations(
                        steps,
                        [r.admm_iters for r in history],
                        [r.sigma for r in history],
                        [r.newton_iters for r in history],
                        [r.lin_iters for r in history],
                        solver_iters=[r.solver_iters for r in history],
                        dim=cfg.dim,
                    )
                    if failures and catalog_failures:
                        telemetry.write_failures(
                            list(range(len(failures))),
                            [f["step"] for f in failures],
                            [f["drag"] for f in failures],
                            [f["diff"] for f in failures],
                            [f["sigma"] for f in failures],
                        )
                if checkpoint_path is not None:
                    import json as _json

                    from ..io.checkpoint import save_checkpoint

                    save_checkpoint(
                        checkpoint_path,
                        step=step,
                        X=X,
                        s=s,
                        sigma=sigma,
                        drag_old=drag_old,
                        extra={
                            "drag_init": drag_init,
                            "history_json": _json.dumps(
                                [dataclasses.asdict(r) for r in history]
                            ),
                            "failures_json": _json.dumps(failures),
                        },
                    )
                    self._save_warm_sidecar(checkpoint_path)
                if callback is not None:
                    callback(step, X, s, rec)
                if profiler is not None and verbose:
                    # cumulative phase breakdown after every accepted step:
                    # a killed process keeps the profile in its log (the
                    # end-of-run report never survives a tunnel fault)
                    print(prof.report(), flush=True)
            if not accepted:
                if verbose:
                    print(f"step {step}: no acceptable step found, stopping")
                break
        self.X_final = X
        self.s_final = s
        return history
