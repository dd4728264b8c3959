"""Per-phase breakdown of one ADMM inner iteration at 3D scale on the
patch backend (VERDICT r2 item 3: where do 4.6 s/iter go at refs=4 when
the 5 solves only predict ~2 s?).

Phases timed separately (each chained R times inside one jit to beat the
tunnel dispatch):
  z_update (prox), grad_tensor, constraint_grads, constraint_hvp apply,
  A apply, one V-cycle, one full H-solve (bicgstab, the x-update's unit),
  dots (Schur assembly), dual_update, tensor_rhs.
Then one full admm_inner iteration for the total.

Usage: python scripts/perf/admmbreak.py [refs] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))))
import bench  # reuse the pickle-cached host mesh

from admm_optim_tpu.ops import patchstencil as pst
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.deformation import (
    deformation_corner_block_fn,
    deformation_elem_mats,
)
from admm_optim_tpu.optim import admm
from admm_optim_tpu.optim.spaces import PatchOps
from admm_optim_tpu.solvers import krylov, patch_mg


def log(*a):
    print(*a, flush=True)


hier, ps = bench.get_mesh(REFS)
fine = hier.fine
dim = hier.dim
coords = jnp.asarray(fine.coords)
log(f"refs={REFS}: V={fine.num_vertices} E={fine.num_elems} dofs={fine.num_vertices * dim}")

lvl0 = hier.levels[0]
pat0 = sparsity.build_pattern(lvl0.elems, lvl0.num_vertices, dim)
fixed0 = np.repeat(
    lvl0.vertex_mask(("inlet", "wall", "outlet"))[None], dim, axis=0
)


def base_dense_fn(coords0):
    em0 = deformation_elem_mats(coords0, jnp.asarray(lvl0.elems), 1.0, 1.0, 1.0)
    v0 = sparsity.assemble_values(pat0, em0)
    v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
    return jnp.linalg.inv(sparsity.to_dense(pat0, v0))


struct = patch_mg.PatchMGStructure(ps, pre_smooth=2, post_smooth=2, cheb_lower=0.2)
tabs = patch_mg.make_level_tables(ps, coords.dtype)
t0 = time.perf_counter()
data = jax.jit(
    lambda c, tabs: patch_mg.assemble_patch_mg(
        ps, struct, c, deformation_corner_block_fn(1.0, 1.0, 1.0),
        base_dense_fn, tabs=tabs, sym=True,
    )
)(coords, tabs)
float(data.lmax[-1])
log(f"assembly {time.perf_counter() - t0:.1f}s")

coords_p = pst.to_patch(ps.fine, coords.T)
ops_ = PatchOps(struct, data, coords_p)

rng = np.random.default_rng(0)
free_g = ~fine.vertex_mask(("inlet", "wall", "outlet"))
u_g = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)), coords.dtype) * 0.01
u_g = u_g * jnp.asarray(free_g, coords.dtype)[None]
u = pst.to_patch(ps.fine, u_g)
lam = ops_.zeros_tensor(coords.dtype)
Jp = pst.to_patch(ps.fine, u_g) * 0.1

Xn = np.asarray(coords, np.float64)
En = np.asarray(fine.elems)
T = Xn[En[:, 1:]] - Xn[En[:, :1]]
import math

voln = np.abs(np.linalg.det(T)) / math.factorial(dim)
ref_vol = jnp.asarray(voln.sum(), coords.dtype)
cent = Xn[En].mean(axis=1)
ref_bary = jnp.asarray((voln[:, None] * cent).sum(0), coords.dtype)

m = 1 + dim
Lmb = jnp.asarray(rng.normal(size=(m,)), coords.dtype) * 0.1


def chain(f, x0, r=REPS):
    """Time f chained r times in one jit; returns per-call seconds."""

    @jax.jit
    def run(x):
        def body(i, x):
            y = f(x)
            # keep it a fixed-point-shaped chain: rescale to x's magnitude
            s = 1.0 / (1.0 + jnp.sqrt(jnp.vdot(y, y).real))
            return y * s.astype(y.dtype)

        return jax.lax.fori_loop(0, r, body, x)

    y = run(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = run(x0)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / r


rows = []


def phase(name, f, x0):
    dt = chain(f, x0)
    rows.append((name, dt))
    log(f"{name:>24}: {dt * 1e3:8.2f} ms")


phase("z_update(prox)", lambda x: ops_.z_update(u, x, 1.0, 0.3, "frobenius"), lam)
phase("grad_tensor", lambda x: ops_.grad_tensor(x), u)
phase("A_apply", lambda x: ops_.A(x), u)
phase("constraint_grads[B]", lambda x: ops_.constraint_grads(x, ref_vol, ref_bary)[0], u)
phase(
    "constraint_hvp",
    lambda x: ops_.constraint_hvp(u, Lmb, ref_vol, ref_bary, x),
    u,
)
phase("vcycle", lambda x: patch_mg.vcycle_p(struct, data, x), u)
phase("tensor_rhs", lambda t: ops_.tensor_rhs(t)[0][None] * 0 + ops_.tensor_rhs(t), lam)
phase("dual_update", lambda x: ops_.dual_update(x, lam, lam, 1.0)[0], u)
phase("dot", lambda x: x * ops_.dot(x, u).astype(x.dtype), u)
phase("max_grad_norm", lambda x: x * ops_.max_grad_norm(x, "frobenius").astype(x.dtype), u)


def one_solve(b):
    res = krylov.bicgstab(
        lambda x: ops_.A(x) + ops_.constraint_hvp(u, Lmb, ref_vol, ref_bary, x),
        b, M=ops_.M, max_iters=40, abs_tol=1e-7, rel_tol=1e-5, dot=ops_.dot,
    )
    return res.x


phase("H_solve(40it cap)", one_solve, Jp)

# full ADMM iteration (K=1, 2-Newton x-update like the bench record)
for seq in (False, True):
    cfg = admm.ADMMConfig(
        admm_steps=1, admm_tolerance=0.0, tau=1.0, ns_max_its=2, ns_tol=1e-4,
        lin_max_iters=40, lin_abs_tol=1e-7, lin_rel_tol=1e-5,
        xsolve_sequential=seq,
    )

    @jax.jit
    def run_admm(Jp_):
        stt = admm.admm_inner_ops(
            cfg, ops_, Jp_, jnp.asarray(0.3, coords.dtype),
            jnp.asarray(1.0, coords.dtype), ref_vol, ref_bary,
        )
        return stt.total_lin_iters, jnp.sum(stt.u)

    try:
        it, s = run_admm(Jp)
        float(s)
        t0 = time.perf_counter()
        it, s = run_admm(Jp)
        float(s)
        dt = time.perf_counter() - t0
        log(
            f"admm_inner 1 iter (xseq={seq}): {dt * 1e3:.1f} ms "
            f"({int(it)} krylov its)"
        )
    except Exception as e:  # noqa: BLE001
        log(f"admm_inner xseq={seq} failed: {e!r}")

log("DONE")
