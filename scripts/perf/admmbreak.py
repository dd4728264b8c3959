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


def chain(make_f, x0, r=REPS):
    """Time the op r times inside one jit; the big pytrees (data, coords_p)
    are jit ARGUMENTS, not closure constants - closed-over refs=4 stencils
    blow the remote-compile upload limit (HTTP 413).  make_f(ops) -> f(x)."""

    @jax.jit
    def run(data_, coords_p_, aux, x):
        ops_in = PatchOps(struct, data_, coords_p_)
        f = make_f(ops_in, data_, aux)

        def body(i, tok):
            tok = jax.lax.optimization_barrier(tok)
            xi = jax.tree_util.tree_map(
                lambda a: a + jnp.zeros((), a.dtype) * tok.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                x,
            )
            y = f(xi)
            s = sum(
                jnp.sum(jnp.abs(l)).astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(y)
                if jnp.issubdtype(l.dtype, jnp.floating)
            )
            return tok + s * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    aux = dict(u=u, lam=lam, Lmb=Lmb, ref_vol=ref_vol, ref_bary=ref_bary)
    y = run(data, coords_p, aux, x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = run(data, coords_p, aux, x0)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / r


rows = []


def phase(name, make_f, x0):
    try:
        dt = chain(make_f, x0)
    except Exception as e:  # noqa: BLE001
        log(f"{name:>24}: FAILED {e!r}")
        return
    rows.append((name, dt))
    log(f"{name:>24}: {dt * 1e3:8.2f} ms")


phase("z_update(prox)",
      lambda o, d, a: (lambda x: o.z_update(a["u"], x, 1.0, 0.3, "frobenius")),
      lam)
phase("grad_tensor", lambda o, d, a: o.grad_tensor, u)
phase("A_apply", lambda o, d, a: o.A, u)
phase("constraint_grads[B]",
      lambda o, d, a: (lambda x: o.constraint_grads(x, a["ref_vol"], a["ref_bary"])),
      u)
phase("constraint_hvp",
      lambda o, d, a: (lambda x: o.constraint_hvp(a["u"], a["Lmb"], a["ref_vol"], a["ref_bary"], x)),
      u)
phase("vcycle", lambda o, d, a: (lambda x: patch_mg.vcycle_p(struct, d, x)), u)
phase("tensor_rhs", lambda o, d, a: o.tensor_rhs, lam)
phase("dual_update",
      lambda o, d, a: (lambda x: o.dual_update(x, a["lam"], a["lam"], 1.0)[0]),
      u)
phase("dot", lambda o, d, a: (lambda x: o.dot(x, a["u"])), u)
phase("max_grad_norm",
      lambda o, d, a: (lambda x: o.max_grad_norm(x, "frobenius")), u)
phase("H_solve(40it cap)",
      lambda o, d, a: (lambda b: krylov.bicgstab(
          lambda x: o.A(x) + o.constraint_hvp(a["u"], a["Lmb"], a["ref_vol"], a["ref_bary"], x),
          b, M=o.M, max_iters=40, abs_tol=1e-7, rel_tol=1e-5, dot=o.dot,
      ).x),
      Jp)

# full ADMM iteration (K=1, 2-Newton x-update like the bench record)
for seq in (False, True):
    cfg = admm.ADMMConfig(
        admm_steps=1, admm_tolerance=0.0, tau=1.0, ns_max_its=2, ns_tol=1e-4,
        lin_max_iters=40, lin_abs_tol=1e-7, lin_rel_tol=1e-5,
        xsolve_sequential=seq,
    )

    @jax.jit
    def run_admm(data_, coords_p_, Jp_):
        stt = admm.admm_inner_ops(
            cfg, PatchOps(struct, data_, coords_p_), Jp_,
            jnp.asarray(0.3, coords.dtype),
            jnp.asarray(1.0, coords.dtype), ref_vol, ref_bary,
        )
        return stt.total_lin_iters, jnp.sum(stt.u)

    try:
        it, s = run_admm(data, coords_p, Jp)
        float(s)
        t0 = time.perf_counter()
        it, s = run_admm(data, coords_p, Jp)
        float(s)
        dt = time.perf_counter() - t0
        log(
            f"admm_inner 1 iter (xseq={seq}): {dt * 1e3:.1f} ms "
            f"({int(it)} krylov its)"
        )
    except Exception as e:  # noqa: BLE001
        log(f"admm_inner xseq={seq} failed: {e!r}")

log("DONE")
