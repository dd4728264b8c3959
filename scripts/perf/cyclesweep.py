"""TPU perf: V-cycle strength vs CG iteration-count tradeoff for cg_ir_p.

The default V(3,3) Chebyshev cycle costs ~7 fine applies; a weaker V(1,1)
cycle costs ~3.  If CG needs < 7/3 x the iterations under the weaker
preconditioner, total wall time drops.  Sweeps (pre, post, cheb_lower)
and times the FULL cg_ir_p solve (the bench.py metric) for each.

Usage: python scripts/perf/cyclesweep.py [refs]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import threading


def warm():
    y = jax.jit(lambda x: x + 1.0)(jnp.ones((8,), jnp.float32))
    float(y[0])
    log("[warm] tunnel up")


threading.Thread(target=warm, daemon=True).start()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import bench as benchmod
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.deformation import (
    deformation_corner_block_fn,
    deformation_elem_mats,
)
from admm_optim_tpu.solvers import patch_mg

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

hier, ps = benchmod.get_mesh(REFS)
fine = hier.fine
coords = jnp.asarray(fine.coords)
lvl0 = hier.levels[0]
pat0 = sparsity.build_pattern(lvl0.elems, lvl0.num_vertices, hier.dim)
fixed0 = np.repeat(
    lvl0.vertex_mask(("inlet", "wall", "outlet"))[None], hier.dim, axis=0
)


def base_dense_fn(coords0):
    em0 = deformation_elem_mats(
        coords0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0
    )
    v0 = sparsity.assemble_values(pat0, em0)
    v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
    return jnp.linalg.inv(sparsity.to_dense(pat0, v0))


tabs = patch_mg.make_level_tables(ps, coords.dtype)
struct0 = patch_mg.PatchMGStructure(ps)
assemble = jax.jit(
    lambda c, tabs: patch_mg.assemble_patch_mg(
        ps, struct0, c, deformation_corner_block_fn(1.0, 1.0, 1.0),
        base_dense_fn, tabs=tabs, sym=True,
    )
)
data = assemble(coords, tabs)
float(data.lmax[-1])
n_dofs = fine.num_vertices * hier.dim
log(f"assembled refs={REFS}, dofs={n_dofs}")

rng = np.random.default_rng(0)
b_g = jnp.asarray(rng.normal(size=(hier.dim, fine.num_vertices)), coords.dtype)
free_g = ~fine.vertex_mask(("inlet", "wall", "outlet"))
b_g = b_g * jnp.asarray(free_g, coords.dtype)[None]
b_p = st.to_patch(ps.fine, b_g)

CONFIGS = [
    # (pre, post, cheb_lower, inner_rel, inner_iters)
    (3, 3, 0.25, 1e-5, 60),  # current default
    (2, 2, 0.25, 1e-5, 60),
    (1, 1, 0.25, 1e-5, 80),
    (1, 1, 0.12, 1e-5, 80),
    (2, 2, 0.12, 1e-5, 60),
    (3, 3, 0.12, 1e-5, 60),
]

REPS = 3
best = None
for pre, post, lo, irel, iit in CONFIGS:
    struct = patch_mg.PatchMGStructure(
        ps, pre_smooth=pre, post_smooth=post, cheb_lower=lo
    )

    @jax.jit
    def chain(data, b):
        def body(i, carry):
            b, acc, _, _, _ = carry
            res = patch_mg.cg_ir_p(
                struct, data, b, rel_tol=1e-8, max_rounds=6,
                inner_rel=irel, inner_iters=iit,
            )
            x = res.x_hi + res.x_lo
            scale = 1.0 / (1.0 + jnp.sqrt(st.owner_dot(ps.fine, x, x)))
            return (x * scale, acc + res.inner_iters, res.res_norm,
                    res.converged, res.rounds)

        init = (b, jnp.array(0, jnp.int32), jnp.array(0.0, b.dtype),
                jnp.array(False), jnp.array(0, jnp.int32))
        b, acc, nrm, conv, rounds = jax.lax.fori_loop(0, REPS, body, init)
        return jnp.sum(b), acc, nrm, conv, rounds

    try:
        s, acc, nrm, conv, rounds = chain(data, b_p)
        float(s)
        t0 = time.perf_counter()
        s, acc, nrm, conv, rounds = chain(data, b_p)
        float(s)
        dt = (time.perf_counter() - t0) / REPS
        dofs = n_dofs / dt
        log(
            f"V({pre},{post}) lo={lo} irel={irel}: {dt*1e3:7.1f} ms/solve, "
            f"iters={int(acc)//REPS} rounds={int(rounds)} res={float(nrm):.2e} "
            f"conv={bool(conv)}  {dofs:.3e} DoF/s"
        )
        if bool(conv) and (best is None or dofs > best[1]):
            best = ((pre, post, lo, irel), dofs)
    except Exception as e:  # noqa: BLE001
        log(f"V({pre},{post}) lo={lo}: FAILED {e!r}")

log(f"best: {best}")
print("DONE")
