"""Weak-scaling accounting for the sharded halo-exchange V-cycle.

For each device count P in {1, 2, 4, 8} on the virtual CPU mesh, traces the
sharded V-cycle (parallel.patch_shard.vcycle_fn) and counts the collectives
actually present in the jaxpr (psum / ppermute / all_gather / all_reduce),
plus the per-level halo slab volume implied by the exchange tables.  Output
is the markdown table appended to docs/SCALING.md (VERDICT r1 item 7: the
1B-DoF scaling claim needs numbers, not prose).

Usage: python scripts/perf/weakscale.py [dim refs]
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.core.patches import build_patchset
from admm_optim_tpu.parallel.patch_shard import build_sharded_mg

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 3
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def count_collectives(jaxpr):
    counts = {}

    def walk(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in ("psum", "ppermute", "all_gather", "all_to_all",
                        "reduce_sum", "psum2", "all_reduce", "psum_invariant"):
                counts[name] = counts.get(name, 0) + 1
            for v in eqn.params.values():
                for sub in _subjaxprs(v):
                    walk(sub)

    def _subjaxprs(v):
        if hasattr(v, "jaxpr"):
            j = v.jaxpr
            yield j.jaxpr if hasattr(j, "jaxpr") else j
        elif hasattr(v, "eqns"):
            yield v
        elif isinstance(v, (list, tuple)):
            for vv in v:
                yield from _subjaxprs(vv)

    walk(jaxpr.jaxpr)
    return counts


def halo_bytes(ps, dtype_bytes=4):
    """Per-V-cycle halo slab volume per level: each operator application
    exchanges 2*dim face slabs of the local patch block's boundary sites."""
    rows = []
    for l, lvl in enumerate(ps.levels):
        lat = lvl.lat_shape
        S = int(np.prod(lat))
        # boundary sites of one patch's lattice (slab volume per exchange)
        interior = int(np.prod([max(n - 2, 0) for n in lat]))
        slab = (S - interior) * ps.dim * dtype_bytes  # C=dim channels
        rows.append((l, lat, lvl.P, slab * lvl.P))
    return rows


def main():
    levels = [geomgen.channel_2d(diag="fixed") if DIM == 2 else geomgen.channel_3d()]
    for _ in range(REFS):
        levels.append(refine(levels[-1]))
    hier = Hierarchy(levels)
    ps_raw = build_patchset(hier)
    coords = jnp.asarray(hier.fine.coords, jnp.float32)

    print(f"# weak scaling, {DIM}D refs={REFS}, "
          f"{hier.fine.num_vertices * DIM} dofs, {ps_raw.P} patches")
    print("| devices | patches/dev | collectives per V-cycle | "
          "halo slab MB/dev/cycle |")
    print("|---|---|---|---|")
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n]), ("space",))
        sh = build_sharded_mg(ps_raw, mesh)
        tabs = sh.make_tables(jnp.float32)
        coords_p = sh.to_patch_sharded(coords.T)
        from admm_optim_tpu.ops.deformation import (
            deformation_corner_block_fn,
            deformation_elem_mats,
        )
        from admm_optim_tpu.ops import sparsity
        from admm_optim_tpu.ops.p1space import P1VectorSpace

        space = P1VectorSpace.build(hier)
        pat0 = space.patterns[0]
        fixed0 = jnp.asarray(space.fixed[0])

        def base_dense_fn(coords0):
            em0 = deformation_elem_mats(
                coords0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0
            )
            v0 = sparsity.assemble_values(pat0, em0)
            v0 = sparsity.bake_dirichlet(pat0, v0, fixed0)
            return jnp.linalg.inv(sparsity.to_dense(pat0, v0))

        corner_fn = deformation_corner_block_fn(1.0, 1.0, 1.0)
        data = jax.jit(sh.assemble_fn(corner_fn, base_dense_fn, sym=True))(
            coords_p, tabs
        )
        b = jnp.zeros_like(coords_p[: DIM])
        jx = jax.make_jaxpr(lambda d, b: sh.vcycle_fn()(d, b))(data, b)
        counts = count_collectives(jx)
        # applies per cycle: (pre+post skip-adjusted) per level
        hb = halo_bytes(sh.ps)
        total_halo = sum(r[3] for r in hb)
        n_apply = 0
        for l in range(1, len(sh.ps.levels)):
            n_apply += sh.struct.pre_smooth + sh.struct.post_smooth  # + residual - skipped pre apply
        per_dev = total_halo * n_apply / n / 1e6
        cstr = " ".join(f"{k}:{v}" for k, v in sorted(counts.items()))
        print(f"| {n} | {sh.ps.P // n} | {cstr} | {per_dev:.2f} |")


if __name__ == "__main__":
    main()
