"""Test: refresh the NS preconditioner at each Newton step (vs frozen at s0),
and Eisenstat-Walker-style inner tolerance."""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.solvers import ns_solver
from admm_optim_tpu.solvers.krylov import gmres

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
VISC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
PP = sys.argv[4] if len(sys.argv) > 4 else "mass"
REL = float(sys.argv[5]) if len(sys.argv) > 5 else 1e-5

cfg = ProblemConfig(dim=DIM, num_refs=REFS, visc=VISC, pressure_precond=PP)
prob = ObstacleShapeOpt(cfg)
X = prob.X0
s0 = prob.initial_state(X)
space = prob.ns_space
ns = cfg.ns

log(f"refresh-M dim={DIM} refs={REFS} visc={VISC} pp={PP} rel={REL}")


def R(s):
    return nsops.ns_residual(space, X, s, VISC, cfg.stab)


@jax.jit
def resnorm(s):
    r = R(s)
    return jnp.sqrt(jnp.vdot(r, r))


# one Newton step with M rebuilt at the current state
def step(s, nrm):
    m_args = prob._ns_pre(X, s=s)  # <-- refreshed at s, not s0

    def Mx(x):
        return prob_M(x, m_args)

    r = R(s)
    Jv = lambda x: jax.jvp(R, (s,), (x,))[1]
    res = gmres(Jv, -r, M=Mx, restart=ns.lin_restart, max_iters=ns.lin_max_iters,
                abs_tol=max(ns.lin_abs_tol, 0.1 * ns.accept_tol), rel_tol=REL)
    # acceptBest line search
    best_s, best_nrm = s, nrm
    for k in range(ns.line_search_steps):
        lam = ns.line_search_reduce ** k
        st = s + lam * res.x
        n = float(resnorm(st))
        if n < best_nrm:
            best_s, best_nrm = st, n
    return best_s, best_nrm, int(res.iters)


# reach the model's private _M_fn through the stepped path wiring
import types

_M_fn = None
for c in prob._ns_solve.__closure__ or ():
    v = c.cell_contents
    if isinstance(v, types.FunctionType) and v.__name__ == "_M_fn":
        _M_fn = v
assert _M_fn is not None


def prob_M(x, m_args):
    return _M_fn(x, *m_args)


s = s0
nrm = float(resnorm(s))
t0 = time.perf_counter()
tot = 0
for it in range(ns.max_iters):
    if nrm <= ns.abs_tol:
        break
    s, nrm_new, lin = step(s, nrm)
    tot += lin
    log(f"  newton {it}: |R| {nrm:.3e} -> {nrm_new:.3e} ({lin} lin)")
    if nrm_new >= nrm * (1 - 1e-14):
        break
    nrm = nrm_new
log(f"total lin iters {tot}, |R|={nrm:.2e}, wall {time.perf_counter()-t0:.0f}s")
print("DONE")
