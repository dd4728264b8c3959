"""admm_optim_tpu: TPU-native ADMM shape optimization framework."""

import jax as _jax

# TPU f32 einsums/dots default to bfloat16-grade MXU passes; the FEM
# residual/Jacobian-vector products then carry a ~1e-2 relative noise floor
# that stalls every Krylov/Newton loop (observed end-to-end).  Force full
# f32 precision unless the user configured it explicitly.  The hot kernels
# here are gather/bandwidth-bound, so the cost is small.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
