import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys
sys.argv = ["cli", "-dim", "2", "-numRefs", "1", "-numSteps", "2", "-admmSteps", "8", "-outDir", "/tmp/verify_cpu", "-x64"]
from admm_optim_tpu.cli import main
main()
