from .pallas_hmc import fused_hmc_run
from .pallas_mh import fused_mh_run
from .tree import (
    MassMatrix,
    build_subtree,
    find_reasonable_epsilon,
    identity_mass,
    inv_mass_mul,
    kinetic_energy,
    leapfrog_chain,
    nuts_tree_step,
    sample_momentum,
)
