"""general_mcmc_tpu — a TPU-native MCMC framework built from scratch in JAX.

Capabilities mirror the Rust reference ``SauersML/general-mcmc`` (lib.rs:1-227):
Metropolis–Hastings, Gibbs, batched HMC, and NUTS with dual-averaging and
mass-matrix warmup; streaming and batch convergence diagnostics (split-R-hat,
FFT ESS); progress tracking; CSV/Arrow/Parquet export; deterministic seeding.
The architecture is idiomatic JAX: targets are pure jittable log-density
functions, chains are a vmapped batch advanced by fused ``lax.scan`` loops,
NUTS tree doubling is an iterative on-device ``lax.while_loop``, and chains
shard across chips via ``shard_map`` over a device mesh.
"""

from .core import init, init_det, init_with_seed
from .diagnostics.stats import (
    BasicStats,
    ChainStats,
    ChainTracker,
    MultiChainTracker,
    RunStats,
    basic_stats,
    collect_rhat,
    ess_bulk,
    ess_from_chainstats,
    ess_tail,
    max_skipnan,
    rank_normalized_rhat,
    rank_normalized_summary,
    split_rhat_mean_ess,
)
from .models import distributions
from .samplers.base import BatchChain, BatchSampler
from .samplers.chees import ChEESHMC
from .samplers.gibbs import GibbsSampler
from .samplers.hmc import HMC
from .samplers.mala import MALA
from .samplers.metropolis_hastings import (
    DiscreteWalkProposal,
    PCNProposal,
    MetropolisHastings,
    RandomWalkProposal,
)
from .samplers.nuts import NUTS, NUTSMassMatrixConfig
from .samplers.tempering import ReplicaExchange, geometric_temperatures
from .models.distributions import (
    Binomial,
    Categorical,
    DiffableGaussian2D,
    Gaussian2D,
    GaussianND,
    IsotropicGaussian,
    NealsFunnel,
    Poisson,
    Rosenbrock2D,
    RosenbrockND,
)

__version__ = "0.1.0"
