from .gibbs import GibbsSampler
from .hmc import HMC
from .mala import MALA
from .metropolis_hastings import (
    DiscreteWalkProposal,
    PCNProposal,
    MetropolisHastings,
    RandomWalkProposal,
)
from .nuts import NUTS, NUTSMassMatrixConfig
from .tempering import ReplicaExchange, geometric_temperatures
