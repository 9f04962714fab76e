from latticeqcd_tpu.updates.hmc import HMC  # noqa: F401
from latticeqcd_tpu.updates.slhmc import SLHMC, SLMC  # noqa: F401
