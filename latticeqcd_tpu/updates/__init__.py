from latticeqcd_tpu.updates.hmc import HMC  # noqa: F401
