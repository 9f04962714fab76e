from latticeqcd_tpu.measurements import fermionic, observables  # noqa: F401
from latticeqcd_tpu.measurements.scheduler import MeasurementSet  # noqa: F401
