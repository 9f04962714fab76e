from latticeqcd_tpu.smearing.gradientflow import GradientFlow, gradientflow  # noqa: F401
from latticeqcd_tpu.smearing.stout import CovNet, StoutLayer, stout_stack  # noqa: F401
