from latticeqcd_tpu.utils.logger import VerbosePrint  # noqa: F401
