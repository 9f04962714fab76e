from latticeqcd_tpu.system.params import Params, construct_params_from_toml  # noqa: F401
