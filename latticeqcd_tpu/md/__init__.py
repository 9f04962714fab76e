from latticeqcd_tpu.md import integrators  # noqa: F401
