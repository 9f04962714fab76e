from latticeqcd_tpu.ops import eigen, fields, gauge_action, sun, wilsonline  # noqa: F401
