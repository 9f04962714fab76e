from latticeqcd_tpu.ops import fields, gauge_action, sun, wilsonline  # noqa: F401
