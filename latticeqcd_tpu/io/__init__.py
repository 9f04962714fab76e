from latticeqcd_tpu.io.bridge_text import load_bridge_text, save_bridge_text  # noqa: F401
from latticeqcd_tpu.io.ildg import ILDG, load_ildg, save_ildg  # noqa: F401
from latticeqcd_tpu.io.jld2 import load_jld2, save_jld2  # noqa: F401
from latticeqcd_tpu.io.native import load_u, save_u, save_checkpoint, load_checkpoint  # noqa: F401
