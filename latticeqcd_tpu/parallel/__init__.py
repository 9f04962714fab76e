from latticeqcd_tpu.parallel.mesh import (  # noqa: F401
    default_pes,
    get_PEs,
    link_sharding,
    make_lattice_mesh,
    set_PEs,
    shard_links,
    site_sharding,
)
