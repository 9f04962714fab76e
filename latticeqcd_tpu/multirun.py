"""Multi-device entry: python -m latticeqcd_tpu.multirun params.toml [PE1 PE2 PE3 PE4]

Counterpart of src/mpirun.jl (SURVEY.md layer L7;
/root/reference/src/mpirun.jl:14-25) — but instead of MPI ranks the
4-vector PEs selects the jax device-mesh layout; the link field is
sharded over the mesh and every jitted step runs SPMD with XLA
collectives over ICI (SURVEY.md 2.5). On a multi-host pod, initialize
jax.distributed before calling (one process per host; the driver loop
is replicated exactly like the reference's rank-replicated driver).
"""

import sys
import time


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) not in (1, 5):
        print("usage: python -m latticeqcd_tpu.multirun <params.toml> [PE1 PE2 PE3 PE4]")
        return 2

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from latticeqcd_tpu.parallel import default_pes, make_lattice_mesh, set_PEs, shard_links
    from latticeqcd_tpu.system.lqcd import run_lqcd_file

    n = len(jax.devices())
    if len(argv) == 5:
        pes = tuple(int(x) for x in argv[1:5])
    else:
        pes = default_pes(n)
    set_PEs(pes)
    mesh = make_lattice_mesh(pes)
    print(f"# device mesh {pes} over {n} devices")

    t0 = time.time()
    plaq = run_lqcd_file(argv[0], shard_mesh=mesh)
    print(f"final plaquette = {plaq}")
    print(f"elapsed {time.time()-t0:.2f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
