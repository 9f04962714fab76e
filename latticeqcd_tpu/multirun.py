"""Multi-device / multi-host entry:

    python -m latticeqcd_tpu.multirun params.toml [PE1 PE2 PE3 PE4] \
        [--coordinator host:port --nprocs N --procid I]

Counterpart of src/mpirun.jl (SURVEY.md layer L7;
/root/reference/src/mpirun.jl:14-25) — but instead of MPI ranks the
4-vector PEs selects the jax device-mesh layout; the link field is
sharded over the mesh and every jitted step runs SPMD with XLA
collectives over ICI (SURVEY.md 2.5).

Multi-host (the `mpirun -np N` analog): launch one copy of this
process per host. On TPU pods no flags are needed —
jax.distributed.initialize auto-detects the pod; elsewhere pass
--coordinator/--nprocs/--procid explicitly. The driver loop is
replicated on every process exactly like the reference's
rank-replicated driver; logging, measurement files and config saves
are rank-0 gated.
"""

import sys
import time


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv

    coordinator = None
    nprocs = None
    procid = None
    multihost = False
    pos = []
    it = iter(argv)
    for a in it:
        if a == "--coordinator":
            coordinator = next(it)
        elif a == "--nprocs":
            nprocs = int(next(it))
        elif a == "--procid":
            procid = int(next(it))
        elif a == "--multihost":
            multihost = True  # auto-detect (TPU pod env)
        else:
            pos.append(a)
    if len(pos) not in (1, 5):
        print(
            "usage: python -m latticeqcd_tpu.multirun <params.toml> "
            "[PE1 PE2 PE3 PE4] [--coordinator host:port --nprocs N --procid I]"
        )
        return 2

    from latticeqcd_tpu.parallel import initialize_multihost

    if coordinator is not None or nprocs is not None or multihost:
        initialize_multihost(coordinator, nprocs, procid)

    import jax
    jax.config.update("jax_enable_x64", True)

    from latticeqcd_tpu.parallel import (
        default_pes,
        make_lattice_mesh,
        println_rank0,
        set_PEs,
    )
    from latticeqcd_tpu.system.lqcd import run_lqcd_file

    n = len(jax.devices())
    if len(pos) == 5:
        pes = tuple(int(x) for x in pos[1:5])
    else:
        pes = default_pes(n)
    set_PEs(pes)
    mesh = make_lattice_mesh(pes)
    println_rank0(
        f"# device mesh {pes} over {n} devices, "
        f"{jax.process_count()} process(es)"
    )

    t0 = time.time()
    plaq = run_lqcd_file(pos[0], shard_mesh=mesh)
    println_rank0(f"final plaquette = {plaq}")
    println_rank0(f"elapsed {time.time()-t0:.2f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
