"""Terminal demo: quenched SU(3) heatbath with a live plaquette strip.

Counterpart of the reference's animated demo (src/demo/demo.jl:103-136,
a 4^4 quenched heatbath with live plots) — rendered as a text
sparkline so it needs no plotting stack.

Run: python -m latticeqcd_tpu.demo [nsweeps]
"""

import sys

BARS = " ▁▂▃▄▅▆▇█"


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    nsweeps = int(argv[0]) if argv else 60

    import jax

    jax.config.update("jax_enable_x64", True)

    from latticeqcd_tpu.ops import fields, gauge_action as ga
    from latticeqcd_tpu.updates.heatbath import Heatbath

    beta = 5.7
    lat = (4, 4, 4, 4)
    print(f"# quenched SU(3) heatbath demo: {lat} lattice, beta={beta}")
    u = fields.hot_start(lat, 3, seed=0)
    hb = Heatbath(action=ga.wilson_gauge_action(3, beta), use_or=True, num_or=2)
    key = jax.random.PRNGKey(0)
    history = []
    for i in range(1, nsweeps + 1):
        u, key, _ = hb.update(u, key)
        p = float(ga.mean_plaquette(u))
        history.append(p)
        lo, hi = 0.0, 0.7
        strip = "".join(
            BARS[min(len(BARS) - 1, max(0, int((v - lo) / (hi - lo) * (len(BARS) - 1))))]
            for v in history[-60:]
        )
        print(f"sweep {i:3d}  plaq={p:.5f}  {strip}")
    ntail = max(1, min(20, len(history) // 2))
    print(f"# thermalized <plaq> ~ {sum(history[-ntail:]) / ntail:.5f} (equilibrium ~ 0.561)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
