"""Round-5 re-measurement after the unrolled walk drivers.

``common.WALK_UNROLL`` (and the rainbow per-path unroll) came out of the
round-5 composition microbench (``benchmarks/opcomp_r5.py``): every
serial walk kernel was running at its UN-pipELINED rate — one pair
iteration per ``fori_loop`` trip exposes the full per-step dependency
chain, while the identical math unrolled ran 25-55% faster.  This script
re-runs the round-4 rate measurements (same methodology, same
workloads — ``benchmarks/greeks_r4.py`` / ``perf_r4.py``) and re-prices
each kernel against its measured-composition ceiling from
``opcomp_r5.json``.

Run on a real TPU: ``python -m benchmarks.greeks_r5``.  Writes
``benchmarks/greeks_r5.json``.
"""
import json
import pathlib

import jax

from benchmarks.greeks_r4 import (SMOKE, asian_greeks_rate,
                                  basket_asian_greeks_rate,
                                  basket_barrier_greeks_rate,
                                  cva_greeks_rate, cva_multi_greeks_rate,
                                  cva_multi_price_rate, heston_greeks_rate,
                                  ladder_greeks_rate, rainbow_greeks_rate,
                                  vanilla_greeks_rate, varswap_greeks_rate)
from benchmarks.perf_r4 import heston_qe_rate


def main():
    if not SMOKE and jax.default_backend() != "tpu":
        raise SystemExit("run on the TPU (or pass --cpu-smoke)")
    out = {}
    for fn in (rainbow_greeks_rate,
               lambda: varswap_greeks_rate("gbm"),
               lambda: varswap_greeks_rate("heston", geom=(512, 32)),
               ladder_greeks_rate, cva_multi_greeks_rate,
               cva_multi_price_rate,
               basket_asian_greeks_rate, basket_barrier_greeks_rate,
               vanilla_greeks_rate, asian_greeks_rate,
               heston_greeks_rate, cva_greeks_rate):
        r = fn()
        out[r["kernel"]] = r
        print(json.dumps(r), flush=True)
    # the QE pricing walk is also unrolled now
    out["heston_qe100"] = heston_qe_rate()
    print(json.dumps(out["heston_qe100"]), flush=True)

    here = pathlib.Path(__file__).parent
    try:
        comp = json.load(open(here / "opcomp_r5.json"))["compositions"]
    except FileNotFoundError:
        comp = {}
    print("\nvs measured-composition ceilings (opcomp_r5.json):")
    for name, row in out.items():
        c = comp.get(name)
        if not c:
            continue
        rate = row.get("gsteps_per_s") or row.get("gpaths_per_s")
        pct = 100 * rate / c["ceiling_gps"]
        row["composition_ceiling_gps"] = c["ceiling_gps"]
        row["pct_of_composition"] = round(pct, 1)
        print(f"  {name:28s} {rate:7.2f} / {c['ceiling_gps']:7.2f} "
              f"= {pct:5.1f}%")
    if not SMOKE:
        (here / "greeks_r5.json").write_text(json.dumps(out, indent=1))
        print("wrote benchmarks/greeks_r5.json")


if __name__ == "__main__":
    main()
