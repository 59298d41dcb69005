"""mctpu — TPU-native Monte Carlo derivative pricing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
marcomatteo/MonteCarloCUDA (European vanilla calls, correlated basket calls,
and CVA of a call under Black-Scholes), designed TPU-first:

* fused Pallas kernels generate randoms, step GBM paths and reduce payoffs
  entirely on-chip (:mod:`mctpu.kernels`);
* counter-based per-block RNG streams make results reproducible and
  shard-invariant (:mod:`mctpu.rng`);
* the path dimension shards over a ``jax.sharding.Mesh``; partial sums
  combine deterministically (:mod:`mctpu.parallel`);
* an independent NumPy oracle cross-checks everything (:mod:`mctpu.reference`).

See SURVEY.md at the repo root for the complete layer map of the reference
and how each component maps here.
"""
from mctpu.engine import (EngineConfig, fair_variance_strike,
                          greeks as compute_greeks,
                          greeks_asian, greeks_book, greeks_lookback,
                          greeks_basket, greeks_vanilla,
                          price_asian, price_barrier,
                          price_basket, price_basket_asian,
                          price_basket_barrier, price_cliquet,
                          price_cva, price_cva_multi,
                          price_cva_portfolio, price_heston, price_lookback,
                          price_rainbow, price_vanilla,
                          price_book,
                          price_vanilla_ladder)
from mctpu.types import (AmericanOption, AsianOption, BarrierOption,
                         BasketAsianOption, BasketBarrierOption,
                         CliquetOption, LookbackOption, RainbowOption,
                         BasketOption, HestonOption,
                         CvaMultiSpec, CvaPortfolioSpec, CvaResult,
                         CvaSpec, GreeksResult, McResult,
                         Precision, VanillaBook, VanillaOption)
from mctpu import math  # noqa: F401
from mctpu import greeks, lsm, qmc, qmc_engine, sobol, variance  # noqa: F401
from mctpu.qmc_engine import (price_asian_rqmc, price_basket_rqmc,
                              price_vanilla_rqmc)
from mctpu.lsm import price_american, price_american_heston

__version__ = "0.1.0"

__all__ = [
    "EngineConfig",
    "price_vanilla_rqmc",
    "price_basket_rqmc",
    "price_asian_rqmc",
    "compute_greeks",
    "greeks_vanilla",
    "greeks_basket",
    "greeks_asian",
    "greeks_lookback",
    "GreeksResult",
    "price_vanilla",
    "price_vanilla_ladder",
    "price_book",
    "greeks_book",
    "VanillaBook",
    "price_basket",
    "price_basket_asian",
    "price_basket_barrier",
    "price_asian",
    "price_barrier",
    "price_lookback",
    "price_rainbow",
    "price_cliquet",
    "price_heston",
    "price_american",
    "price_american_heston",
    "price_cva",
    "price_cva_portfolio",
    "price_cva_multi",
    "fair_variance_strike",
    "CliquetOption",
    "VanillaOption",
    "BasketOption",
    "BasketAsianOption",
    "BasketBarrierOption",
    "AsianOption",
    "BarrierOption",
    "LookbackOption",
    "RainbowOption",
    "HestonOption",
    "AmericanOption",
    "CvaSpec",
    "CvaPortfolioSpec",
    "CvaMultiSpec",
    "McResult",
    "CvaResult",
    "Precision",
    "math",
    "greeks",
    "lsm",
    "qmc",
    "sobol",
    "variance",
    "__version__",
]
