"""The Monte Carlo engine: jitted, mesh-sharded pricing drivers (L3/L4).

Replaces the reference's GPU engine host side and its ``extern "C"`` wrappers
(``MonteCarloKernel.cu:297-534``).  The whole lifecycle — constant-memory
upload, RNG-pool setup, kernel launch, D2H copy, host reduction — collapses
into one jitted program per product:

    kernel (per-block partials, fused on chip)
      -> pairwise deterministic combine across blocks (+ collective over mesh)
        -> estimator (price, 95% CI) in f64

Public API (the reference's six L4 entry points collapse to three pure
functions; the CPU/GPU split becomes backend-transparent):

* :func:`price_vanilla`  (``dev_vanillaOpt`` / ``host_vanillaOpt``)
* :func:`price_basket`   (``dev_basketOpt`` / ``host_basketOpt``)
* :func:`price_cva`      (``dev_cvaEquityOption`` / ``host_cvaEquityOption``)

plus the beyond-reference families sharing the same pipeline:
:func:`price_asian`, :func:`price_barrier`, :func:`price_basket_asian`,
:func:`price_basket_barrier`, :func:`price_heston` (Euler/QE),
:func:`price_cva_portfolio` (netting + wrong-way risk) and
:func:`price_cva_multi` (netting over correlated underlyings).

Multi-chip scaling is data parallelism over simulation blocks: a 1-D
``jax.sharding.Mesh`` with axis ``"paths"`` (see :mod:`mctpu.parallel`).
Results are bitwise identical for mesh sizes up to the ``layout_for`` block
floor (8 devices by default — ``auto_shrink`` never shrinks below
``max(8, n_devices)`` blocks, so wider meshes may pick a different launch
geometry and hence different RNG streams; raise ``num_blocks``/disable
``auto_shrink`` to extend the guarantee).  Per-block counter RNG +
fixed-order combine provide the invariance, tested in
``tests/test_sharding.py``.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mctpu import estimator as mcest
from mctpu import math as mcmath
from mctpu import rng as mcrng
from mctpu.kernels import asian as kasian
from mctpu.kernels import barrier as kbarrier
from mctpu.kernels import basket as kbasket
from mctpu.kernels import cva as kcva
from mctpu.kernels import heston as kheston
from mctpu.kernels import vanilla as kvanilla
from mctpu.parallel.mesh import PATH_AXIS
from mctpu.parallel.reduce import pairwise_tree_sum
from mctpu.types import (AsianOption, BarrierOption, BasketOption,
                         CvaMultiSpec, CvaPortfolioSpec, CvaResult, CvaSpec,
                         HestonOption, McResult, Precision, VanillaOption,
                         XvaResult, XvaSpec)

__all__ = ["EngineConfig", "price_vanilla", "price_basket", "price_asian",
           "price_barrier", "price_lookback", "price_rainbow",
           "price_cliquet", "greeks_cliquet",
           "fair_variance_strike",
           "price_vanilla_ladder", "price_book", "greeks_book",
           "price_barrier_book", "greeks_barrier_book",
           "price_basket_asian", "price_basket_barrier",
           "price_heston", "price_cva", "price_cva_portfolio",
           "price_cva_multi", "price_xva",
           "greeks", "greeks_vanilla", "greeks_basket",
           "greeks_asian", "greeks_lookback", "greeks_rainbow",
           "greeks_varswap", "greeks_vanilla_ladder",
           "greeks_basket_asian", "greeks_basket_barrier",
           "greeks_barrier",
           "greeks_heston", "greeks_cva", "greeks_cva_multi",
           "greeks_xva", "greeks_american"]


def _default_backend() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static launch configuration (the reference's ``numBlocks/numThreads``
    pair plus precision/backend policy).

    ``num_blocks`` is the global, mesh-independent number of simulation
    blocks; when a mesh is given it must divide evenly.  ``rows`` sets the
    on-chip tile height (paths per tile = rows * 128).
    """

    num_blocks: int = 512
    rows: int = 256
    backend: str = "auto"  # auto | pallas | xla
    precision: Precision = Precision.F32_KAHAN
    antithetic: bool = False
    mesh: Optional[Mesh] = None
    # Pallas TPU-interpret mode: runs the kernels on CPU for tests/debug.
    # The hardware PRNG is swapped for a deterministic counter-hash stream
    # (mctpu.kernels.common.prng_emulation), so results are statistically
    # equivalent but not bitwise equal to on-chip runs.  Slow; tests only.
    interpret: bool = False
    auto_shrink: bool = True  # shrink launch geometry for small path counts

    def resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        if self.precision is Precision.F64:
            return "xla"  # TPU Pallas path is f32-only
        return _default_backend()

    def layout_for(self, n_paths: int, paths_per_block_iter_row: int):
        """(num_blocks, rows) shrunk so the launch granularity tracks small
        requests.

        The reference silently drops the remainder of ``sims / numBlocks``
        (``MonteCarloKernel.cu:509``); we instead round *up*, and shrink the
        tile/grid so a 262k-path request doesn't get 33M paths of work.
        ``paths_per_block_iter_row`` is the product-specific path count of one
        (block, iteration, row) cell.
        """
        blocks, rows = self.num_blocks, self.rows
        if not self.auto_shrink:
            return blocks, rows
        # Floor at 8 blocks regardless of mesh so the shrunk geometry — and
        # therefore the RNG stream layout and the bitwise result — is
        # identical for every mesh size up to 8 devices.
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        min_blocks = max(8, n_dev)

        def shrink_blocks(blocks, floor):
            # Blocks are serial grid entries on a core: fewer wide blocks
            # beat many narrow ones, so shrink the grid BEFORE the tile.
            while (blocks % 2 == 0 and blocks // 2 >= floor
                   and (blocks // 2) % floor == 0
                   and blocks * rows * paths_per_block_iter_row > n_paths):
                blocks //= 2
            return blocks

        blocks = shrink_blocks(blocks, min_blocks)
        blocks8 = shrink_blocks(self.num_blocks, 8) if n_dev > 8 else blocks
        # Only then narrow the tile.  The serial walk kernels (CVA, Heston,
        # LSM, Asian...) are latency-bound below ~128 rows: each GBM step
        # depends on the previous, so a (8, 128) tile is one vector register
        # of work with every op latency exposed.  Measured on v5e: CVA-500
        # runs 12.8 -> 38.5 Gsteps/s going rows 8 -> 128
        # (benchmarks/walk_geometry_r3.json).
        while rows > 8 and blocks * rows * paths_per_block_iter_row > n_paths:
            rows //= 2
        if n_dev > 8:
            # Past the 8-device floor, the mesh width changes the shrunk
            # geometry — and with it the RNG stream layout — so a run here
            # is NOT bitwise comparable to the same config on <= 8 devices.
            # Warn loudly unless the width made no difference (r2 weak #4).
            if blocks8 != blocks:
                import warnings
                warnings.warn(
                    f"auto_shrink picked num_blocks={blocks} under a "
                    f"{n_dev}-device mesh where <= 8 devices would pick "
                    f"{blocks8}: results will NOT be bitwise equal across "
                    "these mesh widths. Pin the geometry "
                    "(EngineConfig(num_blocks=..., auto_shrink=False), "
                    "num_blocks a multiple of every mesh size you compare "
                    "— the recipe __graft_entry__.dryrun_multichip uses) "
                    "to extend the invariance guarantee.",
                    stacklevel=3)
        return blocks, max(rows, 8)

    @property
    def dtype_str(self) -> str:
        return str(jnp.dtype(self.precision.dtype))

    def _key(self):
        mesh_key = None
        if self.mesh is not None:
            mesh_key = (tuple(d.id for d in self.mesh.devices.flat),
                        self.mesh.axis_names)
        return (self.num_blocks, self.rows, self.resolve_backend(),
                self.precision, self.antithetic, mesh_key, self.interpret)


# Cache of jitted runner functions keyed by (product, plan, config key).
_RUNNERS: dict[Any, Any] = {}

_log = logging.getLogger(__name__)


def _concrete_zero(x) -> bool:
    """True iff ``x`` is a concrete zero (static-branch decision value)."""
    if isinstance(x, jax.core.Tracer):
        raise ValueError("wwr_b must be a concrete value at the API "
                         "boundary (it selects the compiled default leg)")
    return float(jnp.asarray(x)) == 0.0


def _shard_blocks(cfg: EngineConfig, num_blocks: int, partial_fn, args,
                  out_specs):
    """Run ``partial_fn(args, block_offset, n_local_blocks)`` over the mesh.

    Without a mesh, runs all blocks locally.  With a mesh, each device owns a
    contiguous range of global block ids — the analogue of the reference's
    CUDA grid, spread over chips instead of SMs.  ``args`` (option data, PRNG
    key/seed) is replicated to every shard.
    """
    mesh = cfg.mesh
    if mesh is None:
        return partial_fn(args, jnp.int32(0), num_blocks)
    n_dev = mesh.devices.size
    if num_blocks % n_dev:
        raise ValueError(
            f"num_blocks={num_blocks} must divide over {n_dev} devices")
    nb_local = num_blocks // n_dev

    def shard_fn(a):
        idx = jax.lax.axis_index(PATH_AXIS)
        return partial_fn(a, (idx * nb_local).astype(jnp.int32), nb_local)

    return jax.shard_map(shard_fn, mesh=mesh, in_specs=(P(),),
                         out_specs=out_specs, check_vma=False)(args)


def _combine(partials):
    """f64 fixed-order combine of (num_blocks, 2) partials -> (sum, sum2)."""
    total = pairwise_tree_sum(jnp.asarray(partials, mcest.wide_dtype()), axis=0)
    return total[0], total[1]


# ---------------------------------------------------------------------------
# Shared scalar-product driver
# ---------------------------------------------------------------------------
# Every (sum_p, sum_p2)-shaped product shares one pipeline: plan the launch,
# shard the blocks, run the kernel, combine deterministically, estimate.
# ``prep(o)`` builds extra traced kernel operands (e.g. the basket's Cholesky
# factor) inside the jitted program.

def _price_scalar(tag, kmod, unit_per_row: int, extra_key, opt, n_paths: int,
                  key: jax.Array, cfg: EngineConfig, prep=None,
                  plan_kwargs=()) -> McResult:
    backend = cfg.resolve_backend()
    blocks, rows = cfg.layout_for(n_paths, unit_per_row)
    plan = kmod.make_plan(n_paths, blocks, rows, cfg.antithetic,
                          cfg.dtype_str, cfg.precision.kahan,
                          **dict(plan_kwargs))
    cache_key = (tag, extra_key, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            extras = prep(o) if prep is not None else ()
            if backend == "pallas":
                fn = lambda a, off, nb: kmod.pallas_partials(
                    *a[:-1], mcrng.key_to_seed(a[-1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kmod.xla_partials(
                    *a[:-1], a[-1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn,
                                     (o, *extras, k), P(PATH_AXIS, None))
            sum_p, sum_p2 = _combine(partials)
            wide = mcest.wide_dtype()
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return sum_p, sum_p2, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sum_p, sum_p2, disc = runner(opt, key)
    return mcest.estimate(sum_p, sum_p2, plan.total_units, discount=disc,
                          n_paths=plan.total_paths)


def price_vanilla(opt: VanillaOption, n_paths: int, key: jax.Array,
                  config: EngineConfig = EngineConfig()) -> McResult:
    """Monte Carlo price of a European call/put (TPU twin of
    ``dev_vanillaOpt``, ``MonteCarloKernel.cu:501-516``)."""
    opt.validate()
    anti = 2 if config.antithetic else 1
    return _price_scalar("vanilla", kvanilla, 2 * kvanilla.LANES * anti,
                         opt.kind, opt, n_paths, key, config)


def price_basket(opt: BasketOption, n_paths: int, key: jax.Array,
                 config: EngineConfig = EngineConfig()) -> McResult:
    """Monte Carlo price of a weighted basket call (twin of ``dev_basketOpt``,
    ``MonteCarloKernel.cu:484-499``).

    Takes the correlation matrix (``opt.corr``) and factorizes it here —
    reproducing the driver-side Cholesky of the reference
    (``basketOpt.cu:96-99``) inside the jitted program.
    """
    opt.validate()
    anti = 2 if config.antithetic else 1
    # Paths per (block, iter, row): asset-major tiles hold a full 128-lane
    # row of paths; the packed layout holds c (kernels/basket.py).
    if kbasket.use_asset_major(opt.n_assets):
        c = kbasket.LANES
    else:
        _, c, _ = kbasket.pack_factor(opt.n_assets)

    def prep(o):
        chol = mcmath.cholesky_lower(
            jnp.asarray(o.corr, mcest.wide_dtype()))
        return (chol,)

    return _price_scalar("basket", kbasket, 2 * c * anti, opt.n_assets, opt,
                         n_paths, key, config, prep=prep,
                         plan_kwargs=(("n_assets", opt.n_assets),))


def price_asian(opt: AsianOption, n_paths: int, key: jax.Array,
                config: EngineConfig = EngineConfig()) -> McResult:
    """Monte Carlo price of a discretely-monitored Asian call.

    New product family beyond the reference; same engine contract (per-block
    partials, deterministic combine, reference estimator semantics).
    """
    opt.validate()
    anti = 2 if config.antithetic else 1
    return _price_scalar("asian", kasian, kasian.LANES * anti,
                         (opt.n_obs, opt.average), opt, n_paths, key, config)


def price_barrier(opt: BarrierOption, n_paths: int, key: jax.Array,
                  config: EngineConfig = EngineConfig()) -> McResult:
    """Monte Carlo price of a discretely-monitored knock-out barrier call.

    New product family beyond the reference; tested against the continuous
    closed form with the Broadie-Glasserman-Kou barrier correction.
    """
    opt.validate()
    anti = 2 if config.antithetic else 1
    return _price_scalar("barrier", kbarrier, kbarrier.LANES * anti,
                         (opt.n_obs, opt.kind), opt, n_paths, key, config)


def price_vanilla_ladder(opt: VanillaOption, strikes, n_paths: int,
                         key: jax.Array,
                         config: EngineConfig = EngineConfig()) -> McResult:
    """Price a whole strike ladder from ONE path sweep.

    Returns a vector-valued :class:`McResult` (``price``/``ci``/
    ``std_error`` have shape ``(K,)``).  Every strike reuses the same
    terminal draws, so ladder differences (call spreads, butterflies) are
    arbitrage-consistent up to MC noise — the production pattern for
    smile/surface pricing.  ``opt.k`` is ignored; ``strikes`` must be
    concrete (they are compiled into the kernel).
    """
    from mctpu.kernels import ladder as kladder

    opt.validate()
    strikes = jnp.asarray(strikes)
    n_k = int(strikes.shape[0])
    if not 1 <= n_k <= kladder.MAX_STRIKES:
        raise ValueError(f"strikes must have 1..{kladder.MAX_STRIKES} "
                         f"entries, got {n_k}")
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, 2 * kladder.LANES * anti)
    plan = kladder.make_plan(n_paths, blocks, rows, cfg.antithetic,
                             cfg.dtype_str, cfg.precision.kahan)
    k_key = tuple(float(x) for x in strikes)
    cache_key = ("ladder", k_key, opt.kind, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        ks = jnp.asarray(strikes, jnp.float32)

        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kladder.pallas_partials(
                    a[0], ks, mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kladder.xla_partials(
                    a[0], ks, a[1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total[:, 0], total[:, 1], disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sum_p, sum_p2, disc = runner(opt, key)
    return mcest.estimate(sum_p, sum_p2, plan.total_units, discount=disc,
                          n_paths=plan.total_paths)


def price_book(book, n_paths: int, key: jax.Array,
               config: EngineConfig = EngineConfig()) -> McResult:
    """Price a whole book of heterogeneous vanillas from ONE path sweep.

    The serving entry point: ``book`` is a :class:`mctpu.types.VanillaBook`
    (M instruments with independent spot/strike/rate/vol/maturity and a
    call/put mix); returns a vector-valued :class:`McResult` with shape
    ``(M,)`` ``price``/``ci``/``std_error``.  All instruments share the
    same standard-normal draws (terminal sampling maps one ``z`` to each
    instrument's own GBM), so marks are comonotone across the book.
    Every per-instrument parameter is runtime data — repricing the same
    book shape on a market tick reuses the compiled program.

    Per-instrument estimator semantics (discounting by each instrument's
    own ``exp(-r_i t_i)``) follow ``MonteCarloKernel.cu:413-423``.
    """
    from mctpu.kernels import book as kbook

    book.validate()
    m = book.n_instruments
    if m > kbook.MAX_BOOK:
        raise ValueError(f"book holds {m} instruments; max {kbook.MAX_BOOK}"
                         " per fused sweep (split larger books)")
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, 2 * kbook.LANES * anti)
    plan = kbook.make_plan(n_paths, blocks, rows, cfg.antithetic,
                           cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("book", m, book.kinds, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(bk, k, sgn):
            wide = mcest.wide_dtype()
            d = jnp.float32 if backend == "pallas" else plan.jdtype
            o = bk.astype(d)
            mu = (o.r - 0.5 * o.v * o.v) * o.t
            sig = o.v * jnp.sqrt(o.t)
            params = (o.s, mu, sig, o.k, jnp.asarray(sgn, d))
            if backend == "pallas":
                fn = lambda a, off, nb: kbook.pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kbook.xla_partials(
                    a[0], a[1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (params, k),
                                     P(PATH_AXIS, None, None))
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(bk.r, wide)
                           * jnp.asarray(bk.t, wide))
            return total[:, 0], total[:, 1], disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sgn = jnp.asarray([1.0 if kd == "call" else -1.0 for kd in book.kinds],
                      jnp.float32)
    sum_p, sum_p2, disc = runner(book, key, sgn)
    return mcest.estimate(sum_p, sum_p2, plan.total_units, discount=disc,
                          n_paths=plan.total_paths)


def greeks_book(book, n_paths: int, key: jax.Array,
                config: EngineConfig = EngineConfig()) -> "GreeksResult":
    """The whole book's risk run from ONE path sweep: vector-valued
    price/delta/vega/rho/theta/gamma across all M instruments.

    Same integrands as the fused vanilla Greeks kernel, evaluated per
    instrument on shared draws (``kernels/book.py``, Greeks section);
    like :func:`price_book`, every market parameter is runtime data, so
    repricing risk on a tick reuses the compiled program.  Delta/vega
    are with respect to each instrument's OWN spot/vol (the book
    Jacobian's diagonal — instruments are independent products, so
    cross-terms are zero by construction).
    """
    from mctpu.kernels import book as kbook
    from mctpu.types import GreeksResult

    book.validate()
    m = book.n_instruments
    if m > kbook.MAX_BOOK:
        raise ValueError(f"book holds {m} instruments; max {kbook.MAX_BOOK}"
                         " per fused sweep (split larger books)")
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, 2 * kbook.LANES * anti)
    plan = kbook.make_plan(n_paths, blocks, rows, cfg.antithetic,
                           cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_book", m, book.kinds, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(bk, k, sgn):
            params = (bk.s, bk.k, bk.r, bk.v, bk.t, sgn)
            if backend == "pallas":
                fn = lambda a, off, nb: kbook.greek_pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kbook.greek_xla_partials(
                    a[0], a[1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (params, k),
                                     P(PATH_AXIS, None, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(bk.r, wide)
                           * jnp.asarray(bk.t, wide))
            return total, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sgn = jnp.asarray([1.0 if kd == "call" else -1.0 for kd in book.kinds],
                      jnp.float32)
    total, disc = runner(book, key, sgn)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[:, 2 * i], total[:, 2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    return GreeksResult(price=est(0), delta=est(1), vega=est(2),
                        rho=est(3), theta=est(4), gamma=est(5))


def fair_variance_strike(opt, n_paths: int, key: jax.Array,
                         config: EngineConfig = EngineConfig(),
                         n_obs: int = 252) -> McResult:
    """Fair strike of a variance swap: ``E[(1/T) sum ln(S_j/S_{j-1})^2]``.

    ``opt`` selects the dynamics: a :class:`VanillaOption` prices under GBM
    (exact discrete oracle ``v^2 + (r - v^2/2)^2 T/n``), a
    :class:`HestonOption` under stochastic vol (continuous fair strike
    ``theta + (v0 - theta)(1 - e^{-kT})/(kT)``, approached as n grows).
    Returned in variance units (undiscounted — a fair strike, not a price).
    """
    from mctpu.kernels import varswap as kvarswap

    opt.validate()
    dynamics = "heston" if isinstance(opt, HestonOption) else "gbm"
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kvarswap.LANES * anti)
    plan = kvarswap.make_plan(n_paths, blocks, rows, cfg.antithetic,
                              cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("varswap", dynamics, n_obs, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kvarswap.pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    n_obs=n_obs, dynamics=dynamics,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kvarswap.xla_partials(
                    a[0], a[1], off, plan, nb, n_obs=n_obs,
                    dynamics=dynamics)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None))
            return _combine(partials)

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sum_p, sum_p2 = runner(opt, key)
    return mcest.estimate(sum_p, sum_p2, plan.total_units, discount=1.0,
                          n_paths=plan.total_paths)


def price_barrier_book(book, n_paths: int, key: jax.Array,
                       config: EngineConfig = EngineConfig()) -> McResult:
    """Price a book of M heterogeneous knock-out barriers from ONE walk.

    The path-dependent serving entry point (:class:`mctpu.types.BarrierBook`):
    per-instrument spot/strike/rate/vol/maturity/barrier with call/put and
    up/down-and-out mixes, all advanced on one shared increment stream —
    the draw cost is paid once per step for the whole book, each extra
    instrument costs one FMA + compare + select per step
    (``kernels/barrier_book.py``).  Returns a vector ``McResult`` of shape
    ``(M,)``; marks are comonotone across the book.  All market data is
    runtime arrays, so a tick reprices without recompiling; a
    one-instrument book ties :func:`price_barrier` bitwise on shared
    streams.  Per-instrument discounting by ``exp(-r_i t_i)``
    (``MonteCarloKernel.cu:413-423`` semantics).
    """
    from mctpu.kernels import barrier_book as kbb

    book.validate()
    m = book.n_instruments
    if m > kbb.MAX_BARRIER_BOOK:
        raise ValueError(f"barrier book holds {m} instruments; max "
                         f"{kbb.MAX_BARRIER_BOOK} per fused walk "
                         "(split larger books)")
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kbb.LANES * anti)
    plan = kbb.make_plan(n_paths, blocks, rows, cfg.antithetic,
                         cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("barrier_book", m, book.n_obs, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(bk, k):
            d = jnp.float32 if backend == "pallas" else plan.jdtype
            par = kbb.book_params(bk, bk.n_obs, d)
            if backend == "pallas":
                fn = lambda a, off, nb: kbb.pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    book.n_obs, interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kbb.xla_partials(
                    a[0], a[1], off, plan, nb, book.n_obs)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (par, k),
                                     P(PATH_AXIS, None, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(bk.r, wide)
                           * jnp.asarray(bk.t, wide))
            return total[:, 0], total[:, 1], disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sum_p, sum_p2, disc = runner(book, key)
    return mcest.estimate(sum_p, sum_p2, plan.total_units, discount=disc,
                          n_paths=plan.total_paths)


def greeks_barrier_book(book, n_paths: int, key: jax.Array,
                        config: EngineConfig = EngineConfig()) \
        -> "GreeksResult":
    """The barrier book's risk run from ONE walk: vector price/delta/vega/
    rho across all M instruments.

    Likelihood-ratio scores (pathwise is biased under the knock-out —
    same estimator as :func:`greeks_barrier`), built from THREE shared
    carried tiles: the standardized increments are common to every
    instrument, so per-instrument scores are deterministic rescalings
    applied at payoff time (``kernels/barrier_book.py``, Greeks section).
    Delta/vega are with respect to each instrument's own spot/vol.
    Theta/gamma documented-absent like the single-barrier family (use CRN
    bumps).
    """
    from mctpu.kernels import barrier_book as kbb
    from mctpu.types import GreeksResult

    book.validate()
    m = book.n_instruments
    if m > kbb.MAX_BARRIER_BOOK:
        raise ValueError(f"barrier book holds {m} instruments; max "
                         f"{kbb.MAX_BARRIER_BOOK} per fused walk "
                         "(split larger books)")
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kbb.LANES * anti)
    plan = kbb.make_plan(n_paths, blocks, rows, cfg.antithetic,
                         cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_barrier_book", m, book.n_obs, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(bk, k):
            d = jnp.float32 if backend == "pallas" else plan.jdtype
            par = kbb.greek_rows(bk, bk.n_obs, d)
            if backend == "pallas":
                fn = lambda a, off, nb: kbb.greek_pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    book.n_obs, interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kbb.greek_xla_partials(
                    a[0], a[1], off, plan, nb, book.n_obs)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (par, k),
                                     P(PATH_AXIS, None, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(bk.r, wide)
                           * jnp.asarray(bk.t, wide))
            return total, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, disc = runner(book, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[:, 2 * i], total[:, 2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    return GreeksResult(price=est(0), delta=est(1), vega=est(2),
                        rho=est(3))


def price_rainbow(opt, n_paths: int, key: jax.Array,
                  config: EngineConfig = EngineConfig()) -> McResult:
    """European call on the MAX/MIN of correlated underlyings (rainbow).

    New product family beyond the reference; two-asset prices are gated
    against the exact Stulz closed form, any size against the k = 0
    martingale identity and the NumPy oracle.
    """
    from mctpu.kernels import rainbow as krainbow

    opt.validate()
    anti = 2 if config.antithetic else 1
    if kbasket.use_asset_major(opt.n_assets):
        c = kbasket.LANES  # asset-major: every lane a path
    else:
        _, c, _ = kbasket.pack_factor(opt.n_assets)
    return _price_scalar("rainbow", krainbow, 2 * c * anti,
                         (opt.n_assets, opt.kind), opt, n_paths, key,
                         config, prep=_prep_chol,
                         plan_kwargs=(("n_assets", opt.n_assets),))


def price_cliquet(opt, n_paths: int, key: jax.Array,
                  config: EngineConfig = EngineConfig()) -> McResult:
    """Locally capped/floored cliquet (ratchet) on GBM period returns.

    The flagship structured-product family, beyond the reference.  Each
    step is one log-return draw + exp + clamp (no spot level carried);
    period-return independence gives an EXACT closed form at any period
    count (:func:`mctpu.math.cliquet_closed_form`) — the oracle the
    tests gate against.
    """
    from mctpu.kernels import cliquet as kcliquet

    opt.validate()
    anti = 2 if config.antithetic else 1
    return _price_scalar("cliquet", kcliquet, kcliquet.LANES * anti,
                         (opt.n_periods,), opt, n_paths, key, config)


def greeks_cliquet(opt, n_paths: int, key: jax.Array,
                   config: EngineConfig = EngineConfig()) \
        -> "GreeksResult":
    """Pathwise vega/rho/theta of the cliquet at engine scale.

    The clip corners have measure zero, so pathwise differentiation is
    unbiased; each Greek is a per-period masked FMA on register values
    (``kernels/cliquet.py``).  Spot delta AND gamma are identically zero
    (the ratchet depends on returns only) and come back as exact
    ``0 ± 0``; every other output gates against ``jax.grad`` of the
    exact closed form.
    """
    from mctpu.kernels import cliquet as kcliquet
    from mctpu.types import GreeksResult

    opt.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kcliquet.LANES * anti)
    plan = kcliquet.make_plan(n_paths, blocks, rows, cfg.antithetic,
                              cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_cliquet", opt.n_periods, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kcliquet.greek_pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kcliquet.greek_xla_partials(
                    a[0], a[1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, disc = runner(opt, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    zero = mcest.estimate(jnp.zeros(()), jnp.zeros(()), n, discount=disc,
                          n_paths=plan.total_paths)
    return GreeksResult(price=est(0), delta=zero, vega=est(1),
                        rho=est(2), theta=est(3), gamma=zero)


def price_lookback(opt, n_paths: int, key: jax.Array,
                   config: EngineConfig = EngineConfig()) -> McResult:
    """Discretely-monitored lookback option (floating or fixed strike).

    New product family beyond the reference; the discrete floating call
    approaches the continuous Goldman-Sosin-Gatto value from below as
    ``n_obs`` grows (:func:`mctpu.math.lookback_floating_call`).
    """
    from mctpu.kernels import lookback as klookback

    opt.validate()
    anti = 2 if config.antithetic else 1
    return _price_scalar("lookback", klookback, klookback.LANES * anti,
                         (opt.n_obs, opt.kind, opt.payoff), opt, n_paths,
                         key, config)


# ---------------------------------------------------------------------------
# In-kernel pathwise Greeks (engine-scale sensitivities)
# ---------------------------------------------------------------------------

def greeks_vanilla(opt: VanillaOption, n_paths: int, key: jax.Array,
                   config: EngineConfig = EngineConfig()) -> "GreeksResult":
    """Price + delta/vega/rho/theta/gamma/vanna/volga of a European
    call/put, fused in one kernel sweep.

    Runs the flagship engine contract — fused Pallas kernel (or XLA twin),
    mesh-sharded blocks, fixed-order f64 combine, reference estimator — on
    16 accumulators instead of 2 (:mod:`mctpu.kernels.greeks`), so Greeks
    come at pricing-sweep throughput and are bitwise shard-invariant.
    First-order Greeks are pathwise; the full second-order set (gamma,
    vanna = d2V/ds dv, volga = d2V/dv2) uses mixed pathwise-then-
    likelihood-ratio estimators (unbiased despite the Dirac second
    derivative — see the kernel module docstring).  Gated against
    :func:`mctpu.math.bs_greeks` in ``tests/test_greeks.py``.
    """
    from mctpu.kernels import greeks as kgreeks
    from mctpu.types import GreeksResult

    opt.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, 2 * kgreeks.LANES * anti)
    plan = kgreeks.make_plan(n_paths, blocks, rows, cfg.antithetic,
                             cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_vanilla", opt.kind, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kgreeks.pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kgreeks.xla_partials(
                    a[0], a[1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, disc = runner(opt, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    return GreeksResult(price=est(0), delta=est(1), vega=est(2), rho=est(3),
                        theta=est(4), gamma=est(5), vanna=est(6),
                        volga=est(7))


def greeks_basket(opt: BasketOption, n_paths: int, key: jax.Array,
                  config: EngineConfig = EngineConfig()) -> "GreeksResult":
    """Price + per-asset pathwise delta/vega/gamma vectors of the basket
    call, plus scalar rho and theta.

    Same kernel layout and RNG streams as :func:`price_basket` in both
    regimes — asset-major for small baskets, packed-lane MXU beyond
    (``kernels/greeks.py``) — so CRN bump comparisons against the pricer
    are exact.  Delta/vega are gated against common-random-number bumps in
    ``tests/test_greeks.py``; rho (``t K E[1{B>K}]``, pre-discount) and
    theta (d/d(maturity), :func:`mctpu.math.bs_greeks` convention) are
    exact pathwise scalars gated against the Black-Scholes limit and CRN
    bumps there too.  ``gamma`` is the per-asset DIAGONAL gamma vector by
    the Stein-tilt mixed pathwise-LR estimator
    (:func:`mctpu.kernels.greeks.tilt_direction`); it is ``None`` when
    the correlation matrix is rank-deficient with no sign-definite
    Brownian tilt (e.g. the reference's alternating ±0.5 matrix beyond 2
    assets) — a fixed-direction Stein estimate would have a pole there.
    """
    from mctpu.kernels import greeks as kgreeks
    from mctpu.types import GreeksResult

    opt.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    a = opt.n_assets
    asset_major = kbasket.use_asset_major(a)
    if asset_major:
        c = kbasket.LANES
    else:
        a_tile, c, width = kbasket.pack_factor(a)
    blocks, rows = cfg.layout_for(n_paths, 2 * c * anti)
    plan = kgreeks.make_basket_plan(n_paths, blocks, rows, cfg.antithetic,
                                    cfg.dtype_str, cfg.precision.kahan,
                                    n_assets=a)
    tilt_e, tilt_g, tilt_ok = kgreeks.tilt_direction(opt.corr, a)
    cache_key = ("greeks_basket", a, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None and asset_major:
        def run(o, te, tg, k):
            chol = mcmath.cholesky_lower(
                jnp.asarray(o.corr, mcest.wide_dtype()))
            if backend == "pallas":
                fn = lambda ar, off, nb: kgreeks.pallas_basket_am_partials(
                    ar[0], ar[1], (ar[2], ar[3]),
                    mcrng.key_to_seed(ar[4]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda ar, off, nb: kgreeks.xla_basket_am_partials(
                    ar[0], ar[1], (ar[2], ar[3]), ar[4], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn,
                                     (o, chol, te, tg, k),
                                     P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            # Rows 6.. are per-asset (gd, gd2, gv, gv2, gg, gg2) rows.
            vtot = total[6:].reshape(a, 6).T
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total[:6], vtot, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    elif runner is None:
        def run(o, te, tg, k):
            chol = mcmath.cholesky_lower(
                jnp.asarray(o.corr, mcest.wide_dtype()))
            if backend == "pallas":
                fn = lambda ar, off, nb: kgreeks.pallas_basket_partials(
                    ar[0], ar[1], (ar[2], ar[3]),
                    mcrng.key_to_seed(ar[4]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda ar, off, nb: kgreeks.xla_basket_partials(
                    ar[0], ar[1], (ar[2], ar[3]), ar[4], off, plan, nb)
            partials, vecs = _shard_blocks(
                cfg, plan.num_blocks, fn, (o, chol, te, tg, k),
                (P(PATH_AXIS, None), P(PATH_AXIS, None, None)))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            vtot = pairwise_tree_sum(jnp.asarray(vecs, wide), axis=0)
            # Fold the c packed path groups back onto the asset slots.
            vtot = pairwise_tree_sum(
                vtot.reshape(6, c, a_tile), axis=1)[:, :a]
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total, vtot, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, vtot, disc = runner(opt, jnp.asarray(tilt_e),
                               jnp.asarray(tilt_g), key)
    n = plan.total_units

    def scal_est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    delta = mcest.estimate(vtot[0], vtot[1], n, discount=disc,
                           n_paths=plan.total_paths)
    vega = mcest.estimate(vtot[2], vtot[3], n, discount=disc,
                          n_paths=plan.total_paths)
    gamma = None
    if tilt_ok:
        gamma = mcest.estimate(vtot[4], vtot[5], n, discount=disc,
                               n_paths=plan.total_paths)
    return GreeksResult(price=scal_est(0), delta=delta, vega=vega,
                        rho=scal_est(1), theta=scal_est(2), gamma=gamma)


def greeks_asian(opt, n_paths: int, key: jax.Array,
                 config: EngineConfig = EngineConfig()) -> "GreeksResult":
    """Price + pathwise delta/vega of an Asian call at engine scale.

    The log-space walk makes the pathwise sensitivities nearly free:
    ``d(log s_j)/dv`` is one FMA on the carried log-spot per step
    (``kernels/asian.py``, Greeks section).  Same mesh / fixed-order-
    combine / estimator contract as every pricer; gated against
    ``jax.grad`` of the exact geometric closed form and CRN bumps in
    ``tests/test_greeks.py``.
    """
    from mctpu.kernels import asian as kasian
    from mctpu.types import GreeksResult

    opt.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kasian.LANES * anti)
    plan = kasian.make_plan(n_paths, blocks, rows, cfg.antithetic,
                            cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_asian", opt.average, opt.n_obs, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kasian.greek_pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kasian.greek_xla_partials(
                    a[0], a[1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, disc = runner(opt, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    return GreeksResult(price=est(0), delta=est(1), vega=est(2),
                        rho=est(3), gamma=est(4))


def greeks_lookback(opt, n_paths: int, key: jax.Array,
                    config: EngineConfig = EngineConfig()) -> "GreeksResult":
    """Price + pathwise delta/vega/rho of a lookback option at engine
    scale.

    Delta is the homogeneity identity (every spot scales with ``s0``);
    vega tracks ``d(s)/dv`` at the arg-extreme via two extra selects per
    step; rho rides the same select with the arg-extreme TIME
    (``ds_j/dr = t_j s_j``, so the floating-call integrand collapses to
    ``ext (T - t_ext)``) — the walk still has zero per-step
    transcendentals (``kernels/lookback.py``, Greeks section).
    """
    from mctpu.kernels import lookback as klookback
    from mctpu.types import GreeksResult

    opt.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, klookback.LANES * anti)
    plan = klookback.make_plan(n_paths, blocks, rows, cfg.antithetic,
                               cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_lookback", opt.kind, opt.payoff, opt.n_obs, plan,
                 cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: klookback.greek_pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: klookback.greek_xla_partials(
                    a[0], a[1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, disc = runner(opt, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    return GreeksResult(price=est(0), delta=est(1), vega=est(2),
                        rho=est(3))


def greeks_american(opt, n_paths: int, key: jax.Array,
                    config: EngineConfig = EngineConfig(),
                    pilot_paths: int | None = None,
                    fit_dtype=None) -> "GreeksResult":
    """Price + fixed-rule pathwise delta/vega/rho of an American put/call.

    Two-pass like :func:`mctpu.lsm.price_american` (same pilot-key
    derivation, so CRN comparisons against the pricer share the exercise
    rule AND the pricing streams): pass 1 fits the Longstaff-Schwartz
    continuation regressions on an independent pilot set; pass 2 runs the
    fused forward walk with three extra Greek accumulators
    (:mod:`mctpu.kernels.lsm`, Greeks section).  The Greeks are the exact
    pathwise derivatives of the frozen-policy value — the standard
    production estimator for American sensitivities (Piterbarg 2004) —
    and are gated against frozen-rule CRN finite differences and the
    binomial-lattice delta in ``tests/test_greeks.py``.  No theta: the
    exercise grid itself moves with maturity.
    """
    from mctpu import lsm as mclsm
    from mctpu.kernels import lsm as klsm
    from mctpu.types import GreeksResult

    opt.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, klsm.LANES * anti)
    plan = klsm.make_plan(n_paths, blocks, rows, cfg.antithetic,
                          cfg.dtype_str, cfg.precision.kahan)
    if pilot_paths is None:
        pilot_paths = min(n_paths, 1 << 15)
    if fit_dtype is None:
        # Widest float for the pilot regression; on TPU pass f32 explicitly
        # (the normal-equation solve has no f64 lowering there).
        fit_dtype = mcmath.wide_dtype()
    k_fit, k_price = jax.random.split(jax.random.fold_in(key, 0x15A1))
    beta = mclsm.fit_exercise_rule(opt.s, opt.k, opt.r, opt.v, opt.t,
                                   k_fit, pilot_paths, opt.n_steps,
                                   opt.payoff, dtype=fit_dtype)
    put = opt.payoff == "put"
    cache_key = ("greeks_american", opt.n_steps, put, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, b, k):
            if backend == "pallas":
                fn = lambda a, off, nb: klsm.greek_pallas_partials(
                    a[0], a[1], mcrng.key_to_seed(a[2]), off, plan, nb,
                    opt.n_steps, put, interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: klsm.greek_xla_partials(
                    a[0], a[1], a[2], off, plan, nb, opt.n_steps, put)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, b, k),
                                     P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            return pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total = runner(opt, beta, k_price)
    n = plan.total_units

    def est(i):
        # Cashflows (and their derivatives) are already present-value.
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=1.0, n_paths=plan.total_paths)

    return GreeksResult(price=est(0), delta=est(1), vega=est(2),
                        rho=est(3))


def greeks_barrier(opt, n_paths: int, key: jax.Array,
                   config: EngineConfig = EngineConfig()) -> "GreeksResult":
    """Price + likelihood-ratio delta/vega/rho of a knock-out barrier call
    at engine scale.

    The knock-out indicator is discontinuous in every parameter, so
    pathwise differentiation is biased here; the fused kernel accumulates
    the Glasserman section-7.3 likelihood-ratio integrands instead — the
    density scores need only three extra carried tiles and keep the walk
    transcendental-free (``kernels/barrier.py``, Greeks section).  Each
    Greek is unbiased for the discretely-monitored product and carries an
    honest CI; LR variance grows ~linearly in ``n_obs`` (documented
    there).  Gated against CRN bump-and-revalue in ``tests/test_greeks.py``.
    """
    from mctpu.kernels import barrier as kbar
    from mctpu.types import GreeksResult

    opt.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kbar.LANES * anti)
    plan = kbar.make_plan(n_paths, blocks, rows, cfg.antithetic,
                          cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_barrier", opt.kind, opt.n_obs, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kbar.greek_pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kbar.greek_xla_partials(
                    a[0], a[1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, disc = runner(opt, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    return GreeksResult(price=est(0), delta=est(1), vega=est(2),
                        rho=est(3))


def greeks_heston(opt: HestonOption, n_paths: int, key: jax.Array,
                  config: EngineConfig = EngineConfig(),
                  n_steps: int = 100) -> "HestonGreeksResult":
    """Price + pathwise delta / vega(= dV/d v0) / rho / dtheta / dkappa /
    dxi of a Heston call at engine scale (full-truncation Euler scheme).

    FOUR forward-mode tangent pairs (one per variance-dynamics parameter)
    ride the fused walk with shared recursion coefficients
    (``kernels/heston.py``, Greeks section): the call payoff is continuous
    in ``s0`` and the variance parameters, so pathwise differentiation of
    the DISCRETIZED scheme is unbiased for that scheme's own price.
    ``vega`` is the sensitivity to the initial variance ``v0`` (chain
    through ``2 sqrt(v0)`` for a vol-quoted vega); ``dxi`` is the
    vol-of-vol sensitivity; ``rho`` is exact in-kernel: ``dx/dr = t``
    pathwise, giving the ``t K 1{S_T>K}`` integrand.  Gated against CRN
    bumps of :func:`price_heston` and finite differences of the
    characteristic-function price in ``tests/test_greeks.py``.
    """
    from mctpu.types import HestonGreeksResult

    opt.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kheston.LANES * anti)
    plan = kheston.make_plan(n_paths, blocks, rows, cfg.antithetic,
                             cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_heston", n_steps, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kheston.greek_pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb, n_steps,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kheston.greek_xla_partials(
                    a[0], a[1], off, plan, nb, n_steps)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, disc = runner(opt, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    return HestonGreeksResult(price=est(0), delta=est(1), vega=est(2),
                              rho=est(3), dtheta=est(4), dkappa=est(5),
                              dxi=est(6))


def _vec_greeks_runner(cfg, backend, plan, pallas_fn, xla_fn, c, a_tile,
                       keep, spot_scale=False, discounted=True):
    """Shared jitted runner for the vector-Greeks families (basket-Asian,
    basket-barrier, CVA-multi): Cholesky prep from ``opt.corr``, backend
    dispatch, mesh-sharded ``((B, 4), (B, 4, width))`` partials,
    fixed-order combines, and the deterministic packed-group fold onto
    the first ``keep`` slots (``pairwise_tree_sum`` — a ``.sum(axis=1)``
    here has compiler-chosen association that breaks bitwise shard
    invariance).  ``pallas_fn(opt, chol, seed, off, plan, nb)`` /
    ``xla_fn(opt, chol, key, off, plan, nb)`` arrive with their product
    statics pre-bound.  ``spot_scale`` applies the homogeneity
    ``1/s0`` / ``1/s0^2`` factors to the delta rows (CVA-multi).
    """
    def run(o, k):
        chol = mcmath.cholesky_lower(
            jnp.asarray(o.corr, mcest.wide_dtype()))
        if backend == "pallas":
            fn = lambda ar, off, nb: pallas_fn(
                ar[0], ar[1], mcrng.key_to_seed(ar[2]), off, plan, nb)
        else:
            fn = lambda ar, off, nb: xla_fn(ar[0], ar[1], ar[2], off,
                                            plan, nb)
        partials, vecs = _shard_blocks(
            cfg, plan.num_blocks, fn, (o, chol, k),
            (P(PATH_AXIS, None), P(PATH_AXIS, None, None)))
        wide = mcest.wide_dtype()
        total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
        vtot = pairwise_tree_sum(jnp.asarray(vecs, wide), axis=0)
        vtot = pairwise_tree_sum(
            vtot.reshape(4, c, a_tile), axis=1)[:, :keep]
        if spot_scale:
            s0 = jnp.asarray(o.s, wide)
            vtot = vtot.at[0].divide(s0).at[1].divide(s0 * s0)
        if discounted:
            disc = jnp.exp(-jnp.asarray(o.r, wide)
                           * jnp.asarray(o.t, wide))
        else:
            disc = jnp.asarray(1.0, wide)
        return total, vtot, disc

    return jax.jit(run)


def greeks_basket_asian(opt, n_paths: int, key: jax.Array,
                        config: EngineConfig = EngineConfig()) \
        -> "GreeksResult":
    """Per-asset pathwise delta/vega vectors + scalar rho of the
    basket-Asian call (average of the basket value over ``n_obs`` dates).

    The packed correlated walk carries two extra lane tiles (running
    spot sum, running ``S * dxv`` sum — ``dxv`` is the per-asset
    log-spot tangent, one FMA per lane per step) and one extra per-path
    tile for rho (``kernels/multi_walk.py``, Greeks section).  Gated
    against the single-asset arithmetic-Asian engine kernel in the
    ``a = 1`` limit and CRN bumps of :func:`price_basket_asian` (exact:
    shared draw streams).  Theta is documented-absent (the observation
    grid moves with maturity — the single-asset Asian's limit applies);
    gamma likewise (use CRN bumps).
    """
    from mctpu.kernels import multi_walk as kmulti_walk
    from mctpu.types import GreeksResult

    opt.validate()
    bk = opt.basket
    a = bk.n_assets
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    if kbasket.use_asset_major(a):
        # Asset-major regime: vec partials are (B, 4, LANES) with per-asset
        # sums in lanes 0..a-1 — the runner folds them with c = 1.
        c, a_tile = 1, kbasket.LANES
        blocks, rows = cfg.layout_for(n_paths, kbasket.LANES * anti)
    else:
        a_tile, c, _ = kbasket.pack_factor(a)
        blocks, rows = cfg.layout_for(n_paths, c * anti)
    plan = kmulti_walk.make_plan(n_paths, blocks, rows, cfg.antithetic,
                                 cfg.dtype_str, cfg.precision.kahan,
                                 n_assets=a)
    cache_key = ("greeks_basket_asian", opt.n_obs, a, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        runner = _vec_greeks_runner(
            cfg, backend, plan,
            lambda o, ch, sd, off, pl_, nb:
                kmulti_walk.greek_pallas_partials(
                    o, ch, sd, off, pl_, nb, n_obs=opt.n_obs,
                    interpret=cfg.interpret),
            lambda o, ch, k, off, pl_, nb:
                kmulti_walk.greek_xla_partials(
                    o, ch, k, off, pl_, nb, n_obs=opt.n_obs),
            c, a_tile, a)
        _RUNNERS[cache_key] = runner
    total, vtot, disc = runner(bk, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    delta = mcest.estimate(vtot[0], vtot[1], n, discount=disc,
                           n_paths=plan.total_paths)
    vega = mcest.estimate(vtot[2], vtot[3], n, discount=disc,
                          n_paths=plan.total_paths)
    return GreeksResult(price=est(0), delta=delta, vega=vega, rho=est(1))


def greeks_basket_barrier(opt, n_paths: int, key: jax.Array,
                          config: EngineConfig = EngineConfig()) \
        -> "GreeksResult":
    """Per-asset LIKELIHOOD-RATIO delta/vega vectors + scalar rho of the
    knock-out basket call.

    The knockout indicator is discontinuous in every parameter, so
    pathwise differentiation is biased — the kernel differentiates the
    path DENSITY instead (Glasserman §7.3), carrying the per-asset
    z-projections ``q_j = z_j (L^{-1})^T`` with one extra block-diagonal
    MXU matmul per step (``kernels/multi_walk.py``, barrier Greeks
    section; the single-asset limits reduce to the classic LR scores).
    LR variance grows with the monitoring count — the standard trade-off,
    shared with :func:`greeks_barrier`.  Gated against the single-asset
    LR barrier kernel at ``a = 1`` and CRN bumps of
    :func:`price_basket_barrier`.  Theta/gamma documented-absent.
    """
    from mctpu.kernels import multi_walk as kmulti_walk
    from mctpu.types import GreeksResult

    opt.validate()
    bk = opt.basket
    a = bk.n_assets
    # The LR reparametrization shifts z along L^{-1} directions: it needs
    # an INVERTIBLE correlation.  Rank-deficient matrices (e.g. the
    # reference's alternating +-0.5 matrix beyond 2 assets) admit no such
    # shift — fail eagerly with guidance rather than emit inf scores.
    with jax.enable_x64(True):
        ll = np.asarray(mcmath.cholesky_lower(
            jnp.asarray(bk.corr, jnp.float64)), np.float64)
    if np.diag(ll).min() <= 1e-6:
        raise ValueError(
            "greeks_basket_barrier needs a full-rank correlation matrix "
            "(the likelihood-ratio scores shift z along L^-1 directions); "
            "this correlation is rank-deficient — use CRN bumps "
            "(mctpu.greeks.bump_and_revalue) instead")
    up = opt.kind == "up-and-out"
    barrier = float(opt.barrier)
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    if kbasket.use_asset_major(a):
        c, a_tile = 1, kbasket.LANES
        blocks, rows = cfg.layout_for(n_paths, kbasket.LANES * anti)
    else:
        a_tile, c, _ = kbasket.pack_factor(a)
        blocks, rows = cfg.layout_for(n_paths, c * anti)
    plan = kmulti_walk.make_plan(n_paths, blocks, rows, cfg.antithetic,
                                 cfg.dtype_str, cfg.precision.kahan,
                                 n_assets=a)
    cache_key = ("greeks_basket_barrier", opt.n_obs, a, barrier, up, plan,
                 cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        runner = _vec_greeks_runner(
            cfg, backend, plan,
            lambda o, ch, sd, off, pl_, nb:
                kmulti_walk.bar_greek_pallas_partials(
                    o, ch, sd, off, pl_, nb, n_obs=opt.n_obs,
                    barrier=barrier, up=up, interpret=cfg.interpret),
            lambda o, ch, k, off, pl_, nb:
                kmulti_walk.bar_greek_xla_partials(
                    o, ch, k, off, pl_, nb, n_obs=opt.n_obs,
                    barrier=barrier, up=up),
            c, a_tile, a)
        _RUNNERS[cache_key] = runner
    total, vtot, disc = runner(bk, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    delta = mcest.estimate(vtot[0], vtot[1], n, discount=disc,
                           n_paths=plan.total_paths)
    vega = mcest.estimate(vtot[2], vtot[3], n, discount=disc,
                          n_paths=plan.total_paths)
    return GreeksResult(price=est(0), delta=delta, vega=vega, rho=est(1))


def greeks_cva_multi(spec, n_paths: int, key: jax.Array,
                     config: EngineConfig = EngineConfig()) \
        -> "CvaGreeksResult":
    """Netting-set CVA sensitivities over M correlated underlyings.

    The multi-underlying completion of :func:`greeks_cva`: scalar credit
    delta (dCVA/dlambda, the CDS hedge ratio of the netting set) plus
    PER-UNDERLYING spot delta and vega vectors, fused into the correlated
    exposure walk (``kernels/cva_multi.py``, Greeks section).  Small sets
    (m <= 8) run the asset-major regime — one lane tile per underlying,
    no MXU matmuls, the ``d log S_m/dv_m`` tangent one carried FMA per
    tile per step; wider sets use the packed-lane layout, where each lane
    already is one underlying.  All-long netting sets gate against f64 finite
    differences of the exact closed form
    (:func:`mctpu.math.cva_multi_closed_form`); mixed-sign sets against
    CRN bumps.  Second-order outputs are ``None`` here (the single-
    underlying :func:`greeks_cva` carries them); use CRN bumps for
    netting-set gamma.  CVA estimator semantics: undiscounted mean.
    """
    from mctpu.kernels import cva_multi as kmulti
    from mctpu.types import CvaGreeksResult

    spec.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    m = spec.n_underlyings
    if kbasket.use_asset_major(m):
        # Asset-major regime: vec partials are (B, 4, LANES) with
        # per-underlying sums in lanes 0..m-1 — the runner folds c = 1.
        c, a_tile = 1, kbasket.LANES
        blocks, rows = cfg.layout_for(n_paths, kbasket.LANES * anti)
    else:
        a_tile, c, _ = kbasket.pack_factor(m)
        blocks, rows = cfg.layout_for(n_paths, c * anti)
    plan = kmulti.make_plan(n_paths, blocks, rows, cfg.antithetic,
                            cfg.dtype_str, cfg.precision.kahan,
                            n_underlyings=m)
    cache_key = ("greeks_cva_multi", spec.n_grid, m, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        runner = _vec_greeks_runner(
            cfg, backend, plan,
            lambda o, ch, sd, off, pl_, nb: kmulti.greek_pallas_partials(
                o, ch, sd, off, pl_, nb, interpret=cfg.interpret),
            lambda o, ch, k, off, pl_, nb: kmulti.greek_xla_partials(
                o, ch, k, off, pl_, nb),
            c, a_tile, m, spot_scale=True, discounted=False)
        _RUNNERS[cache_key] = runner
    total, vtot, disc = runner(spec, key)
    n = plan.total_units

    def est(i):
        # CVA semantics: undiscounted mean (MonteCarloKernel.cu:467);
        # the runner's disc is 1.0 (discounted=False).
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    delta = mcest.estimate(vtot[0], vtot[1], n, discount=disc,
                           n_paths=plan.total_paths)
    vega = mcest.estimate(vtot[2], vtot[3], n, discount=disc,
                          n_paths=plan.total_paths)
    return CvaGreeksResult(cva=est(0), credit_delta=est(1), delta=delta,
                           vega=vega)


def greeks_vanilla_ladder(opt: VanillaOption, strikes, n_paths: int,
                          key: jax.Array,
                          config: EngineConfig = EngineConfig()) \
        -> "GreeksResult":
    """The per-strike RISK ladder from one path sweep: vector-valued
    price/delta/vega/rho/theta/gamma across the whole strike ladder.

    Every strike reuses the same terminal draws (the comonotone pattern
    of :func:`price_vanilla_ladder`), so the output Greek ladders are
    arbitrage-consistent up to MC noise — e.g. the call delta ladder is
    monotone decreasing in K path-by-path, which independent per-strike
    runs cannot guarantee.  This is the production smile-risk /
    calibration-Jacobian sweep: one kernel launch returns d(price)/d(s0,
    v, r, T) and gamma at every quoted strike.  Integrands are the fused
    vanilla Greeks kernel's (``kernels/greeks.py``), shared-tile
    factored so each extra strike costs ~12 VPU ops
    (``kernels/ladder.py``, Greeks section).  Gated per strike against
    ``math.bs_greeks`` in ``tests/test_greeks.py``.
    """
    from mctpu.kernels import ladder as kladder
    from mctpu.types import GreeksResult

    opt.validate()
    strikes = jnp.asarray(strikes)
    n_k = int(strikes.shape[0])
    if not 1 <= n_k <= kladder.MAX_STRIKES:
        raise ValueError(f"strikes must have 1..{kladder.MAX_STRIKES} "
                         f"entries, got {n_k}")
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, 2 * kladder.LANES * anti)
    plan = kladder.make_plan(n_paths, blocks, rows, cfg.antithetic,
                             cfg.dtype_str, cfg.precision.kahan)
    k_key = tuple(float(x) for x in strikes)
    cache_key = ("greeks_ladder", k_key, opt.kind, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        ks = jnp.asarray(strikes, jnp.float32)

        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kladder.greek_pallas_partials(
                    a[0], ks, mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kladder.greek_xla_partials(
                    a[0], ks, a[1], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, disc = runner(opt, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[:, 2 * i], total[:, 2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    return GreeksResult(price=est(0), delta=est(1), vega=est(2),
                        rho=est(3), theta=est(4), gamma=est(5))


def greeks_varswap(opt, n_paths: int, key: jax.Array,
                   config: EngineConfig = EngineConfig(),
                   n_obs: int = 252):
    """Fair-strike sensitivities of a variance swap at engine scale.

    ``opt`` selects the dynamics like :func:`fair_variance_strike`.  Under
    GBM every sensitivity collapses onto the two carried walk sums
    ``(sum lr^2, sum lr)`` — ONE extra accumulator over pricing — and the
    result carries vega (dK/dv), rho (dK/dr) and theta (dK/dT), each gated
    against ``jax.grad`` of the exact discrete oracle
    ``v^2 + (r - v^2/2)^2 T/n``.  Under Heston the walk carries the
    forward-mode variance-parameter tangents of ``kernels/heston.py`` and
    returns a :class:`HestonGreeksResult` with vega = dK/dv0 plus
    dtheta/dkappa/dxi (gated vs the continuous-limit closed form and CRN
    bumps).  Spot delta is identically ZERO in both dynamics (log-returns
    are s0-free) and is returned as an exact ``0 ± 0`` rather than burning
    an accumulator; all outputs are in variance units (undiscounted fair
    strike, not a PV).

    Geometry note (measured, v5e): the Heston tangent walk's deep per-step
    dependency chain makes it monotone FASTER at small tiles — 28.2
    Gsteps/s at ``EngineConfig(rows=32)`` vs 16.8 at the 256-row default
    (`benchmarks/greeks_r4.json`).  The default geometry is kept for
    stream compatibility with the pricer; pass ``rows=32`` for throughput.
    """
    from mctpu.kernels import varswap as kvarswap
    from mctpu.types import GreeksResult, HestonGreeksResult

    opt.validate()
    dynamics = "heston" if isinstance(opt, HestonOption) else "gbm"
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kvarswap.LANES * anti)
    plan = kvarswap.make_plan(n_paths, blocks, rows, cfg.antithetic,
                              cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_varswap", dynamics, n_obs, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kvarswap.greek_pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    n_obs=n_obs, dynamics=dynamics,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kvarswap.greek_xla_partials(
                    a[0], a[1], off, plan, nb, n_obs=n_obs,
                    dynamics=dynamics)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            return pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total = runner(opt, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=1.0, n_paths=plan.total_paths)

    zero = mcest.estimate(jnp.zeros(()), jnp.zeros(()), n, discount=1.0,
                          n_paths=plan.total_paths)
    if dynamics == "gbm":
        return GreeksResult(price=est(0), delta=zero, vega=est(1),
                            rho=est(2), theta=est(3))
    return HestonGreeksResult(price=est(0), delta=zero, vega=est(1),
                              rho=est(5), dtheta=est(2), dkappa=est(3),
                              dxi=est(4))


def greeks_rainbow(opt, n_paths: int, key: jax.Array,
                   config: EngineConfig = EngineConfig()) -> "GreeksResult":
    """Price + per-asset pathwise delta/vega vectors of the rainbow call
    (MAX/MIN of correlated assets), plus scalar rho and theta.

    The fused kernel tracks the arg-extreme ASSET with a strict-compare
    select chain (the same device the lookback Greeks use along the time
    axis) and masks each pathwise integrand to the extreme asset — see
    ``kernels/rainbow.py`` (Greeks section) for the identities.  Same
    asset-major tile layout and RNG streams as :func:`price_rainbow`, so
    CRN bump comparisons are exact.  Two-asset Greeks are gated against
    ``jax.grad`` of the exact Stulz closed form in ``tests/test_greeks.py``.
    Gamma is ``None``: the arg-extreme indicator's derivative is a surface
    Dirac across the asset-crossing boundary with no sign-definite Stein
    tilt — use CRN bumps (:func:`mctpu.greeks.bump_and_revalue`).

    Asset-major regime only (``a <= 8``): every practical rainbow is a
    handful of assets.  Beyond that the packed-lane pricer still runs;
    sensitivities fall back to autodiff (:mod:`mctpu.greeks`).
    """
    from mctpu.kernels import rainbow as krainbow
    from mctpu.types import GreeksResult

    opt.validate()
    a = opt.n_assets
    if not kbasket.use_asset_major(a):
        raise ValueError(
            f"greeks_rainbow runs the asset-major regime (n_assets <= "
            f"{kbasket.ASSET_MAJOR_MAX}, got {a}); use autodiff via "
            "mctpu.greeks for larger rainbows")
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, 2 * kbasket.LANES * anti)
    plan = krainbow.make_plan(n_paths, blocks, rows, cfg.antithetic,
                              cfg.dtype_str, cfg.precision.kahan,
                              n_assets=a)
    cache_key = ("greeks_rainbow", a, opt.kind, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            chol = mcmath.cholesky_lower(
                jnp.asarray(o.corr, mcest.wide_dtype()))
            if backend == "pallas":
                fn = lambda ar, off, nb: krainbow.greek_pallas_partials(
                    ar[0], ar[1], mcrng.key_to_seed(ar[2]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda ar, off, nb: krainbow.greek_xla_partials(
                    ar[0], ar[1], ar[2], off, plan, nb)
            partials = _shard_blocks(cfg, plan.num_blocks, fn,
                                     (o, chol, k), P(PATH_AXIS, None))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            # Rows 6.. are per-asset (gd, gd2, gv, gv2) rows.
            vtot = total[6:].reshape(a, 4).T
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return total[:6], vtot, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, vtot, disc = runner(opt, key)
    n = plan.total_units

    def scal_est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=disc, n_paths=plan.total_paths)

    delta = mcest.estimate(vtot[0], vtot[1], n, discount=disc,
                           n_paths=plan.total_paths)
    vega = mcest.estimate(vtot[2], vtot[3], n, discount=disc,
                          n_paths=plan.total_paths)
    return GreeksResult(price=scal_est(0), delta=delta, vega=vega,
                        rho=scal_est(1), theta=scal_est(2))


def greeks(opt, n_paths: int, key: jax.Array,
           config: EngineConfig = EngineConfig()) -> "GreeksResult":
    """Engine-scale pathwise Greeks: dispatches on the product type."""
    from mctpu.types import (AmericanOption, AsianOption, BarrierOption,
                             LookbackOption, RainbowOption)
    if isinstance(opt, AmericanOption):
        return greeks_american(opt, n_paths, key, config)
    if isinstance(opt, VanillaOption):
        return greeks_vanilla(opt, n_paths, key, config)
    if isinstance(opt, BasketOption):
        return greeks_basket(opt, n_paths, key, config)
    if isinstance(opt, AsianOption):
        return greeks_asian(opt, n_paths, key, config)
    if isinstance(opt, LookbackOption):
        return greeks_lookback(opt, n_paths, key, config)
    if isinstance(opt, RainbowOption):
        return greeks_rainbow(opt, n_paths, key, config)
    if isinstance(opt, BarrierOption):
        return greeks_barrier(opt, n_paths, key, config)
    if isinstance(opt, HestonOption):
        return greeks_heston(opt, n_paths, key, config)
    if isinstance(opt, (CvaSpec, CvaPortfolioSpec)):
        return greeks_cva(opt, n_paths, key, config)
    if isinstance(opt, CvaMultiSpec):
        return greeks_cva_multi(opt, n_paths, key, config)
    from mctpu.types import (BasketAsianOption, BasketBarrierOption,
                             CliquetOption)
    if isinstance(opt, CliquetOption):
        return greeks_cliquet(opt, n_paths, key, config)
    if isinstance(opt, BasketAsianOption):
        return greeks_basket_asian(opt, n_paths, key, config)
    if isinstance(opt, BasketBarrierOption):
        return greeks_basket_barrier(opt, n_paths, key, config)
    raise TypeError(f"no in-kernel Greeks for {type(opt).__name__}; "
                    "see mctpu.greeks for autodiff/CRN fallbacks")


# ---------------------------------------------------------------------------
# Multi-asset walk products (basket-Asian / basket-barrier)
# ---------------------------------------------------------------------------

def _multi_walk_shim(**walk_kwargs):
    """Adapt :mod:`mctpu.kernels.multi_walk` to the `_price_scalar` kernel
    protocol by baking the product's static walk parameters in."""
    import functools as _ft
    import types as _types

    from mctpu.kernels import multi_walk as kmulti
    return _types.SimpleNamespace(
        make_plan=kmulti.make_plan,
        pallas_partials=_ft.partial(kmulti.pallas_partials, **walk_kwargs),
        xla_partials=_ft.partial(kmulti.xla_partials, **walk_kwargs),
    )


def _prep_chol(o):
    return (mcmath.cholesky_lower(jnp.asarray(o.corr, mcest.wide_dtype())),)


def price_basket_asian(opt, n_paths: int, key: jax.Array,
                       config: EngineConfig = EngineConfig()) -> McResult:
    """Arithmetic-average Asian call on a correlated basket value.

    Beyond the reference: composes the basket kernel's packed correlation
    matmuls with the Asian running-average walk
    (:mod:`mctpu.kernels.multi_walk`).
    """
    opt.validate()
    bk = opt.basket
    anti = 2 if config.antithetic else 1
    # Paths per (block, iter, row): asset-major walks a full 128-lane path
    # tile; the packed layout walks c paths per row (kernels/multi_walk.py).
    if kbasket.use_asset_major(bk.n_assets):
        c = kbasket.LANES
    else:
        _, c, _ = kbasket.pack_factor(bk.n_assets)
    shim = _multi_walk_shim(product="asian", n_obs=opt.n_obs)
    return _price_scalar("basket_asian", shim, c * anti,
                         (opt.n_obs, bk.n_assets), bk, n_paths, key, config,
                         prep=_prep_chol,
                         plan_kwargs=(("n_assets", bk.n_assets),))


def price_basket_barrier(opt, n_paths: int, key: jax.Array,
                         config: EngineConfig = EngineConfig()) -> McResult:
    """Knock-out call on a correlated basket value (discrete monitoring)."""
    opt.validate()
    bk = opt.basket
    anti = 2 if config.antithetic else 1
    if kbasket.use_asset_major(bk.n_assets):
        c = kbasket.LANES
    else:
        _, c, _ = kbasket.pack_factor(bk.n_assets)
    up = opt.kind == "up-and-out"
    barrier = float(opt.barrier)
    shim = _multi_walk_shim(product="barrier", n_obs=opt.n_obs,
                            barrier=barrier, up=up)
    return _price_scalar("basket_barrier", shim, c * anti,
                         (opt.n_obs, bk.n_assets, barrier, opt.kind), bk,
                         n_paths, key, config, prep=_prep_chol,
                         plan_kwargs=(("n_assets", bk.n_assets),))


# ---------------------------------------------------------------------------
# Heston
# ---------------------------------------------------------------------------

def price_heston(opt: HestonOption, n_paths: int, key: jax.Array,
                 config: EngineConfig = EngineConfig(),
                 n_steps: int = 100, scheme: str = "euler") -> McResult:
    """European call under Heston stochastic volatility.

    ``scheme``: ``"euler"`` (full-truncation Euler; O(dt) bias) or ``"qe"``
    (Andersen 2008 quadratic-exponential with martingale-style K0..K4
    log-spot discretization; effectively unbiased even at coarse grids —
    measured z ~ 0.1 vs the characteristic-function price at 16 steps,
    where Euler carries ~0.1 absolute bias).

    A second dynamics family beyond the reference's GBM; anchored by the
    characteristic-function pricer
    (:func:`mctpu.models.heston.cf_call_price`).
    """
    opt.validate()
    if scheme not in ("euler", "qe"):
        raise ValueError("scheme must be 'euler' or 'qe'")
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kheston.LANES * anti)
    plan = kheston.make_plan(n_paths, blocks, rows, cfg.antithetic,
                             cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("heston", n_steps, scheme, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(o, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kheston.pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb, n_steps,
                    interpret=cfg.interpret, scheme=scheme)
            else:
                fn = lambda a, off, nb: kheston.xla_partials(
                    a[0], a[1], off, plan, nb, n_steps, scheme=scheme)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (o, k),
                                     P(PATH_AXIS, None))
            sum_p, sum_p2 = _combine(partials)
            wide = mcest.wide_dtype()
            disc = jnp.exp(-jnp.asarray(o.r, wide) * jnp.asarray(o.t, wide))
            return sum_p, sum_p2, disc

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sum_p, sum_p2, disc = runner(opt, key)
    return mcest.estimate(sum_p, sum_p2, plan.total_units, discount=disc,
                          n_paths=plan.total_paths)


# ---------------------------------------------------------------------------
# CVA
# ---------------------------------------------------------------------------

def price_cva(spec: CvaSpec, n_paths: int, key: jax.Array,
              config: EngineConfig = EngineConfig()) -> CvaResult:
    """CVA of a European call over an ``n_grid`` exposure grid (twin of
    ``dev_cvaEquityOption``, ``MonteCarloKernel.cu:518-534``).

    Returns the CVA (mean of per-path default legs, undiscounted like the
    reference: ``MonteCarloKernel.cu:467``) plus the expected-exposure
    profile per grid node.  Internally the M=1 case of
    :func:`price_cva_portfolio`.
    """
    spec.validate()
    return price_cva_portfolio(CvaPortfolioSpec.from_single(spec), n_paths,
                               key, config)


def price_cva_multi(spec, n_paths: int, key: jax.Array,
                    config: EngineConfig = EngineConfig()) -> CvaResult:
    """CVA of a netting set of calls on M *correlated underlyings*.

    The production generalization of :func:`price_cva_portfolio` (which nets
    options on one underlying): see :class:`mctpu.types.CvaMultiSpec`.
    All-long weights admit the exact closed form
    :func:`mctpu.math.cva_multi_closed_form`.
    """
    from mctpu.kernels import cva_multi as kmulti

    spec.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    if kbasket.use_asset_major(spec.n_underlyings):
        unit = kbasket.LANES * anti  # asset-major: every lane a path
    else:
        _, c, _ = kbasket.pack_factor(spec.n_underlyings)
        unit = c * anti
    blocks, rows = cfg.layout_for(n_paths, unit)
    plan = kmulti.make_plan(n_paths, blocks, rows, cfg.antithetic,
                            cfg.dtype_str, cfg.precision.kahan,
                            n_underlyings=spec.n_underlyings)
    cache_key = ("cva_multi", spec.n_grid, spec.n_underlyings, plan,
                 cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(sp, k):
            chol = mcmath.cholesky_lower(
                jnp.asarray(sp.corr, mcest.wide_dtype()))
            if backend == "pallas":
                fn = lambda a, off, nb: kmulti.pallas_partials(
                    a[0], a[1], mcrng.key_to_seed(a[2]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kmulti.xla_partials(
                    a[0], a[1], a[2], off, plan, nb)
            partials, ee_sums = _shard_blocks(
                cfg, plan.num_blocks, fn, (sp, chol, k),
                (P(PATH_AXIS, None), P(PATH_AXIS, None)))
            sum_p, sum_p2 = _combine(partials)
            wide = mcest.wide_dtype()
            ee_profile = pairwise_tree_sum(jnp.asarray(ee_sums, wide), axis=0)
            return sum_p, sum_p2, ee_profile

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sum_p, sum_p2, ee_profile = runner(spec, key)
    n = plan.total_units
    res = mcest.estimate(sum_p, sum_p2, n, discount=1.0,
                         n_paths=plan.total_paths)
    dp = mcmath.default_leg_weights(spec.intensity, spec.t, spec.n_grid,
                                    dtype=mcest.wide_dtype())
    return CvaResult(cva=res.price, ci=res.ci, std_error=res.std_error,
                     expected_exposure=ee_profile / plan.total_units,
                     default_leg=dp, n=n, n_paths=plan.total_paths)


def price_xva(spec: XvaSpec, n_paths: int, key: jax.Array,
              config: EngineConfig = EngineConfig()) -> XvaResult:
    """Bilateral xVA of a netting set: CVA, DVA, FCA and FBA from ONE
    fused exposure sweep, plus both exposure profiles (EPE and ENE).

    Beyond the reference (unilateral CVA only, ``cvaOpt.cu``): the netted
    value the CVA walk already computes carries both exposure sides, so
    the bank-side legs cost four extra accumulators, not a second
    simulation — and leg differences (``bcva``, ``fva``) carry
    common-random-number noise only.  At ``own_intensity = 0``,
    ``funding_spread = 0`` the CVA leg ties :func:`price_cva_multi`
    bitwise on shared streams (same walk, same node math, same tables).

    Two conventions to know (both engine-wide, inherited from the
    reference):

    - **All legs are undiscounted means** (``MonteCarloKernel.cu:467``)
      — including FCA/FBA, so the FVA here is the forward-valued
      accrual, NOT the conventional discounted FVA integral.  To convert
      to a discounted convention, weight node contributions by
      ``exp(-r t_j)`` (the deterministic node tables make this a table
      swap; see :func:`mctpu.math.funding_leg_weights`).
    - **First-to-default weighting uses the start-of-interval survival
      discretization** (see :func:`mctpu.math.xva_leg_weights` for the
      O(dt)-per-node bias statement), mirrored exactly in the closed
      form and the NumPy oracle.

    The Pallas kernel is asset-major: netting sets wider than
    ``m = 8`` underlyings run the XLA twin even under
    ``backend='pallas'`` (same structure at any m; a debug log signals
    the reroute).
    """
    from mctpu.kernels import cva_multi as kmulti

    spec.validate()
    net = spec.netting
    cfg = config
    backend = cfg.resolve_backend()
    # Asset-major in both backends (every lane a path); netting sets wider
    # than the asset-major regime route to the XLA twin, which runs the
    # same structure at any m.
    if backend == "pallas" and not kbasket.use_asset_major(
            net.n_underlyings):
        _log.debug("price_xva: netting set of %d underlyings exceeds the "
                   "asset-major Pallas regime (m <= %d); running the XLA "
                   "twin", net.n_underlyings, kbasket.ASSET_MAJOR_MAX)
        backend = "xla"
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kbasket.LANES * anti)
    plan = kmulti.Plan.plan(n_paths, blocks, rows,
                            rows * kbasket.LANES * anti,
                            rows * kbasket.LANES, cfg.antithetic,
                            cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("xva", net.n_grid, net.n_underlyings, plan, backend,
                 cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(sp, k):
            chol = mcmath.cholesky_lower(
                jnp.asarray(sp.netting.corr, mcest.wide_dtype()))
            if backend == "pallas":
                fn = lambda a, off, nb: kmulti.xva_pallas_partials(
                    a[0], a[1], mcrng.key_to_seed(a[2]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kmulti.xva_xla_partials(
                    a[0], a[1], a[2], off, plan, nb)
            partials, profs = _shard_blocks(
                cfg, plan.num_blocks, fn, (sp, chol, k),
                (P(PATH_AXIS, None), P(PATH_AXIS, None, None)))
            wide = mcest.wide_dtype()
            sums = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            prof = pairwise_tree_sum(jnp.asarray(profs, wide), axis=0)
            return sums, prof

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sums, prof = runner(spec, key)
    n = plan.total_units
    legs = [mcest.estimate(sums[2 * i], sums[2 * i + 1], n, discount=1.0,
                           n_paths=plan.total_paths) for i in range(4)]
    return XvaResult(cva=legs[0], dva=legs[1], fca=legs[2], fba=legs[3],
                     epe_profile=prof[0] / n, ene_profile=prof[1] / n)


def greeks_xva(spec: XvaSpec, n_paths: int, key: jax.Array,
               config: EngineConfig = EngineConfig()) -> "XvaGreeksResult":
    """Bilateral xVA legs plus hedge sensitivities from ONE fused sweep.

    The Greeks completion of :func:`price_xva` (the contract every family
    carries): the four legs, the per-leg credit/funding ratios
    (``credit_cpty`` = dCVA/dlambda_cpty, ``credit_own`` = dDVA/dlambda_own,
    ``funding`` = dFVA/dspread — deterministic derivative tables,
    :func:`mctpu.math.xva_leg_weight_derivs`, over the same per-path
    exposure integrands) and per-underlying pathwise ``delta``/``vega``
    vectors of the total adjustment XVA = CVA - DVA + FCA - FBA (the
    exposure side each path sits on selects the node weight — one select,
    shared by every underlying's tangent).  Single-signed netting sets
    gate against f64 finite differences of
    :func:`mctpu.math.xva_multi_closed_form`; mixed-sign sets against CRN
    bumps of :func:`price_xva`.  CVA estimator semantics throughout:
    undiscounted mean (``MonteCarloKernel.cu:467``).  Beyond the
    reference (unilateral CVA pricer only, ``cvaOpt.cu``).

    Like :func:`price_xva`, netting sets wider than the asset-major
    regime (m > 8) run the XLA twin even under ``backend='pallas'`` (same
    structure at any m; the Pallas kernel is asset-major only).
    """
    from mctpu.kernels import cva_multi as kmulti
    from mctpu.types import XvaGreeksResult

    spec.validate()
    net = spec.netting
    cfg = config
    backend = cfg.resolve_backend()
    if backend == "pallas" and not kbasket.use_asset_major(
            net.n_underlyings):
        _log.debug("greeks_xva: netting set of %d underlyings exceeds the "
                   "asset-major Pallas regime (m <= %d); running the XLA "
                   "twin", net.n_underlyings, kbasket.ASSET_MAJOR_MAX)
        backend = "xla"
    m = net.n_underlyings
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kbasket.LANES * anti)
    plan = kmulti.Plan.plan(n_paths, blocks, rows,
                            rows * kbasket.LANES * anti,
                            rows * kbasket.LANES, cfg.antithetic,
                            cfg.dtype_str, cfg.precision.kahan)
    cache_key = ("greeks_xva", net.n_grid, m, plan, backend, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(sp, k):
            chol = mcmath.cholesky_lower(
                jnp.asarray(sp.netting.corr, mcest.wide_dtype()))
            if backend == "pallas":
                fn = lambda a, off, nb: kmulti.xva_greek_pallas_partials(
                    a[0], a[1], mcrng.key_to_seed(a[2]), off, plan, nb,
                    interpret=cfg.interpret)
            else:
                fn = lambda a, off, nb: kmulti.xva_greek_xla_partials(
                    a[0], a[1], a[2], off, plan, nb)
            partials, vecs = _shard_blocks(
                cfg, plan.num_blocks, fn, (sp, chol, k),
                (P(PATH_AXIS, None), P(PATH_AXIS, None, None)))
            wide = mcest.wide_dtype()
            total = pairwise_tree_sum(jnp.asarray(partials, wide), axis=0)
            vtot = pairwise_tree_sum(jnp.asarray(vecs, wide),
                                     axis=0)[:, :m]
            # Homogeneity: the kernel accumulates w_m S_m N(d1) factors;
            # dV/ds0_m needs the 1/s0_m scale (same convention as
            # greeks_cva_multi's spot_scale).
            s0 = jnp.broadcast_to(jnp.asarray(sp.netting.s, wide), (m,))
            vtot = vtot.at[0].divide(s0).at[1].divide(s0 * s0)
            return total, vtot

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total, vtot = runner(spec, key)
    n = plan.total_units

    def est(i):
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=1.0, n_paths=plan.total_paths)

    delta = mcest.estimate(vtot[0], vtot[1], n, discount=1.0,
                           n_paths=plan.total_paths)
    vega = mcest.estimate(vtot[2], vtot[3], n, discount=1.0,
                          n_paths=plan.total_paths)
    return XvaGreeksResult(cva=est(0), dva=est(1), fca=est(2), fba=est(3),
                           credit_cpty=est(4), credit_own=est(5),
                           funding=est(6), delta=delta, vega=vega)


def price_cva_portfolio(port: CvaPortfolioSpec, n_paths: int, key: jax.Array,
                        config: EngineConfig = EngineConfig()) -> CvaResult:
    """CVA of a netted portfolio of calls on one underlying.

    Exposure at each node is ``max(sum_m w_m BS(S_j, k_m, t_rem), 0)`` —
    short positions offset long ones inside the netting set (the thesis
    scope the reference's ``CVA.ns`` field gestures at; ``MonteCarlo.h:62``).

    With ``wwr_b != 0`` the default leg is a path-dependent stochastic
    hazard; the returned ``default_leg`` is then the wwr_b = 0 baseline
    (see :class:`mctpu.types.CvaResult`).
    """
    port.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kcva.LANES * anti)
    plan = kcva.make_plan(n_paths, blocks, rows, cfg.antithetic,
                          cfg.dtype_str, cfg.precision.kahan,
                          ds=cfg.precision.ds)
    # Static wrong-way-risk switch: wwr_b == 0 keeps the reference's
    # deterministic default leg (and its exact numerics) compiled in.
    wwr = not _concrete_zero(port.wwr_b)
    cache_key = ("cva", port.n_grid, port.n_options, wwr, plan, cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(sp: CvaPortfolioSpec, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kcva.pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret, wwr=wwr)
            else:
                fn = lambda a, off, nb: kcva.xla_partials(
                    a[0], a[1], off, plan, nb, wwr=wwr)
            partials, ee_sums = _shard_blocks(
                cfg, plan.num_blocks, fn, (sp, k),
                (P(PATH_AXIS, None), P(PATH_AXIS, None)))
            sum_p, sum_p2 = _combine(partials)
            wide = mcest.wide_dtype()
            ee_profile = pairwise_tree_sum(
                jnp.asarray(ee_sums, wide), axis=0)
            return sum_p, sum_p2, ee_profile

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    sum_p, sum_p2, ee_profile = runner(port, key)
    n = plan.total_units
    res = mcest.estimate(sum_p, sum_p2, n, discount=1.0,
                         n_paths=plan.total_paths)
    dp = mcmath.default_leg_weights(port.intensity, port.t,
                                    port.n_grid, dtype=mcest.wide_dtype())
    return CvaResult(
        cva=res.price,
        ci=res.ci,
        std_error=res.std_error,
        expected_exposure=ee_profile / plan.total_units,
        default_leg=dp,
        n=n,
        n_paths=plan.total_paths,
    )


def greeks_cva(spec, n_paths: int, key: jax.Array,
               config: EngineConfig = EngineConfig()) -> "CvaGreeksResult":
    """CVA + pathwise credit delta / spot delta / vega / spot gamma /
    credit gamma / cross gamma, fused in one sweep.

    Accepts a :class:`CvaSpec` or :class:`CvaPortfolioSpec` (netting +
    wrong-way risk).  Runs the flagship engine contract on 14 accumulators
    (:mod:`mctpu.kernels.cva`, Greeks section): fused Pallas kernel (or
    XLA twin), mesh-sharded blocks, fixed-order f64 combine, the CVA
    estimator's undiscounted-mean semantics for every output.  The WWR
    variant carries forward-mode hazard sensitivities
    (dsurv/dlambda, dsurv/dv) through the walk.  Gated against finite
    differences of :func:`mctpu.math.cva_closed_form` and CRN bumps in
    ``tests/test_greeks.py``; twin of the missing Greeks tier for
    ``cvaCallOptMC`` (``MonteCarloKernel.cu:223-284``).
    """
    from mctpu.types import CvaGreeksResult

    if isinstance(spec, CvaSpec):
        spec = CvaPortfolioSpec.from_single(spec)
    spec.validate()
    cfg = config
    backend = cfg.resolve_backend()
    anti = 2 if cfg.antithetic else 1
    blocks, rows = cfg.layout_for(n_paths, kcva.LANES * anti)
    plan = kcva.make_plan(n_paths, blocks, rows, cfg.antithetic,
                          cfg.dtype_str, cfg.precision.kahan)
    wwr = not _concrete_zero(spec.wwr_b)
    cache_key = ("greeks_cva", spec.n_grid, spec.n_options, wwr, plan,
                 cfg._key())
    runner = _RUNNERS.get(cache_key)
    if runner is None:
        def run(sp, k):
            if backend == "pallas":
                fn = lambda a, off, nb: kcva.greek_pallas_partials(
                    a[0], mcrng.key_to_seed(a[1]), off, plan, nb,
                    interpret=cfg.interpret, wwr=wwr)
            else:
                fn = lambda a, off, nb: kcva.greek_xla_partials(
                    a[0], a[1], off, plan, nb, wwr=wwr)
            partials = _shard_blocks(cfg, plan.num_blocks, fn, (sp, k),
                                     P(PATH_AXIS, None))
            return pairwise_tree_sum(
                jnp.asarray(partials, mcest.wide_dtype()), axis=0)

        runner = jax.jit(run)
        _RUNNERS[cache_key] = runner
    total = runner(spec, key)
    n = plan.total_units

    def est(i):
        # CVA semantics: undiscounted mean (MonteCarloKernel.cu:467).
        return mcest.estimate(total[2 * i], total[2 * i + 1], n,
                              discount=1.0, n_paths=plan.total_paths)

    return CvaGreeksResult(cva=est(0), credit_delta=est(1), delta=est(2),
                           vega=est(3), gamma=est(4), credit_gamma=est(5),
                           cross_gamma=est(6))
