"""Data model for the TPU-native Monte Carlo pricing framework.

This is the L1 layer of the framework: typed, JAX-pytree-registered product
and result records. It replaces the C structs of the reference
(``single_precision/MonteCarlo.h:33-74``): ``OptionData`` -> :class:`VanillaOption`,
``MultiOptionData`` -> :class:`BasketOption`, ``CVA`` -> :class:`CvaSpec`,
``OptionValue`` -> :class:`McResult`.

Two deliberate upgrades over the reference:

* the basket size is a runtime value (``n_assets``), not the compile-time
  ``#define N 3`` of ``MonteCarlo.h:17``;
* precision is a single policy enum (:class:`Precision`) instead of the
  duplicated ``single_precision/`` / ``double_precision/`` source trees.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Precision",
    "VanillaOption",
    "VanillaBook",
    "BarrierBook",
    "BasketOption",
    "AsianOption",
    "LookbackOption",
    "RainbowOption",
    "BasketAsianOption",
    "BasketBarrierOption",
    "CvaSpec",
    "CvaPortfolioSpec",
    "CvaMultiSpec",
    "XvaSpec",
    "McResult",
    "CvaResult",
    "XvaResult",
    "XvaGreeksResult",
    "GreeksResult",
]


class Precision(str, enum.Enum):
    """Accumulation/compute precision policy.

    The reference maintains two whole source trees (``single_precision/``,
    ``double_precision/``) that differ only in ``float`` vs ``double``.  On
    TPU, f64 is emulated and slow, so the headline policy is f32 compute with
    compensated (Kahan) accumulation; F64 exists for CPU oracles and parity
    checks.
    """

    F32 = "f32"
    F32_KAHAN = "f32_kahan"
    # Double-single: Kahan accumulators PLUS a two-float (hi, lo) carried
    # walk state in the serial grid kernels (CVA) — the on-chip analogue
    # of the reference's device f64 tree, usable on the Pallas backend
    # (see mctpu.utils.accum, double-single section).
    F32_DS = "f32_ds"
    F64 = "f64"

    @property
    def dtype(self) -> jnp.dtype:
        return jnp.float64 if self is Precision.F64 else jnp.float32

    @property
    def kahan(self) -> bool:
        return self in (Precision.F32_KAHAN, Precision.F32_DS)

    @property
    def ds(self) -> bool:
        return self is Precision.F32_DS


def _register_pytree(cls):
    """Register a frozen dataclass as a JAX pytree.

    Array-like fields become leaves; ints and other metadata-ish fields are
    kept as aux data so they stay static under ``jit``.
    """
    fields = [f.name for f in dataclasses.fields(cls)]
    leaf_fields = [f.name for f in dataclasses.fields(cls) if f.metadata.get("leaf", True)]
    static_fields = [f for f in fields if f not in leaf_fields]

    def flatten(obj):
        children = tuple(getattr(obj, name) for name in leaf_fields)
        aux = tuple(getattr(obj, name) for name in static_fields)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(leaf_fields, children))
        kwargs.update(dict(zip(static_fields, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def _static(**kw):
    return dataclasses.field(metadata={"leaf": False}, **kw)


def _concrete(*values) -> bool:
    """True when no value is a JAX tracer (validation only runs eagerly)."""
    return not any(isinstance(v, jax.core.Tracer) for v in values)


@_register_pytree
@dataclasses.dataclass(frozen=True)
class VanillaOption:
    """European option under Black-Scholes GBM.

    Mirrors ``OptionData`` (``MonteCarlo.h:33-39``): spot ``s``, strike ``k``,
    risk-free rate ``r``, volatility ``v``, time to maturity ``t`` — plus a
    ``kind`` field ("call" | "put"; the reference prices calls only).
    """

    s: Any  # spot price
    k: Any  # strike
    r: Any  # risk-free rate
    v: Any  # volatility
    t: Any  # time to maturity (years)
    kind: str = _static(default="call")

    def astype(self, dtype) -> "VanillaOption":
        return VanillaOption(
            *(jnp.asarray(x, dtype) for x in (self.s, self.k, self.r,
                                              self.v, self.t)),
            kind=self.kind)

    def validate(self) -> None:
        """Eager sanity checks (no-op under tracing)."""
        if self.kind not in ("call", "put"):
            raise ValueError("kind must be 'call' or 'put'")
        if not _concrete(self.s, self.k, self.v, self.t):
            return
        if not (float(self.s) > 0 and float(self.k) > 0):
            raise ValueError("spot and strike must be positive")
        if float(self.v) < 0:
            raise ValueError("volatility must be non-negative")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class VanillaBook:
    """A portfolio ("book") of M independent European options.

    The serving-side batch record: per-instrument spot / strike / rate /
    vol / maturity vectors plus a static call/put mix.  No analogue exists
    in the reference (one option per driver binary,
    ``vanillaOpt.cu:22-26``); this is the batch generalization the engine
    prices in ONE fused sweep (``engine.price_book``), with all market
    data passed as runtime arrays so repricing on a tick never recompiles.

    Shapes: ``s, k, r, v, t`` are ``(M,)``; ``kinds`` is a length-M tuple
    of ``"call"``/``"put"`` (static: it sets instrument payoff signs, and
    books with the same size and mix share one compiled program — the
    signs themselves are traced data, so even the mix only affects the
    cache key, not the compilation).
    """

    s: Any  # spots, (M,)
    k: Any  # strikes, (M,)
    r: Any  # risk-free rates, (M,)
    v: Any  # volatilities, (M,)
    t: Any  # maturities, (M,)
    kinds: tuple = _static(default=())

    @property
    def n_instruments(self) -> int:
        return int(np.shape(self.s)[0])

    @staticmethod
    def from_options(options) -> "VanillaBook":
        """Build a book from a sequence of :class:`VanillaOption`.

        Values keep their natural precision (f64 under x64, f32 otherwise
        — same as scalar option fields); engines downcast where they
        compute, so a one-instrument book prices bitwise-identically to
        :func:`mctpu.engine.price_vanilla` on shared streams.
        """
        opts = list(options)
        return VanillaBook(
            s=jnp.asarray([o.s for o in opts]),
            k=jnp.asarray([o.k for o in opts]),
            r=jnp.asarray([o.r for o in opts]),
            v=jnp.asarray([o.v for o in opts]),
            t=jnp.asarray([o.t for o in opts]),
            kinds=tuple(o.kind for o in opts))

    def option(self, i: int) -> "VanillaOption":
        """Instrument ``i`` as a standalone :class:`VanillaOption`."""
        return VanillaOption(s=self.s[i], k=self.k[i], r=self.r[i],
                             v=self.v[i], t=self.t[i], kind=self.kinds[i])

    def astype(self, dtype) -> "VanillaBook":
        return VanillaBook(
            *(jnp.asarray(x, dtype) for x in (self.s, self.k, self.r,
                                              self.v, self.t)),
            kinds=self.kinds)

    def validate(self) -> None:
        """Eager sanity checks (no-op under tracing)."""
        m = self.n_instruments
        if m < 1:
            raise ValueError("book must hold at least one instrument")
        for name, x in (("s", self.s), ("k", self.k), ("r", self.r),
                        ("v", self.v), ("t", self.t)):
            if np.shape(x) != (m,):
                raise ValueError(f"{name} must have shape ({m},), "
                                 f"got {np.shape(x)}")
        if len(self.kinds) != m:
            raise ValueError(f"kinds must have {m} entries, "
                             f"got {len(self.kinds)}")
        if any(kd not in ("call", "put") for kd in self.kinds):
            raise ValueError("kinds entries must be 'call' or 'put'")
        if not _concrete(self.s, self.k, self.v, self.t):
            return
        s, k, v, t = (np.asarray(x) for x in (self.s, self.k, self.v,
                                              self.t))
        if not (np.all(s > 0) and np.all(k > 0)):
            raise ValueError("spots and strikes must be positive")
        if np.any(v < 0):
            raise ValueError("volatilities must be non-negative")
        if np.any(t <= 0):
            raise ValueError("maturities must be positive")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class BarrierBook:
    """A book of M heterogeneous knock-out BARRIER options sharing one
    walk sweep.

    The path-dependent extension of :class:`VanillaBook` (real books are
    mostly path-dependent): per-instrument spot / strike / rate / vol /
    maturity / barrier vectors, a static call/put mix and a static
    up-and-out / down-and-out direction mix, and a shared observation
    grid ``n_obs``.  All M instruments advance on ONE shared
    standard-normal increment stream (each with its own per-step drift
    and vol scaling), so marks and Greeks are comonotone across the book
    and the draw cost is paid once (``kernels/barrier_book.py``).  All
    market data is runtime arrays — repricing a same-shape book on a
    tick never recompiles.  No analogue in the reference.
    """

    s: Any  # spots, (M,)
    k: Any  # strikes, (M,)
    r: Any  # risk-free rates, (M,)
    v: Any  # volatilities, (M,)
    t: Any  # maturities, (M,)
    barrier: Any  # knock-out levels, (M,)
    n_obs: int = _static(default=50)
    kinds: tuple = _static(default=())
    directions: tuple = _static(default=())  # "up-and-out"/"down-and-out"

    @property
    def n_instruments(self) -> int:
        return int(np.shape(self.s)[0])

    @staticmethod
    def from_options(options) -> "BarrierBook":
        """Build a book from a sequence of :class:`BarrierOption` (which
        must share ``n_obs``; they are calls by construction)."""
        opts = list(options)
        n_obs = {o.n_obs for o in opts}
        if len(n_obs) != 1:
            raise ValueError("BarrierBook instruments must share n_obs "
                             f"(got {sorted(n_obs)})")
        return BarrierBook(
            s=jnp.asarray([o.s for o in opts]),
            k=jnp.asarray([o.k for o in opts]),
            r=jnp.asarray([o.r for o in opts]),
            v=jnp.asarray([o.v for o in opts]),
            t=jnp.asarray([o.t for o in opts]),
            barrier=jnp.asarray([o.barrier for o in opts]),
            n_obs=n_obs.pop(),
            kinds=tuple("call" for _ in opts),
            directions=tuple(o.kind for o in opts))

    def option(self, i: int) -> "BarrierOption":
        """Instrument ``i`` as a standalone :class:`BarrierOption`
        (calls only — the single pricer has no put variant)."""
        if self.kinds[i] != "call":
            raise ValueError("single BarrierOption is call-only")
        return BarrierOption(s=self.s[i], k=self.k[i], r=self.r[i],
                             v=self.v[i], t=self.t[i],
                             barrier=self.barrier[i], n_obs=self.n_obs,
                             kind=self.directions[i])

    def astype(self, dtype) -> "BarrierBook":
        return BarrierBook(
            *(jnp.asarray(x, dtype) for x in (self.s, self.k, self.r,
                                              self.v, self.t,
                                              self.barrier)),
            n_obs=self.n_obs, kinds=self.kinds, directions=self.directions)

    def validate(self) -> None:
        """Eager sanity checks (no-op under tracing)."""
        m = self.n_instruments
        if m < 1:
            raise ValueError("book must hold at least one instrument")
        if self.n_obs < 1:
            raise ValueError("n_obs must be >= 1")
        for name, x in (("s", self.s), ("k", self.k), ("r", self.r),
                        ("v", self.v), ("t", self.t),
                        ("barrier", self.barrier)):
            if np.shape(x) != (m,):
                raise ValueError(f"{name} must have shape ({m},), "
                                 f"got {np.shape(x)}")
        if len(self.kinds) != m or len(self.directions) != m:
            raise ValueError(f"kinds and directions must have {m} entries")
        if any(kd not in ("call", "put") for kd in self.kinds):
            raise ValueError("kinds entries must be 'call' or 'put'")
        if any(d not in ("up-and-out", "down-and-out")
               for d in self.directions):
            raise ValueError("directions entries must be 'up-and-out' or "
                             "'down-and-out'")
        if not _concrete(self.s, self.k, self.v, self.t, self.barrier):
            return
        s, k, v, t, b = (np.asarray(x) for x in
                         (self.s, self.k, self.v, self.t, self.barrier))
        if not (np.all(s > 0) and np.all(k > 0) and np.all(b > 0)):
            raise ValueError("spots, strikes and barriers must be positive")
        if np.any(v < 0):
            raise ValueError("volatilities must be non-negative")
        if np.any(t <= 0):
            raise ValueError("maturities must be positive")
        up = np.asarray([d == "up-and-out" for d in self.directions])
        dead = np.where(up, s >= b, s <= b)
        if np.any(dead):
            raise ValueError("instrument starts knocked out "
                             f"(indices {np.nonzero(dead)[0].tolist()})")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class BasketOption:
    """European call on a weighted basket of correlated GBM underlyings.

    Mirrors ``MultiOptionData`` (``MonteCarlo.h:42-51``) with one key change:
    the reference stores the correlation matrix in ``p`` and then *overwrites
    it in place with its Cholesky factor* before pricing
    (``basketOpt.cu:96-99``).  Here the two are distinct: ``corr`` always holds
    the correlation matrix; engines compute the lower Cholesky factor
    explicitly (:func:`mctpu.math.cholesky_lower`).

    Shapes: ``s, v, w, d`` are ``(n_assets,)``; ``corr`` is
    ``(n_assets, n_assets)``.
    """

    s: Any  # spot prices, (A,)
    v: Any  # volatilities, (A,)
    w: Any  # basket weights, (A,)
    corr: Any  # correlation matrix, (A, A)
    d: Any  # Brownian drift vector (reference's MOPTION.d; usually zero), (A,)
    k: Any  # strike
    r: Any  # risk-free rate
    t: Any  # time to maturity

    @property
    def n_assets(self) -> int:
        return int(np.shape(self.s)[0])

    def astype(self, dtype) -> "BasketOption":
        return BasketOption(
            s=jnp.asarray(self.s, dtype),
            v=jnp.asarray(self.v, dtype),
            w=jnp.asarray(self.w, dtype),
            corr=jnp.asarray(self.corr, dtype),
            d=jnp.asarray(self.d, dtype),
            k=jnp.asarray(self.k, dtype),
            r=jnp.asarray(self.r, dtype),
            t=jnp.asarray(self.t, dtype),
        )

    def validate(self) -> None:
        """Eager sanity checks (no-op under tracing)."""
        a = self.n_assets
        for name, x in (("s", self.s), ("v", self.v), ("w", self.w),
                        ("d", self.d)):
            if np.shape(x) != (a,):
                raise ValueError(f"{name} must have shape ({a},), "
                                 f"got {np.shape(x)}")
        if np.shape(self.corr) != (a, a):
            raise ValueError(f"corr must have shape ({a},{a})")
        if not _concrete(self.s, self.v, self.corr, self.k, self.t):
            return
        s, v, corr = (np.asarray(self.s), np.asarray(self.v),
                      np.asarray(self.corr))
        if (s <= 0).any():
            raise ValueError("spot prices must be positive")
        if (v < 0).any():
            raise ValueError("volatilities must be non-negative")
        if not np.allclose(corr, corr.T, atol=1e-6):
            raise ValueError("correlation matrix must be symmetric")
        if not np.allclose(np.diag(corr), 1.0, atol=1e-6):
            raise ValueError("correlation matrix must have unit diagonal")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")

    @staticmethod
    def equicorrelated(n_assets: int, rho: float = 0.3) -> "BasketOption":
        """A well-posed n-asset basket: equicorrelation ``rho`` (PSD for any
        size when ``-1/(n-1) <= rho <= 1``), vols alternating 0.3/0.2,
        equal weights.  Preferred for large-basket benchmarks — see the
        ``default_reference`` caveat."""
        a = n_assets
        corr = np.full((a, a), rho)
        np.fill_diagonal(corr, 1.0)
        return BasketOption(
            s=np.full((a,), 100.0),
            v=np.where(np.arange(a) % 2 == 0, 0.3, 0.2),
            w=np.full((a,), 1.0 / a),
            corr=corr,
            d=np.zeros((a,)),
            k=100.0,
            r=0.048790164,
            t=1.0,
        )

    @staticmethod
    def default_reference(n_assets: int = 3) -> "BasketOption":
        """The hard-coded basket of the reference driver (``basketOpt.cu:33-68``).

        For ``n_assets != 3`` the reference falls back to alternating vols
        0.3/0.2 and an alternating +/-0.5 off-diagonal correlation
        (``basketOpt.cu:147-177``); replicated here.

        Caveat (faithful to the reference): for ``n_assets > 3`` that
        fallback matrix is *indefinite*; the reference's pivot-guarded
        Cholesky (``MonteCarloHost.c:91-106``) silently truncates it, so the
        factor satisfies ``L L^T != corr``.  The framework reproduces this
        behavior exactly; use :meth:`equicorrelated` for a well-posed large
        basket.
        """
        a = n_assets
        if a == 3:
            v = np.array([0.2, 0.3, 0.2])
            corr = np.array(
                [[1.0, -0.5, -0.5], [-0.5, 1.0, -0.5], [-0.5, -0.5, 1.0]]
            )
        else:
            v = np.where(np.arange(a) % 2 == 0, 0.3, 0.2)
            corr = np.empty((a, a))
            for i in range(a):
                for j in range(i, a):
                    rho = 1.0 if i == j else (0.5 if j % 2 == 0 else -0.5)
                    corr[i, j] = corr[j, i] = rho
        return BasketOption(
            s=np.full((a,), 100.0),
            v=v,
            w=np.full((a,), 1.0 / a),
            corr=corr,
            d=np.zeros((a,)),
            k=100.0,
            r=0.048790164,
            t=1.0,
        )


@_register_pytree
@dataclasses.dataclass(frozen=True)
class RainbowOption:
    """European call on the MAX or MIN of correlated GBM underlyings.

    Two-asset prices have the exact Stulz (1982) closed form
    (:func:`mctpu.math.rainbow_max_call` / ``rainbow_min_call``); any size
    satisfies the ``k = 0`` martingale identity
    ``price_max + price_min = sum of forwards`` for M = 2.
    """

    s: Any  # (M,) spots
    v: Any  # (M,) vols
    corr: Any  # (M, M)
    k: Any
    r: Any
    t: Any
    kind: str = _static(default="max")

    @property
    def n_assets(self) -> int:
        return int(np.shape(self.s)[0])

    def astype(self, dtype) -> "RainbowOption":
        return RainbowOption(
            s=jnp.asarray(self.s, dtype), v=jnp.asarray(self.v, dtype),
            corr=jnp.asarray(self.corr, dtype), k=jnp.asarray(self.k, dtype),
            r=jnp.asarray(self.r, dtype), t=jnp.asarray(self.t, dtype),
            kind=self.kind)

    def validate(self) -> None:
        if self.kind not in ("max", "min"):
            raise ValueError("kind must be 'max' or 'min'")
        m = self.n_assets
        if np.shape(self.v) != (m,):
            raise ValueError(f"v must have shape ({m},)")
        if np.shape(self.corr) != (m, m):
            raise ValueError(f"corr must have shape ({m},{m})")
        if not _concrete(self.s, self.v, self.k, self.t):
            return
        if (np.asarray(self.s) <= 0).any():
            raise ValueError("spots must be positive")
        if float(self.k) < 0:
            raise ValueError("strike must be non-negative")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class LookbackOption:
    """Discretely-monitored lookback option on the running extreme.

    ``floating``: call pays ``S_T - min_j S_j`` (put: ``max_j S_j - S_T``) —
    never out of the money.  ``fixed``: call pays ``max(max_j S_j - k, 0)``
    (put: ``max(k - min_j S_j, 0)``).  The continuous-monitoring
    Goldman-Sosin-Gatto value (:func:`mctpu.math.lookback_floating_call`)
    upper-bounds the discrete floating call.
    """

    s: Any
    r: Any
    v: Any
    t: Any
    k: Any = 0.0  # strike (fixed kind only)
    n_obs: int = _static(default=50)
    kind: str = _static(default="floating")
    payoff: str = _static(default="call")

    def astype(self, dtype) -> "LookbackOption":
        return LookbackOption(
            s=jnp.asarray(self.s, dtype), r=jnp.asarray(self.r, dtype),
            v=jnp.asarray(self.v, dtype), t=jnp.asarray(self.t, dtype),
            k=jnp.asarray(self.k, dtype), n_obs=self.n_obs, kind=self.kind,
            payoff=self.payoff)

    def validate(self) -> None:
        if self.kind not in ("floating", "fixed"):
            raise ValueError("kind must be 'floating' or 'fixed'")
        if self.payoff not in ("call", "put"):
            raise ValueError("payoff must be 'call' or 'put'")
        if self.n_obs < 1:
            raise ValueError("n_obs must be >= 1")
        if not _concrete(self.s, self.v, self.t, self.k):
            return
        if float(self.s) <= 0:
            raise ValueError("spot must be positive")
        if self.kind == "fixed" and float(self.k) <= 0:
            raise ValueError("fixed-strike lookback needs a positive strike")
        if float(self.v) < 0:
            raise ValueError("volatility must be non-negative")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class CvaSpec:
    """Credit valuation adjustment of a European call.

    Mirrors ``CVA`` (``MonteCarlo.h:58-66``): constant default intensity
    ``intensity`` (reference ``defInt``), loss-given-default ``lgd``, the
    underlying ``option`` and the number of exposure-grid steps ``n_grid``
    (reference ``n``).  ``n_grid`` is static (it sets loop bounds / shapes).
    """

    intensity: Any  # hazard rate lambda
    lgd: Any  # loss given default (1 - recovery)
    option: VanillaOption
    n_grid: int = _static(default=50)

    def astype(self, dtype) -> "CvaSpec":
        return CvaSpec(
            intensity=jnp.asarray(self.intensity, dtype),
            lgd=jnp.asarray(self.lgd, dtype),
            option=self.option.astype(dtype),
            n_grid=self.n_grid,
        )

    def validate(self) -> None:
        """Eager sanity checks (no-op under tracing)."""
        if self.n_grid < 1:
            raise ValueError("n_grid must be >= 1")
        if getattr(self.option, "kind", "call") != "call":
            raise ValueError("CVA exposure model prices call options")
        self.option.validate()
        if not _concrete(self.intensity, self.lgd):
            return
        if float(self.intensity) < 0:
            raise ValueError("default intensity must be non-negative")
        if not 0.0 <= float(self.lgd) <= 1.0:
            raise ValueError("lgd must lie in [0, 1]")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class AsianOption:
    """Discretely-monitored average-price (Asian) call — a path-dependent
    product family beyond the reference's scope.

    The average runs over ``n_obs`` equally spaced observations
    ``t_i = i T / n_obs`` (i = 1..n_obs).  ``average`` picks arithmetic
    (no closed form; MC territory) or geometric (exact discrete closed form,
    :func:`mctpu.math.geometric_asian_call` — the oracle, and the classic
    control variate for the arithmetic case).
    """

    s: Any
    k: Any
    r: Any
    v: Any
    t: Any
    n_obs: int = _static(default=50)
    average: str = _static(default="arithmetic")  # arithmetic | geometric

    def astype(self, dtype) -> "AsianOption":
        return AsianOption(
            s=jnp.asarray(self.s, dtype), k=jnp.asarray(self.k, dtype),
            r=jnp.asarray(self.r, dtype), v=jnp.asarray(self.v, dtype),
            t=jnp.asarray(self.t, dtype), n_obs=self.n_obs,
            average=self.average)

    def validate(self) -> None:
        if self.average not in ("arithmetic", "geometric"):
            raise ValueError("average must be 'arithmetic' or 'geometric'")
        if self.n_obs < 1:
            raise ValueError("n_obs must be >= 1")
        if not _concrete(self.s, self.k, self.v, self.t):
            return
        if not (float(self.s) > 0 and float(self.k) > 0):
            raise ValueError("spot and strike must be positive")
        if float(self.v) < 0:
            raise ValueError("volatility must be non-negative")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class CliquetOption:
    """Locally capped/floored cliquet (ratchet) on GBM period returns.

    Pays ``sum_j clip(S_{t_j}/S_{t_{j-1}} - 1, floor, cap)`` at maturity
    over ``n_periods`` equal periods — the flagship structured-product
    family.  Period returns are i.i.d. under GBM, so the value telescopes
    to an EXACT closed form (:func:`mctpu.math.cliquet_closed_form`), the
    oracle for the MC kernel at any period count.  Spot delta is
    identically zero (returns are s0-free, like the variance swap).
    """

    s: Any
    r: Any
    v: Any
    t: Any
    n_periods: int = _static(default=12)
    cap: Any = 0.08
    floor: Any = 0.0

    def astype(self, dtype) -> "CliquetOption":
        return CliquetOption(
            s=jnp.asarray(self.s, dtype), r=jnp.asarray(self.r, dtype),
            v=jnp.asarray(self.v, dtype), t=jnp.asarray(self.t, dtype),
            n_periods=self.n_periods,
            cap=jnp.asarray(self.cap, dtype),
            floor=jnp.asarray(self.floor, dtype))

    def validate(self) -> None:
        if self.n_periods < 1:
            raise ValueError("n_periods must be >= 1")
        if not _concrete(self.s, self.v, self.t, self.cap, self.floor):
            return
        if float(self.s) <= 0:
            raise ValueError("spot must be positive")
        if float(self.v) < 0:
            raise ValueError("volatility must be non-negative")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")
        if float(self.cap) <= float(self.floor):
            raise ValueError("cap must exceed floor")
        if float(self.floor) < -1.0:
            raise ValueError("floor below -100% is meaningless")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class HestonOption:
    """European call under Heston stochastic volatility.

    ``v0`` initial variance, ``kappa`` mean-reversion speed, ``theta``
    long-run variance, ``xi`` vol-of-vol, ``rho`` spot-variance correlation.
    A second dynamics family beyond the reference's Black-Scholes GBM; the
    characteristic-function pricer (:func:`mctpu.models.heston.cf_call_price`)
    is the oracle.
    """

    s: Any
    k: Any
    r: Any
    t: Any
    v0: Any
    kappa: Any
    theta: Any
    xi: Any
    rho: Any

    def astype(self, dtype) -> "HestonOption":
        return HestonOption(*(jnp.asarray(x, dtype) for x in (
            self.s, self.k, self.r, self.t, self.v0, self.kappa,
            self.theta, self.xi, self.rho)))

    def validate(self) -> None:
        if not _concrete(self.s, self.k, self.t, self.v0, self.kappa,
                         self.theta, self.xi, self.rho):
            return
        if not (float(self.s) > 0 and float(self.k) > 0):
            raise ValueError("spot and strike must be positive")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")
        if float(self.v0) < 0 or float(self.theta) < 0:
            raise ValueError("variances must be non-negative")
        if float(self.kappa) < 0 or float(self.xi) < 0:
            raise ValueError("kappa and xi must be non-negative")
        if not -1.0 <= float(self.rho) <= 1.0:
            raise ValueError("rho must lie in [-1, 1]")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class AmericanOption:
    """American-exercise option priced by Longstaff-Schwartz regression MC.

    ``n_steps`` exercise dates on a uniform grid; ``payoff`` is ``"put"``
    (the canonical early-exercise case) or ``"call"`` (without dividends its
    value equals the European call — a sharp test identity).  New product
    family beyond the reference.
    """

    s: Any
    k: Any
    r: Any
    v: Any
    t: Any
    n_steps: int = _static(default=50)
    payoff: str = _static(default="put")

    def astype(self, dtype) -> "AmericanOption":
        return AmericanOption(
            s=jnp.asarray(self.s, dtype), k=jnp.asarray(self.k, dtype),
            r=jnp.asarray(self.r, dtype), v=jnp.asarray(self.v, dtype),
            t=jnp.asarray(self.t, dtype), n_steps=self.n_steps,
            payoff=self.payoff)

    def validate(self) -> None:
        if self.payoff not in ("put", "call"):
            raise ValueError("payoff must be 'put' or 'call'")
        if self.n_steps < 1:
            raise ValueError("n_steps must be >= 1")
        if not _concrete(self.s, self.k, self.v, self.t):
            return
        if not (float(self.s) > 0 and float(self.k) > 0):
            raise ValueError("spot and strike must be positive")
        if float(self.v) < 0:
            raise ValueError("volatility must be non-negative")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class BarrierOption:
    """Discretely-monitored knock-out barrier call.

    ``kind`` is ``"up-and-out"`` (knocked out when the spot touches or
    exceeds ``barrier`` at any of the ``n_obs`` observation dates) or
    ``"down-and-out"`` (knocked out at or below).  New product family beyond
    the reference; the continuous closed form + the Broadie-Glasserman-Kou
    correction (:mod:`mctpu.math`) anchor the up-and-out tests.
    """

    s: Any
    k: Any
    r: Any
    v: Any
    t: Any
    barrier: Any
    n_obs: int = _static(default=50)
    kind: str = _static(default="up-and-out")

    def astype(self, dtype) -> "BarrierOption":
        return BarrierOption(
            s=jnp.asarray(self.s, dtype), k=jnp.asarray(self.k, dtype),
            r=jnp.asarray(self.r, dtype), v=jnp.asarray(self.v, dtype),
            t=jnp.asarray(self.t, dtype),
            barrier=jnp.asarray(self.barrier, dtype),
            n_obs=self.n_obs, kind=self.kind)

    def validate(self) -> None:
        if self.kind not in ("up-and-out", "down-and-out"):
            raise ValueError("kind must be 'up-and-out' or 'down-and-out'")
        if self.n_obs < 1:
            raise ValueError("n_obs must be >= 1")
        if not _concrete(self.s, self.k, self.v, self.t, self.barrier):
            return
        if not (float(self.s) > 0 and float(self.k) > 0):
            raise ValueError("spot and strike must be positive")
        if float(self.barrier) <= 0:
            raise ValueError("barrier must be positive")
        if self.kind == "up-and-out" and float(self.s) >= float(self.barrier):
            raise ValueError("up-and-out option is already knocked out "
                             "(spot >= barrier)")
        if self.kind == "down-and-out" and float(self.s) <= float(self.barrier):
            raise ValueError("down-and-out option is already knocked out "
                             "(spot <= barrier)")
        if float(self.v) < 0:
            raise ValueError("volatility must be non-negative")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class BasketAsianOption:
    """Discretely-monitored arithmetic-average call on a correlated basket.

    Beyond the reference (single-asset products only): the average of the
    *basket value* over ``n_obs`` equally-spaced observation dates, i.e.
    ``max(mean_j sum_a w_a S_a(t_j) - k, 0)``.
    """

    basket: BasketOption
    n_obs: int = _static(default=12)

    def astype(self, dtype) -> "BasketAsianOption":
        return BasketAsianOption(self.basket.astype(dtype), self.n_obs)

    def validate(self) -> None:
        if self.n_obs < 1:
            raise ValueError("n_obs must be >= 1")
        self.basket.validate()


@_register_pytree
@dataclasses.dataclass(frozen=True)
class BasketBarrierOption:
    """Discretely-monitored knock-out call on a correlated basket value.

    ``kind``: ``up-and-out`` (knocked out when the basket value touches or
    crosses ``barrier`` from below at an observation date) or
    ``down-and-out``.
    """

    basket: BasketOption
    barrier: Any = 130.0
    n_obs: int = _static(default=50)
    kind: str = _static(default="up-and-out")

    def astype(self, dtype) -> "BasketBarrierOption":
        return BasketBarrierOption(self.basket.astype(dtype),
                                   jnp.asarray(self.barrier, dtype),
                                   self.n_obs, self.kind)

    def validate(self) -> None:
        if self.kind not in ("up-and-out", "down-and-out"):
            raise ValueError("kind must be 'up-and-out' or 'down-and-out'")
        if self.n_obs < 1:
            raise ValueError("n_obs must be >= 1")
        self.basket.validate()
        if not _concrete(self.barrier, self.basket.s, self.basket.w):
            return
        if float(self.barrier) <= 0:
            raise ValueError("barrier must be positive")
        b0 = float(np.asarray(self.basket.w) @ np.asarray(self.basket.s))
        if self.kind == "up-and-out" and b0 >= float(self.barrier):
            raise ValueError("up-and-out basket already knocked out")
        if self.kind == "down-and-out" and b0 <= float(self.barrier):
            raise ValueError("down-and-out basket already knocked out")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class CvaPortfolioSpec:
    """CVA of a netted portfolio of European calls on one underlying.

    Generalizes :class:`CvaSpec` to the thesis scope ("CVA of a call
    portfolio"; the reference's ``CVA.ns`` field, ``MonteCarlo.h:62``, is
    declared for this but never used beyond 1).  Exposure at node ``j`` is
    the *netted* positive part of the portfolio value:

        ee_j = max(sum_m w_m * BS(S_j, k_m, T - t_j), 0)

    so short positions (negative weights) offset long ones.  With all-long
    weights this reduces to the weighted sum and admits an exact closed form
    (:func:`mctpu.math.cva_portfolio_closed_form`).

    ``s, r, v, t`` describe the single underlying; ``strikes``/``weights``
    are ``(M,)`` vectors.

    Wrong-way risk (beyond the reference, which keeps default and exposure
    independent): ``wwr_b != 0`` makes the hazard rate a function of the
    path a la Hull & White (2012), ``h_j = intensity * exp(wwr_b * z_j -
    wwr_b^2 / 2)`` with ``z_j`` the standardized log-return at node ``j``
    (so ``E[h_j] = intensity`` marginally).  ``wwr_b > 0`` means default is
    more likely when the underlying (and hence a call portfolio's exposure)
    is high — wrong-way risk raising the CVA; ``wwr_b < 0`` is right-way.
    """

    intensity: Any
    lgd: Any
    s: Any
    r: Any
    v: Any
    t: Any
    strikes: Any  # (M,)
    weights: Any  # (M,)
    wwr_b: Any = 0.0  # wrong-way-risk loading (see class docstring)
    n_grid: int = _static(default=50)

    @property
    def n_options(self) -> int:
        return int(np.shape(self.strikes)[0])

    def astype(self, dtype) -> "CvaPortfolioSpec":
        return CvaPortfolioSpec(
            intensity=jnp.asarray(self.intensity, dtype),
            lgd=jnp.asarray(self.lgd, dtype),
            s=jnp.asarray(self.s, dtype),
            r=jnp.asarray(self.r, dtype),
            v=jnp.asarray(self.v, dtype),
            t=jnp.asarray(self.t, dtype),
            strikes=jnp.asarray(self.strikes, dtype),
            weights=jnp.asarray(self.weights, dtype),
            wwr_b=jnp.asarray(self.wwr_b, dtype),
            n_grid=self.n_grid,
        )

    def validate(self) -> None:
        if self.n_grid < 1:
            raise ValueError("n_grid must be >= 1")
        m = self.n_options
        if np.shape(self.weights) != (m,):
            raise ValueError(f"weights must have shape ({m},)")
        if not _concrete(self.intensity, self.lgd, self.s, self.v, self.t,
                         self.strikes):
            return
        if float(self.s) <= 0:
            raise ValueError("spot must be positive")
        if (np.asarray(self.strikes) <= 0).any():
            raise ValueError("strikes must be positive")
        if float(self.v) < 0:
            raise ValueError("volatility must be non-negative")
        if float(self.t) <= 0:
            raise ValueError("time to maturity must be positive")
        if float(self.intensity) < 0:
            raise ValueError("default intensity must be non-negative")
        if not 0.0 <= float(self.lgd) <= 1.0:
            raise ValueError("lgd must lie in [0, 1]")

    @staticmethod
    def from_single(spec: "CvaSpec", wwr_b=0.0) -> "CvaPortfolioSpec":
        o = spec.option
        return CvaPortfolioSpec(
            intensity=spec.intensity, lgd=spec.lgd,
            s=o.s, r=o.r, v=o.v, t=o.t,
            strikes=np.reshape(np.asarray(o.k, np.float64), (1,)),
            weights=np.ones((1,)),
            wwr_b=wwr_b,
            n_grid=spec.n_grid,
        )


@_register_pytree
@dataclasses.dataclass(frozen=True)
class CvaMultiSpec:
    """CVA of a netting set of calls on M *correlated underlyings*.

    The production generalization of :class:`CvaPortfolioSpec` (which nets
    options on one underlying): option ``m`` is a call struck at
    ``strikes[m]`` on underlying ``m``; the underlyings follow correlated
    GBMs (``corr``), and the exposure at each grid node is the netted
    positive part ``max(sum_m weights[m] * BS(S_m, strikes[m], T - t_j), 0)``
    — short positions offset long ones across underlyings.

    All-long weights admit an exact closed form
    (:func:`mctpu.math.cva_multi_closed_form`, per-underlying martingale).
    """

    intensity: Any
    lgd: Any
    s: Any  # (M,) spots
    v: Any  # (M,) vols
    corr: Any  # (M, M)
    r: Any
    t: Any
    strikes: Any  # (M,)
    weights: Any  # (M,)
    n_grid: int = _static(default=50)

    @property
    def n_underlyings(self) -> int:
        # Robust under tracing: a plain-list ``s`` flattens into per-element
        # tracer leaves, and np.shape on a list of tracers tries __array__.
        s = self.s
        if hasattr(s, "shape"):
            return int(s.shape[0])
        return len(s)

    def astype(self, dtype) -> "CvaMultiSpec":
        return CvaMultiSpec(
            intensity=jnp.asarray(self.intensity, dtype),
            lgd=jnp.asarray(self.lgd, dtype),
            s=jnp.asarray(self.s, dtype),
            v=jnp.asarray(self.v, dtype),
            corr=jnp.asarray(self.corr, dtype),
            r=jnp.asarray(self.r, dtype),
            t=jnp.asarray(self.t, dtype),
            strikes=jnp.asarray(self.strikes, dtype),
            weights=jnp.asarray(self.weights, dtype),
            n_grid=self.n_grid,
        )

    def validate(self) -> None:
        m = self.n_underlyings
        for name, x in (("v", self.v), ("strikes", self.strikes),
                        ("weights", self.weights)):
            if np.shape(x) != (m,):
                raise ValueError(f"{name} must have shape ({m},)")
        if np.shape(self.corr) != (m, m):
            raise ValueError(f"corr must have shape ({m},{m})")
        if self.n_grid < 1:
            raise ValueError("n_grid must be >= 1")
        if not _concrete(self.intensity, self.lgd, self.s, self.v, self.t,
                         self.strikes):
            return
        if (np.asarray(self.s) <= 0).any():
            raise ValueError("spots must be positive")
        if (np.asarray(self.strikes) <= 0).any():
            raise ValueError("strikes must be positive")
        if float(self.intensity) < 0:
            raise ValueError("default intensity must be non-negative")
        if not 0.0 <= float(self.lgd) <= 1.0:
            raise ValueError("lgd must lie in [0, 1]")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class XvaSpec:
    """Bilateral xVA spec: a netting set plus the bank's own credit and
    funding data.

    Wraps a :class:`CvaMultiSpec` (the netting set and the counterparty
    hazard ``netting.intensity`` / ``netting.lgd``) with the bank-side
    fields a bilateral valuation adjustment needs: ``own_intensity`` /
    ``own_lgd`` drive the DVA leg on the NEGATIVE exposure side, and
    ``funding_spread`` (continuously-accrued, per year) drives the
    FCA/FBA funding legs.  Beyond the reference (unilateral CVA only,
    ``cvaOpt.cu``); at ``own_intensity = 0`` and ``funding_spread = 0``
    the CVA leg reproduces :func:`mctpu.engine.price_cva_multi` on the
    same streams.
    """

    netting: CvaMultiSpec
    own_intensity: Any = 0.0
    own_lgd: Any = 0.6
    funding_spread: Any = 0.0

    def validate(self) -> None:
        self.netting.validate()
        if not _concrete(self.own_intensity, self.own_lgd,
                         self.funding_spread):
            return
        if float(self.own_intensity) < 0:
            raise ValueError("own default intensity must be non-negative")
        if not 0.0 <= float(self.own_lgd) <= 1.0:
            raise ValueError("own_lgd must lie in [0, 1]")
        if float(self.funding_spread) < 0:
            raise ValueError("funding_spread must be non-negative")


@_register_pytree
@dataclasses.dataclass(frozen=True)
class McResult:
    """Monte Carlo estimate: price plus 95% confidence half-width.

    Mirrors ``OptionValue {Expected, Confidence}`` (``MonteCarlo.h:53-56``)
    with the estimator inputs kept for composition: raw ``sum_p``/``sum_p2``
    accumulators and the effective number of i.i.d. samples ``n`` (pairs, when
    antithetic variates are on).

    Units convention (package-wide): ``price``, ``std_error`` and ``ci`` are
    all in *discounted* (present-value) units, so CIs are directly comparable
    across the MC engine, QMC/Sobol, control variates and the oracles.  (The
    reference prints an undiscounted CI next to a discounted price,
    ``MonteCarloKernel.cu:421-423`` — a units mismatch we fix, not mirror.)
    ``sum_p``/``sum_p2`` remain raw undiscounted accumulator sums.
    """

    price: Any
    ci: Any  # 1.96 * discount * sigma_hat / sqrt(n)
    std_error: Any
    sum_p: Any
    sum_p2: Any
    n: int = _static(default=0)  # effective i.i.d. sample count
    n_paths: int = _static(default=0)  # GBM paths actually simulated

    def __repr__(self):  # compact human-readable form
        try:  # scalar result (the common case)
            body = f"price={float(self.price):.6f}, ci=±{float(self.ci):.6f}"
        except TypeError:  # vector result (e.g. a strike ladder): show pairs
            import numpy as _np

            pairs = ", ".join(
                f"{p:.4f}±{c:.4f}"
                for p, c in zip(
                    _np.asarray(self.price).ravel(), _np.asarray(self.ci).ravel()
                )
            )
            body = f"prices=[{pairs}]"
        return f"McResult({body}, n={self.n}, n_paths={self.n_paths})"

    def to_dict(self) -> dict:
        """Plain-Python record (JSON-ready) for logging/automation."""
        return {
            "price": float(self.price),
            "ci": float(self.ci),
            "std_error": float(self.std_error),
            "n": int(self.n),
            "n_paths": int(self.n_paths),
        }


@_register_pytree
@dataclasses.dataclass(frozen=True)
class CvaResult:
    """CVA estimate plus the expected-exposure profile over the time grid.

    ``cva``/``ci`` follow the reference estimator (mean of per-path default
    legs, *not* discounted: ``MonteCarloKernel.cu:467``).  ``expected_exposure``
    is ``E[ee_j]`` per grid node ``j=1..n_grid`` (the reference prints only the
    scalar; the profile is a first-class output here).
    """

    cva: Any
    ci: Any
    std_error: Any
    expected_exposure: Any  # (n_grid,) E[BS(S_tj, T - tj)] per node
    # (n_grid,) deterministic default-probability masses dp_j at wwr_b = 0.
    # Under wrong-way risk (wwr_b != 0) the CVA is computed with a
    # path-dependent stochastic hazard, so no deterministic profile can
    # satisfy cva == lgd * sum(default_leg * expected_exposure) — the whole
    # point of WWR is E[dp_j * ee_j] != E[dp_j] E[ee_j].  The field then
    # still reports the wwr_b = 0 baseline masses for comparison.
    default_leg: Any
    n: int = _static(default=0)
    n_paths: int = _static(default=0)

    def __repr__(self):
        return (
            f"CvaResult(cva={float(self.cva):.6f}, ci=±{float(self.ci):.6f}, "
            f"n={self.n}, n_paths={self.n_paths})"
        )

    def to_dict(self) -> dict:
        """Plain-Python record (JSON-ready) for logging/automation."""
        import numpy as _np
        return {
            "cva": float(self.cva),
            "ci": float(self.ci),
            "std_error": float(self.std_error),
            "expected_exposure": _np.asarray(self.expected_exposure).tolist(),
            "default_leg": _np.asarray(self.default_leg).tolist(),
            "n": int(self.n),
            "n_paths": int(self.n_paths),
        }


@_register_pytree
@dataclasses.dataclass(frozen=True)
class XvaResult:
    """Bilateral xVA legs, each a full :class:`McResult`, plus both
    exposure profiles.

    ``cva``/``dva``/``fca``/``fba`` are the four per-path legs estimated
    from ONE fused sweep (shared paths, so leg differences like BCVA carry
    common-random-number noise only); ``epe_profile``/``ene_profile`` are
    ``E[max(±V_j, 0)]`` per grid node.  All legs follow the CVA estimator's
    undiscounted-mean semantics (``MonteCarloKernel.cu:467``).
    """

    cva: McResult
    dva: McResult
    fca: McResult
    fba: McResult
    epe_profile: Any  # (n_grid,) E[max(V_j, 0)] per node
    ene_profile: Any  # (n_grid,) E[max(-V_j, 0)] per node

    @property
    def bcva(self):
        """Bilateral CVA = CVA - DVA (first-to-default weighted legs)."""
        return self.cva.price - self.dva.price

    @property
    def fva(self):
        """Funding value adjustment = FCA - FBA."""
        return self.fca.price - self.fba.price

    def __repr__(self):
        return (
            f"XvaResult(cva={float(self.cva.price):.6f}±{float(self.cva.ci):.6f}, "
            f"dva={float(self.dva.price):.6f}±{float(self.dva.ci):.6f}, "
            f"fca={float(self.fca.price):.6f}±{float(self.fca.ci):.6f}, "
            f"fba={float(self.fba.price):.6f}±{float(self.fba.ci):.6f}, "
            f"bcva={float(self.bcva):.6f}, fva={float(self.fva):.6f})"
        )

    def to_dict(self) -> dict:
        """Plain-Python record (JSON-ready) for logging/automation."""
        import numpy as _np
        d = {leg: getattr(self, leg).to_dict()
             for leg in ("cva", "dva", "fca", "fba")}
        d["bcva"] = float(self.bcva)
        d["fva"] = float(self.fva)
        d["epe_profile"] = _np.asarray(self.epe_profile).tolist()
        d["ene_profile"] = _np.asarray(self.ene_profile).tolist()
        return d


@_register_pytree
@dataclasses.dataclass(frozen=True)
class XvaGreeksResult:
    """Bilateral xVA legs plus their hedge-facing sensitivities, each a
    full :class:`McResult`.

    One fused sweep (``kernels/cva_multi.py``, xVA Greeks section)
    produces the four leg values, the per-leg credit/funding ratios
    (``credit_cpty`` = dCVA/dlambda_cpty — the counterparty CDS hedge,
    ``credit_own`` = dDVA/dlambda_own, ``funding`` = dFVA/dspread with
    FVA = FCA - FBA) and per-underlying ``delta``/``vega`` vectors of the
    TOTAL adjustment XVA = CVA - DVA + FCA - FBA.  The credit ratios are
    per-leg derivatives with respect to each leg's own driver (see
    :func:`mctpu.math.xva_leg_weight_derivs` for what is deliberately not
    folded in).  All follow the CVA estimator's undiscounted-mean
    semantics (``MonteCarloKernel.cu:467``).
    """

    cva: McResult
    dva: McResult
    fca: McResult
    fba: McResult
    credit_cpty: McResult
    credit_own: McResult
    funding: McResult
    delta: McResult  # per-underlying vector, d(XVA)/ds0_m
    vega: McResult   # per-underlying vector, d(XVA)/dv_m

    def __repr__(self):
        def fmt(r):
            p = np.asarray(r.price)
            if p.ndim:
                ci = np.asarray(r.ci)
                return (f"{np.array2string(p, precision=4)}"
                        f"±{np.array2string(ci, precision=4)}")
            return f"{float(r.price):.6f}±{float(r.ci):.6f}"

        return (f"XvaGreeksResult(cva={fmt(self.cva)}, dva={fmt(self.dva)}, "
                f"fca={fmt(self.fca)}, fba={fmt(self.fba)}, "
                f"credit_cpty={fmt(self.credit_cpty)}, "
                f"credit_own={fmt(self.credit_own)}, "
                f"funding={fmt(self.funding)}, delta={fmt(self.delta)}, "
                f"vega={fmt(self.vega)})")

    def to_dict(self) -> dict:
        """Plain-Python record (JSON-ready) for logging/automation."""
        out = {}
        for f in dataclasses.fields(self):
            r = getattr(self, f.name)
            if np.asarray(r.price).ndim:  # per-underlying vectors
                out[f.name] = {"price": np.asarray(r.price).tolist(),
                               "ci": np.asarray(r.ci).tolist(),
                               "n": int(r.n), "n_paths": int(r.n_paths)}
            else:
                out[f.name] = r.to_dict()
        return out


@_register_pytree
@dataclasses.dataclass(frozen=True)
class GreeksResult:
    """Price plus pathwise Greeks, each a full :class:`McResult`.

    Every field carries its own honest MC confidence interval — the Greek
    integrands are accumulated in-kernel alongside the payoff (see
    :mod:`mctpu.kernels.greeks`), so each is a plain MC mean under the same
    estimator/combine contract as the price.  ``delta``/``vega`` are
    per-asset vectors for baskets; ``rho``/``theta``/``gamma`` are ``None``
    where not computed.  ``theta`` is d/d(maturity), matching
    :func:`mctpu.math.bs_greeks`; ``gamma`` (vanilla) is the mixed
    pathwise-likelihood-ratio estimator of :mod:`mctpu.kernels.greeks`.
    """

    price: McResult
    delta: McResult
    vega: McResult
    rho: Any = None
    theta: Any = None
    gamma: Any = None
    vanna: Any = None  # d2V/ds dv (vanilla engine tier)
    volga: Any = None  # d2V/dv2 (vanilla engine tier)

    def __repr__(self):
        import numpy as _np

        def fmt(r):
            if r is None:
                return "None"
            p = _np.asarray(r.price)
            if p.ndim == 0:
                return f"{float(p):.6f}±{float(r.ci):.6f}"
            return f"{_np.array2string(p, precision=4)}"

        return (f"GreeksResult(price={fmt(self.price)}, "
                f"delta={fmt(self.delta)}, vega={fmt(self.vega)}, "
                f"rho={fmt(self.rho)}, theta={fmt(self.theta)}, "
                f"gamma={fmt(self.gamma)})")


@dataclasses.dataclass(frozen=True)
class HestonGreeksResult(GreeksResult):
    """Heston Greeks: the :class:`GreeksResult` contract (``vega`` is the
    initial-variance sensitivity dV/dv0; chain through ``2 sqrt(v0)`` for
    a vol-quoted vega) extended with the remaining variance-dynamics
    parameters — ``dtheta`` (long-run variance), ``dkappa`` (mean
    reversion) and ``dxi`` (vol-of-vol, the desk's "vega of vol") — all
    forward-mode tangents riding the same fused Euler walk."""

    dtheta: Any = None
    dkappa: Any = None
    dxi: Any = None

    def __repr__(self):
        base = super().__repr__()[len("GreeksResult("):-1]

        def fmt(r):
            if r is None:
                return "None"
            import numpy as _np
            return f"{float(_np.asarray(r.price)):.6f}±{float(r.ci):.6f}"

        return (f"HestonGreeksResult({base}, dtheta={fmt(self.dtheta)}, "
                f"dkappa={fmt(self.dkappa)}, dxi={fmt(self.dxi)})")


@dataclasses.dataclass(frozen=True)
class CvaGreeksResult:
    """CVA plus its pathwise sensitivities, each a full :class:`McResult`.

    The practically dominant outputs of a CVA engine: ``credit_delta``
    is dCVA/dlambda (hazard-rate sensitivity — the CDS hedge ratio),
    ``delta`` dCVA/dS0 (spot hedge) and ``vega`` dCVA/dv.  All share the
    CVA's undiscounted-mean estimator semantics
    (``MonteCarloKernel.cu:467``) and are accumulated in-kernel
    alongside the CVA (:mod:`mctpu.kernels.cva`, Greeks section), so each
    carries its own honest CI under the engine combine contract.
    """

    cva: McResult
    credit_delta: McResult
    delta: McResult
    vega: McResult
    # Second-order sensitivities (round-4 close-out): gamma = d2CVA/dS0^2
    # (mixed pathwise-LR at the terminal node, pathwise through the smooth
    # BS exposure at inner nodes), credit_gamma = d2CVA/dlambda^2,
    # cross_gamma = d2CVA/dS0 dlambda.
    gamma: Any = None
    credit_gamma: Any = None
    cross_gamma: Any = None

    def __repr__(self):
        def fmt(r):
            if r is None:
                return "None"
            p = np.asarray(r.price)
            if p.ndim:  # per-underlying vectors (greeks_cva_multi)
                ci = np.asarray(r.ci)
                return (f"{np.array2string(p, precision=4)}"
                        f"±{np.array2string(ci, precision=4)}")
            return f"{float(r.price):.6f}±{float(r.ci):.6f}"

        return (f"CvaGreeksResult(cva={fmt(self.cva)}, "
                f"credit_delta={fmt(self.credit_delta)}, "
                f"delta={fmt(self.delta)}, vega={fmt(self.vega)}, "
                f"gamma={fmt(self.gamma)}, "
                f"credit_gamma={fmt(self.credit_gamma)}, "
                f"cross_gamma={fmt(self.cross_gamma)})")
