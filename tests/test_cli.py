"""CLI driver tests: the three experiment binaries run end-to-end on CPU."""
import json

import pytest

from mctpu.cli import basket as cli_basket
from mctpu.cli import cva as cli_cva
from mctpu.cli import vanilla as cli_vanilla

FAST = ["--paths", "65536", "--blocks", "8", "--rows", "8",
        "--backend", "xla"]


def test_vanilla_cli(capsys):
    rc = cli_vanilla.main(FAST)
    out = capsys.readouterr().out
    assert rc == 0
    assert "Black & Scholes call price: 10.386" in out
    assert "within 3 sigma: True" in out
    assert "speedup" in out


def test_vanilla_cli_custom_option(capsys):
    rc = cli_vanilla.main(FAST + ["--spot", "110", "--strike", "95",
                                  "--skip-cpu"])
    assert rc == 0
    assert "price=" in capsys.readouterr().out


@pytest.mark.slow
def test_basket_cli(capsys):
    rc = cli_basket.main(FAST)
    out = capsys.readouterr().out
    assert rc == 0
    assert "combined sigma" in out


def test_basket_cli_ten_assets(capsys):
    rc = cli_basket.main(FAST + ["--assets", "10", "--skip-cpu"])
    assert rc == 0


@pytest.mark.slow
def test_cva_cli(capsys):
    rc = cli_cva.main(FAST + ["--grids", "10", "25", "--profile"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "closed_form=0.19" in out
    assert "E[exposure] profile" in out


@pytest.mark.slow
def test_sweep_quick_runs_on_cpu(capsys):
    import benchmarks.sweep as sweep
    rc = sweep.main(["--quick", "--configs", "1", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    recs = [json.loads(line) for line in out.strip().splitlines()]
    by_name = {r["config"]: r for r in recs}
    assert by_name["vanilla_1M_f64_vs_closed_form"]["within_3sigma"]
    assert by_name["cva_grid50_default_leg"]["within_3sigma"]


def test_greeks_cli(capsys):
    from mctpu.cli import greeks as cli_greeks
    rc = cli_greeks.main(["--paths", "262144"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "delta" in out and "gamma" in out
    assert "closed form" in out


def test_cva_cli_portfolio(capsys):
    rc = cli_cva.main(FAST + ["--grids", "10", "--strikes", "90", "110",
                              "--weights", "1.0", "-1.0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "portfolio" in out

def test_cva_cli_portfolio_long_only(capsys):
    rc = cli_cva.main(FAST + ["--grids", "10",
                              "--strikes", "90", "100", "110"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "closed_form=" in out


def test_exotic_cli_asian(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "asian", "--obs", "12"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "geometric closed form" in out and "geometric-CV" in out


def test_exotic_cli_barrier(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "barrier", "--obs", "25"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "BGK-corrected" in out


def test_exotic_cli_american(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "american", "--obs", "25"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "binomial lattice" in out


def test_vanilla_cli_put(capsys):
    rc = cli_vanilla.main(FAST + ["--put"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "put price: 5.6" in out
    assert "within 3 sigma: True" in out


def test_vanilla_cli_qmc_samplers(capsys):
    for sampler in ("lattice", "sobol"):
        rc = cli_vanilla.main(FAST + ["--sampler", sampler, "--skip-cpu"])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert f"[{sampler:>10}]" in out


@pytest.mark.slow
def test_exotic_cli_heston(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "heston", "--obs", "25"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "characteristic-function price" in out


def test_exotic_cli_varswap(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "varswap", "--obs", "10"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "exact discrete fair strike" in out


def test_exotic_cli_ladder(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "ladder"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "strike ladder" in out and out.count("K=") == 9


@pytest.mark.slow
def test_greeks_cli_book(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "book", "--paths", "16384"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "book risk run" in out and "BS delta" in out
    assert out.count("K=") == 8


@pytest.mark.slow
def test_exotic_cli_book(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "book"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "vanilla book" in out and out.count("K=") == 8
    assert "put" in out and "call" in out


@pytest.mark.slow
def test_exotic_cli_rqmc(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "rqmc", "--obs", "8",
                             "--replicates", "4",
                             "--average", "geometric"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "rqmc vanilla" in out and "rqmc asian" in out
    assert "geometric closed form" in out


@pytest.mark.slow
def test_exotic_cli_mlmc(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "mlmc", "--eps", "0.05"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "characteristic-function price" in out and "level" in out


@pytest.mark.slow
def test_exotic_cli_cva_multi(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "cva-multi", "--obs", "5",
                             "--assets", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "closed form (all-long)" in out


def test_exotic_cli_importance_sampling(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "is"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "IS tightens" in out


def test_greeks_cli_cva(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "cva", "--paths", "16384", "--obs", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "credit_delta" in out and "closed-form FD" in out


@pytest.mark.slow
def test_greeks_cli_basket(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "basket", "--paths", "16384",
                    "--assets", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "per-asset" in out and "delta" in out and "vega" in out


def test_greeks_cli_lookback(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "lookback", "--paths", "16384",
                    "--obs", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "lookback" in out and "delta" in out


def test_greeks_cli_barrier(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "barrier", "--paths", "16384",
                    "--obs", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "likelihood-ratio" in out and "BGK closed-form FD" in out


def test_greeks_cli_heston_engine(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "heston", "--engine", "--paths", "16384",
                    "--obs", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "engine-tier pathwise tangents" in out and "char-fn FD" in out


@pytest.mark.slow
def test_greeks_cli_rainbow(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "rainbow", "--paths", "16384",
                    "--assets", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "rainbow" in out and "Stulz grad" in out and "theta" in out


def test_greeks_cli_varswap(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "varswap", "--paths", "16384",
                    "--obs", "8"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "variance-swap" in out and "vega" in out and "exact" in out


@pytest.mark.slow
def test_greeks_cli_ladder(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "ladder", "--paths", "16384"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "strike-ladder risk sweep" in out and "BS gamma" in out


@pytest.mark.slow
def test_greeks_cli_cva_multi(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "cva-multi", "--paths", "8192",
                    "--assets", "2", "--obs", "6"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "netting-set CVA Greeks" in out and "credit_delta" in out


@pytest.mark.slow
def test_greeks_cli_basket_asian(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "basket-asian", "--paths", "8192",
                    "--assets", "3", "--obs", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "basket-asian call" in out and "rho" in out


@pytest.mark.slow
def test_greeks_cli_basket_barrier(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "basket-barrier", "--paths", "8192",
                    "--assets", "3", "--obs", "4", "--barrier", "150"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "likelihood-ratio" in out and "up-and-out basket" in out


def test_greeks_cli_rqmc(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--rqmc", "--paths", "16384"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Sobol-RQMC Greek surface" in out and "volga" in out


@pytest.mark.slow
def test_exotic_cli_mlmc_barrier(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(["--product", "mlmc-barrier", "--eps", "0.2",
                      "--barrier", "130"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "mlmc barrier" in out and "continuous closed form" in out


def test_exotic_cli_cliquet(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(["--product", "cliquet", "--obs", "6", "--mult", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "cliquet" in out and "exact closed form" in out


def test_greeks_cli_cliquet(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "cliquet", "--paths", "16384",
                    "--obs", "6"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "cliquet" in out and "theta" in out


def test_exotic_cli_xva(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "xva", "--obs", "5",
                             "--assets", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "closed form CVA (all-long)" in out
    assert "bcva" in out and "fva" in out


def test_greeks_cli_xva(capsys):
    from mctpu.cli import greeks as gcli
    rc = gcli.main(["--product", "xva", "--paths", "16384", "--obs", "5",
                    "--assets", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "credit_cpty" in out and "funding" in out


def test_exotic_cli_cv(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(["--paths", "16384", "--blocks", "8", "--rows", "8",
                      "--backend", "xla", "--product", "cv", "--obs", "4",
                      "--assets", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "CV tightens" in out and "basket-value CV" in out


def test_exotic_cli_american_heston(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(FAST + ["--product", "american-heston", "--obs", "4",
                             "--payoff", "call", "--paths", "16384"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "characteristic-function european call" in out


@pytest.mark.slow
def test_exotic_cli_american_bounds(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(["--paths", "16384", "--blocks", "8", "--rows", "8",
                      "--backend", "xla", "--product", "american",
                      "--obs", "8"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "duality bracket" in out and "rule-suboptimality" in out


def test_exotic_cli_barrier_book(capsys):
    from mctpu.cli import exotic
    rc = exotic.main(["--paths", "16384", "--blocks", "8", "--rows", "8",
                      "--backend", "xla", "--product", "barrier-book",
                      "--obs", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "instrument-marks/s" in out and "down-and-out" in out
