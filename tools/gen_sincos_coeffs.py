"""Regenerate the folded sincos polynomial coefficients in mctpu/rng.py.

``mctpu.rng.sincos_2pi_bits`` evaluates cos/sin(pi/2 * x) for x in [0,1)
(one exact quadrant of the Box-Muller angle) with degree-9 (sin, odd) and
degree-8 (cos, even) polynomials in x**2.  The fit is iteratively
reweighted least squares pushed toward equioscillation; f32 max abs error
~2.7e-7 over the full quadrant.  Run: ``python tools/gen_sincos_coeffs.py``.
"""
import numpy as np

POWERS = [0, 2, 4, 6, 8]


def fit(x, target, w):
    A = np.stack([x ** p for p in POWERS], 1) * w[:, None]
    coef, *_ = np.linalg.lstsq(A, target * w, rcond=None)
    return coef


def refine(x, tgt, reduced):
    """IRLS toward equioscillation: upweight the current error peaks."""
    w = np.ones_like(x)
    for _ in range(12):
        cs = fit(x, reduced, w)
        approx = sum(c * x ** p for c, p in zip(cs, POWERS))
        err = (x * approx if reduced is not tgt else approx) - tgt
        w = 1 + 1e5 * np.abs(err)
    return cs, np.abs(err).max()


def main():
    x = np.linspace(0, 1, 200001)
    tgt_s = np.sin(np.pi / 2 * x)
    tgt_sx = np.where(x > 0, tgt_s / np.maximum(x, 1e-300), np.pi / 2)
    cs, es = refine(x, tgt_s, tgt_sx)
    tgt_c = np.cos(np.pi / 2 * x)
    cc, ec = refine(x, tgt_c, tgt_c)
    print(f"_SIN_C = {tuple(cs)}  # f64 max err {es:.2e}")
    print(f"_COS_C = {tuple(cc)}  # f64 max err {ec:.2e}")

    xs = x.astype(np.float32)
    x2 = xs * xs
    csf = [np.float32(c) for c in cs]
    ccf = [np.float32(c) for c in cc]
    s32 = xs * (csf[0] + x2 * (csf[1] + x2 * (csf[2] + x2 * (csf[3]
               + x2 * csf[4]))))
    c32 = (ccf[0] + x2 * (ccf[1] + x2 * (ccf[2] + x2 * (ccf[3]
           + x2 * ccf[4]))))
    print("f32 max abs err sin:",
          np.abs(s32.astype(np.float64) - tgt_s).max())
    print("f32 max abs err cos:",
          np.abs(c32.astype(np.float64) - tgt_c).max())


if __name__ == "__main__":
    main()
