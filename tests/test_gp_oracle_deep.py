"""v19 GP parity deepening (VERDICT r1 #10): the optimizer-quality oracle.

george is absent in this image, so the oracle is scipy L-BFGS-B over an
independent NumPy implementation of the same model — exactly the
reference's optimization setup (multiband_gp.py:141-167: L-BFGS-B,
maxiter=100, jointly fitted constant mean == george fit_mean=True).
Our batched Adam must reach the same optimum quality per lane, and the
gp2d_* feature columns on the SHIFTED synthetic set must match the
oracle's fits lane-wise.
"""

import numpy as np
import pytest

from tests.test_gp import np_nll


def _prep_object(packed, i):
    """Reproduce multiband_gp's data prep for one object (filter, zeroed
    origin, median-|flux| normalization) in NumPy."""
    from mallorn_tpu.utils.constants import WAVELENGTHS_A

    at = np.asarray(packed.all_time[i], np.float64)
    af = np.asarray(packed.all_flux[i], np.float64)
    ae = np.asarray(packed.all_err[i], np.float64)
    ab = np.asarray(packed.all_band[i])
    am = np.asarray(packed.all_mask[i])
    use = am & np.isfinite(af) & np.isfinite(ae) & (ae > 0)
    t = at[use] - at[use].min()
    lam = np.asarray(WAVELENGTHS_A, np.float64)[np.clip(ab[use], 0, 5)]
    nz = af[use] != 0
    scale = np.median(np.abs(af[use][nz])) if nz.any() else 1.0
    scale = scale if scale not in (0.0,) and np.isfinite(scale) else 1.0
    return t, lam, af[use] / scale, ae[use] / scale


def _scipy_fit(t, lam, y, yerr, maxiter=100):
    """The reference's optimizer: L-BFGS-B from the same init."""
    from scipy.optimize import minimize

    p0 = np.array([y.mean(),
                   np.log(max(y.var(), 1e-8)),
                   2 * np.log(100.0), 2 * np.log(6000.0)])

    def f(p):
        try:
            return np_nll(p, t, lam, y, yerr)
        except np.linalg.LinAlgError:
            return 1e12

    res = minimize(f, p0, method="L-BFGS-B", options={"maxiter": maxiter})
    return res.x, float(res.fun)


@pytest.fixture(scope="module")
def shifted_objects():
    from mallorn_tpu.data.synthetic import TEST_SHIFT, generate_dataset

    return generate_dataset(14, seed=31, tde_frac=0.3, **TEST_SHIFT)


def test_adam_matches_lbfgs_optimum_quality(shifted_objects):
    """Per lane: our batched-Adam NLL must be at least as good as scipy
    L-BFGS-B's (within a small slack) INCLUDING the jointly-fitted mean."""
    import jax.numpy as jnp

    from mallorn_tpu.features import multiband_gp
    from mallorn_tpu.ops.gp import fit_gp_batched

    packed, meta, _ = shifted_objects
    feats = multiband_gp.extract(packed, meta, n_steps=100)
    ours_ll = np.asarray(feats["gp2d_log_likelihood"])

    worse = 0
    for i in range(packed.n_objects):
        t, lam, y, yerr = _prep_object(packed, i)
        _, oracle_nll = _scipy_fit(t, lam, y, yerr)
        # ours_ll is a log likelihood; oracle_nll a negative log likelihood
        slack = max(1.0, 0.05 * abs(oracle_nll))
        if -ours_ll[i] > oracle_nll + slack:
            worse += 1
    # L-BFGS-B and Adam find different local optima on a few hard lanes;
    # the batch must not be systematically worse
    assert worse <= 2, f"{worse}/{packed.n_objects} lanes worse than scipy"


def test_gp2d_features_track_oracle_fits(shifted_objects):
    """gp2d_* columns on the shifted set, lane-wise vs the scipy oracle:
    amplitude/time-scale within a broad factor when both optimizers agree
    on quality (hyperparameter posteriors are flat; exact equality is not
    defined — SURVEY.md §7.3)."""
    from mallorn_tpu.features import multiband_gp

    packed, meta, _ = shifted_objects
    feats = multiband_gp.extract(packed, meta, n_steps=100)

    checked = 0
    for i in range(packed.n_objects):
        t, lam, y, yerr = _prep_object(packed, i)
        p_star, oracle_nll = _scipy_fit(t, lam, y, yerr)
        if -np.asarray(feats["gp2d_log_likelihood"])[i] > oracle_nll + 1.0:
            continue  # different optimum; quality gate handled above
        ts_oracle = np.sqrt(np.exp(p_star[2]))
        ts_ours = float(np.asarray(feats["gp2d_time_scale"])[i])
        if not (1.0 < ts_oracle < 1e4):
            continue  # oracle ran to a bound; scale unidentified
        assert 0.2 < ts_ours / ts_oracle < 5.0, (i, ts_ours, ts_oracle)
        checked += 1
    assert checked >= packed.n_objects // 2, checked
