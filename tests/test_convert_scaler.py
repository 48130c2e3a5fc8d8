"""scripts/convert_scaler.py — joblib sklearn scaler -> RegressionScaler
JSON.

The migration contract: a user holding the reference's pickled
StandardScaler (`/root/reference/evaluation/metrics.py:29-54` inverts it
with exp on all columns but temp_avg, then subtracts
``[408 or 416, 1, 0, 1, 1, 1]``) converts it once and
`train/metrics.py::RegressionScaler.inverse` must recover the SAME
physical values the reference's `recover_regression_values` would.
"""

import importlib.util
import os

import numpy as np
import pytest

joblib = pytest.importorskip("joblib")
sklearn_pre = pytest.importorskip("sklearn.preprocessing")

from pigeon_tpu.train.metrics import RegressionScaler

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "convert_scaler", os.path.join(ROOT, "scripts", "convert_scaler.py"))
cs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cs)

RNG = np.random.default_rng(7)


def _raw_values(n=64):
    """Plausible raw multi-task rows: [elevation, population, temp_avg,
    temp_diff, prec_avg, prec_diff] (reference metrics.py:38-39)."""
    return np.column_stack([
        RNG.uniform(-400, 5000, n),      # elevation (offset 408 keeps >0)
        RNG.uniform(0, 1e6, n),          # population
        RNG.uniform(-30, 35, n),         # temp_avg (not log-transformed)
        RNG.uniform(0, 40, n),           # temp_diff
        RNG.uniform(0, 400, n),          # prec_avg
        RNG.uniform(0, 300, n),          # prec_diff
    ])


def _reference_transform(raw, offset):
    """The reference's forward transform (what its scaler was fit on)."""
    v = raw + np.array([offset, 1, 0, 1, 1, 1], np.float64)
    v[:, [0, 1, 3, 4, 5]] = np.log(v[:, [0, 1, 3, 4, 5]])
    return v


def _reference_recover(scaler, scaled, offset):
    """reference metrics.py:44-53 verbatim semantics."""
    vals = scaler.inverse_transform(scaled)
    vals[:, :2] = np.exp(vals[:, :2])
    vals[:, 3:] = np.exp(vals[:, 3:])
    return vals - np.array([offset, 1, 0, 1, 1, 1]).transpose()


@pytest.mark.parametrize("yfcc,offset", [(False, 408.0), (True, 416.0)])
def test_converted_inverse_matches_reference(tmp_path, yfcc, offset):
    raw = _raw_values()
    transformed = _reference_transform(raw, offset)
    sk = sklearn_pre.StandardScaler().fit(transformed)
    jl = tmp_path / "scaler.joblib"
    out = tmp_path / "scaler.json"
    joblib.dump(sk, jl)

    argv = [str(jl), str(out)] + (["--yfcc"] if yfcc else [])
    assert cs.main(argv) == 0

    rs = RegressionScaler.load(str(out))
    scaled = sk.transform(transformed)
    want = _reference_recover(sk, scaled.copy(), offset)
    got = rs.inverse(scaled)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    # and the round trip lands on the raw physical values
    np.testing.assert_allclose(got, raw, rtol=1e-7, atol=1e-6)


def test_rejects_non_standard_scaler(tmp_path):
    sk = sklearn_pre.MinMaxScaler().fit(_reference_transform(
        _raw_values(), 408.0))
    jl = tmp_path / "mm.joblib"
    joblib.dump(sk, jl)
    with pytest.raises(SystemExit, match="mean_"):
        cs.main([str(jl), str(tmp_path / "out.json")])


def test_rejects_wrong_width(tmp_path):
    sk = sklearn_pre.StandardScaler().fit(RNG.normal(size=(16, 4)))
    jl = tmp_path / "w4.joblib"
    joblib.dump(sk, jl)
    with pytest.raises(SystemExit, match="6 multi-task"):
        cs.main([str(jl), str(tmp_path / "out.json")])


def test_convert_raises_value_error_programmatically():
    # Library-style callers get ValueError; only main() maps to SystemExit
    # (r4 advisor finding).
    sk = sklearn_pre.MinMaxScaler().fit(_reference_transform(
        _raw_values(), 408.0))
    with pytest.raises(ValueError, match="mean_"):
        cs.convert(sk)
    sk4 = sklearn_pre.StandardScaler().fit(RNG.normal(size=(16, 4)))
    with pytest.raises(ValueError, match="6 multi-task"):
        cs.convert(sk4)
