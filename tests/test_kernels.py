"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

RNG = np.random.default_rng(88)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run all Pallas kernels in interpreter mode (CPU test environment)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


class TestSmoothLabelsKernel:
    @pytest.mark.parametrize("b,c", [(4, 16), (37, 200), (128, 300)])
    def test_matches_reference(self, b, c):
        from pigeon_tpu.kernels.geodesy import (
            smooth_labels_from_points,
            smooth_labels_reference,
        )

        labels = np.stack([RNG.uniform(-180, 180, b),
                           RNG.uniform(-65, 70, b)], -1).astype(np.float32)
        cells = np.stack([RNG.uniform(-180, 180, c),
                          RNG.uniform(-65, 70, c)], -1).astype(np.float32)
        got = np.asarray(smooth_labels_from_points(
            jnp.asarray(labels), jnp.asarray(cells), tau_km=75.0))
        want = np.asarray(smooth_labels_reference(
            jnp.asarray(labels), jnp.asarray(cells), tau_km=75.0))
        assert got.shape == (b, c)
        np.testing.assert_allclose(got, want, atol=2e-5)
        # The nearest cell always carries weight ~1 (tiny drift allowed:
        # the fused kernel may recompute d with different fusion for the
        # min vs the subtraction).
        np.testing.assert_allclose(got.max(-1), 1.0, rtol=1e-5)

    def test_tau_variants(self):
        from pigeon_tpu.kernels.geodesy import (
            smooth_labels_from_points,
            smooth_labels_reference,
        )

        labels = np.stack([RNG.uniform(-180, 180, 8),
                           RNG.uniform(-65, 70, 8)], -1).astype(np.float32)
        cells = np.stack([RNG.uniform(-180, 180, 50),
                          RNG.uniform(-65, 70, 50)], -1).astype(np.float32)
        for tau in (65.0, 75.0):
            got = np.asarray(smooth_labels_from_points(
                jnp.asarray(labels), jnp.asarray(cells), tau_km=tau))
            want = np.asarray(smooth_labels_reference(
                jnp.asarray(labels), jnp.asarray(cells), tau_km=tau))
            np.testing.assert_allclose(got, want, atol=2e-5)
