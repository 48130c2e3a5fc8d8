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

    def test_sharded_smoothing_under_registered_mesh(self, monkeypatch):
        """Multi-chip train step: with the attention mesh registered
        (as create_mesh does on a pod) and batch-sharded labels, the
        TPU dispatch in `models/geocell_head.smoothed_targets` must
        run the Pallas kernel under shard_map and match the XLA
        composition — including a ragged batch that drops the data
        axis to replicated."""
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from pigeon_tpu.kernels import flash_attention as fa
        from pigeon_tpu.models import geocell_head

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        # The dispatch checks the backend — force the TPU branch; the
        # autouse interpret fixture makes the kernel runnable on CPU.
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        cells = jnp.asarray(np.stack(
            [RNG.uniform(-180, 180, 24), RNG.uniform(-65, 70, 24)],
            -1).astype(np.float32))
        for b in (8, 5):  # divisible and ragged
            labels = jnp.asarray(np.stack(
                [RNG.uniform(-180, 180, b), RNG.uniform(-65, 70, b)],
                -1).astype(np.float32))
            # Ragged tails arrive UNSHARDED in production (evaluate
            # falls back to single-device placement) — the dispatch's
            # divisibility guard must still route them safely.
            ls = (jax.device_put(labels, NamedSharding(mesh, P("data")))
                  if b % 4 == 0 else labels)
            with fa.attention_mesh(mesh):
                got = np.asarray(geocell_head.smoothed_targets(
                    ls, cells, tau_km=75.0))
            from pigeon_tpu.core.geodesy import haversine_matrix
            from pigeon_tpu.core.scoring import smooth_labels
            want = np.asarray(smooth_labels(
                haversine_matrix(labels, cells), tau_km=75.0))
            np.testing.assert_allclose(got, want, atol=2e-5,
                                       err_msg=f"b={b}")
