"""Pallas kernels vs their pure-XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_se_scale_matches_reference(rng):
    from rcnn_ocr_tpu.ops.se_pallas import se_scale, se_scale_reference

    x = jnp.asarray(rng.normal(size=(4, 3, 5, 16)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    got = se_scale(x, w1, w2)
    want = se_scale_reference(x, w1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_se_scale_grad_matches_reference(rng):
    from rcnn_ocr_tpu.ops.se_pallas import se_scale, se_scale_reference

    x = jnp.asarray(rng.normal(size=(2, 3, 4, 8)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))

    def loss_pallas(x, w1, w2):
        return jnp.sum(se_scale(x, w1, w2) ** 2)

    def loss_ref(x, w1, w2):
        return jnp.sum(se_scale_reference(x, w1, w2) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w1, w2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_bilstm_pallas_matches_scan(rng):
    from rcnn_ocr_tpu.ops.lstm_pallas import _scan_reference, bilstm_scan

    T, B, H = 5, 4, 8
    xs = jnp.asarray(rng.normal(size=(T, 2, B, 4 * H)).astype(np.float32))
    w_hh = jnp.asarray((rng.normal(size=(2, H, 4 * H)) * 0.2).astype(np.float32))
    got = bilstm_scan(xs, w_hh, H)
    want = _scan_reference(xs, w_hh, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_bilstm_pallas_grad(rng):
    from rcnn_ocr_tpu.ops.lstm_pallas import _scan_reference, bilstm_scan

    T, B, H = 3, 2, 4
    xs = jnp.asarray(rng.normal(size=(T, 2, B, 4 * H)).astype(np.float32))
    w_hh = jnp.asarray((rng.normal(size=(2, H, 4 * H)) * 0.2).astype(np.float32))

    g1 = jax.grad(lambda a, b: jnp.sum(bilstm_scan(a, b, H) ** 2), argnums=(0, 1))(xs, w_hh)
    g2 = jax.grad(lambda a, b: jnp.sum(_scan_reference(a, b, H) ** 2), argnums=(0, 1))(xs, w_hh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_bilstm_module_pallas_flag_matches(rng):
    """BiLSTM(use_pallas=True) output == BiLSTM(use_pallas=False)."""
    from rcnn_ocr_tpu.models.lstm import BiLSTM

    x = jnp.asarray(rng.normal(size=(2, 6, 12)).astype(np.float32))
    m_ref = BiLSTM(hidden_size=8, out_size=8, use_pallas=False)
    v = m_ref.init(jax.random.PRNGKey(0), x)
    m_pal = BiLSTM(hidden_size=8, out_size=8, use_pallas=True)
    out_ref = m_ref.apply(v, x)
    out_pal = m_pal.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref), rtol=1e-5, atol=1e-5)
