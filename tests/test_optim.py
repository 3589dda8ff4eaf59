import math

import numpy as np
import pytest

from rcnn_ocr_tpu.training.optim import (
    CosineAnnealingLR,
    ReduceLROnPlateau,
    build_optimizer,
    build_scheduler,
    get_lr,
    set_lr,
)


def test_plateau_semantics():
    s = ReduceLROnPlateau(base_lr=1.0, factor=0.5, patience=3, min_lr=0.01)
    assert s.step(1.0) == 1.0  # first metric becomes best
    # 4 bad epochs (patience 3 exceeded on the 4th) -> halve
    for _ in range(3):
        assert s.step(1.0) == 1.0
    assert s.step(1.0) == 0.5
    # improvement resets the counter
    assert s.step(0.5) == 0.5
    for _ in range(4):  # patience 3 -> reduction on the 4th bad epoch
        s.step(0.5)
    assert s.lr == 0.25
    # min_lr floor
    for _ in range(100):
        s.step(0.5)
    assert s.lr >= 0.01


def test_plateau_threshold_relative():
    s = ReduceLROnPlateau(base_lr=1.0, threshold=1e-4)
    s.step(1.0)
    # a non-improvement within the threshold counts as bad
    s.step(1.0 - 1e-6)
    assert s.num_bad_epochs == 1


def test_cosine_schedule_closed_form():
    s = CosineAnnealingLR(base_lr=1.0, t_max=10)
    lrs = [s.step() for _ in range(10)]
    for t, lr in enumerate(lrs, start=1):
        want = (1 + math.cos(math.pi * t / 10)) / 2
        assert lr == pytest.approx(want)
    assert lrs[-1] == pytest.approx(0.0)


def test_scheduler_state_roundtrip():
    s = ReduceLROnPlateau(base_lr=1.0)
    s.step(1.0)
    s.step(2.0)
    state = s.state_dict()
    s2 = ReduceLROnPlateau(base_lr=1.0)
    s2.load_state_dict(state)
    assert s2.best == s.best and s2.num_bad_epochs == s.num_bad_epochs

    c = CosineAnnealingLR(base_lr=1.0, t_max=5)
    c.step()
    c2 = CosineAnnealingLR(base_lr=1.0, t_max=5)
    c2.load_state_dict(c.state_dict())
    assert c2.epoch == 1


def test_build_scheduler_names():
    assert build_scheduler(None, 1.0, 10) is None
    assert build_scheduler("None", 1.0, 10) is None
    assert isinstance(build_scheduler("ReduceLROnPlateau", 1.0, 10), ReduceLROnPlateau)
    assert isinstance(build_scheduler("CosineAnnealingLR", 1.0, 10), CosineAnnealingLR)
    with pytest.raises(ValueError):
        build_scheduler("Nope", 1.0, 10)


@pytest.mark.parametrize("name", ["Adam", "AdamW", "SGD"])
def test_optimizers_step_and_lr_injection(name):
    import jax.numpy as jnp

    tx = build_optimizer(name, 0.1, weight_decay=0.01, momentum=0.9)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    assert get_lr(state) == pytest.approx(0.1)
    grads = {"w": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["w"]) < 0)  # descent direction
    state = set_lr(state, 0.05)
    assert get_lr(state) == pytest.approx(0.05)


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        build_optimizer("RMSNope", 0.1)


def test_torch_adam_l2_semantics():
    """Adam's weight_decay must be L2-into-gradient (torch semantics), not
    decoupled: with zero gradient and nonzero weights, Adam still moves."""
    import jax.numpy as jnp

    tx = build_optimizer("Adam", 0.1, weight_decay=0.5)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.zeros((2,))}, state, params)
    assert np.abs(np.asarray(updates["w"])).sum() > 0


def test_masked_token_ce_label_smoothing():
    """eps-smoothed CE == (1-eps)*CE + eps*uniform-KL term, PAD masked."""
    import jax.numpy as jnp
    import numpy as np

    from rcnn_ocr_tpu.training.train_step import masked_token_ce

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 3, 5)).astype(np.float32))
    targets = jnp.asarray([[1, 2, 0], [3, 0, 0]], dtype=jnp.int32)  # 0 = PAD

    base = float(masked_token_ce(logits, targets, pad_id=0))
    smoothed = float(
        masked_token_ce(logits, targets, pad_id=0, label_smoothing=0.1)
    )

    logp = np.asarray(jnp.log(jnp.exp(logits) / jnp.exp(logits).sum(-1, keepdims=True)))
    mask = np.asarray(targets) != 0
    nll = -np.take_along_axis(logp, np.asarray(targets)[..., None], axis=-1)[..., 0]
    uni = -logp.mean(-1)
    want_base = (nll * mask).sum() / mask.sum()
    want_smooth = ((0.9 * nll + 0.1 * uni) * mask).sum() / mask.sum()
    np.testing.assert_allclose(base, want_base, rtol=1e-5)
    np.testing.assert_allclose(smoothed, want_smooth, rtol=1e-5)
    assert smoothed != base


def test_build_optimizer_grad_clip():
    """grad_clip: the raw gradient is clipped to the global norm before
    any optimizer statistics; lr injection still works."""
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rcnn_ocr_tpu.training.optim import build_optimizer, get_lr, set_lr

    params = {"w": jnp.zeros((3,)), "b": jnp.zeros((2,))}
    grads = {"w": jnp.array([3.0, 0.0, 0.0]), "b": jnp.array([0.0, 4.0])}  # norm 5

    tx = build_optimizer("SGD", lr=1.0, momentum=0.0, grad_clip=1.0)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # update = -lr * clipped grad; clipped to norm 1 -> grad / 5
    np.testing.assert_allclose(
        np.asarray(updates["w"]), [-0.6, 0.0, 0.0], rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(updates["b"]), [0.0, -0.8], rtol=1e-6)
    assert get_lr(state) == 1.0
    state2 = set_lr(state, 0.5)
    assert get_lr(state2) == 0.5

    # grad_clip=0 leaves gradients untouched
    tx0 = build_optimizer("SGD", lr=1.0, momentum=0.0)
    up0, _ = tx0.update(grads, tx0.init(params), params)
    np.testing.assert_allclose(np.asarray(up0["w"]), [-3.0, 0.0, 0.0], rtol=1e-6)

    # Adam path composes (smoke: finite, right shapes)
    txa = build_optimizer("Adam", lr=1e-3, grad_clip=1.0)
    upa, _ = txa.update(grads, txa.init(params), params)
    assert all(np.isfinite(np.asarray(v)).all() for v in upa.values())
