import numpy as np

from implicit_depth_tpu.config import default_config
from implicit_depth_tpu.train.state import make_optimizer, make_tx, step_lr


def test_step_lr_staircase():
    s = step_lr(base_lr=0.1, steps_per_epoch=10, nepoch_decay=3, gamma=0.1)
    assert s(0) == 0.1
    assert s(29) == 0.1            # epoch 2 (< 3)
    np.testing.assert_allclose(s(30), 0.01)   # epoch 3
    np.testing.assert_allclose(s(60), 0.001)  # epoch 6


def test_optimizer_factory_names():
    for name in ("Adam", "adamw", "RMSprop", "sgd", "LBFGS"):
        tx = make_optimizer(name, 1e-3)
        assert tx is not None
    try:
        make_optimizer("newton", 1e-3)
        assert False
    except ValueError:
        pass


def test_lbfgs_steps():
    """The reference factory's LBFGS branch crashes (missing return,
    optimizer_utils.py:14-15); ours must actually optimize."""
    import jax
    import jax.numpy as jnp
    import optax

    tx = make_optimizer("lbfgs", 1.0)
    params = {"w": jnp.asarray([3.0, -2.0])}
    state = tx.init(params)
    loss = lambda p: jnp.sum(p["w"] ** 2)
    for _ in range(5):
        g = jax.grad(loss)(params)
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    # curvature pairs make the direction Newton-exact on a quadratic
    assert float(loss(params)) < 1e-6


def test_make_tx_applies_schedule():
    import jax.numpy as jnp
    cfg = default_config()
    cfg.training.lr = 0.5
    cfg.training.nepoch_decay = 1
    cfg.training.decay_gamma = 0.5
    tx = make_tx(cfg.training, steps_per_epoch=2)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    # run enough steps to cross an epoch boundary — update magnitudes shrink
    import optax
    mags = []
    for i in range(4):
        upd, state = tx.update(g, state, params)
        mags.append(float(abs(np.asarray(upd["w"])[0])))
    assert mags[3] < mags[0]  # decayed lr after epoch boundary
