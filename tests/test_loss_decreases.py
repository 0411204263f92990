"""Training-signal sanity: on structured clips the TimeT loss decreases
(the in-repo analogue of the reference's Performance.jpg loss curve,
BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_train_step import IMG, _clip, make_everything


def _structured_clips(seed, b=4, F=3):
    """Clips with a consistent two-region structure the prototypes can
    lock onto (left/right halves with distinct colors + noise)."""
    rng = np.random.default_rng(seed)
    x = np.zeros((b, F, IMG, IMG, 3), np.float32)
    for i in range(b):
        c1, c2 = rng.normal(size=(2, 3)) * 2
        x[i, :, :, : IMG // 2] = c1
        x[i, :, :, IMG // 2 :] = c2
    x += 0.1 * rng.normal(size=x.shape)
    return jnp.asarray(x.astype(np.float32))


def test_loss_decreases_over_training():
    model, cfg, tx, state, step = make_everything()
    jstep = jax.jit(step)
    losses = []
    for i in range(24):
        state, m = jstep(state, _structured_clips(i % 4), jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    early = np.mean(losses[:6])
    late = np.mean(losses[-6:])
    assert np.isfinite(losses).all()
    assert late < early, (early, late, losses)
