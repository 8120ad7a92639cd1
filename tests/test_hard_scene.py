"""Hard benchmark scene sanity: sharp solid surfaces, textured colors, and a
trainable tiny instance (the full 100-view 256^2 config runs on the chip via
bench.py --scene hard)."""

import jax.numpy as jnp
import numpy as np

from tngp.data.synthetic import make_hard_dataset, make_hard_field


def test_hard_field_properties():
    field = make_hard_field(seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(3, 4096)).astype(np.float32))
    d = x / jnp.linalg.norm(x, axis=0, keepdims=True)
    sig, rgb = field.sigma_rgb(None, x, d)
    sig = np.asarray(sig)
    rgb = np.asarray(rgb)
    assert np.isfinite(sig).all() and (sig >= 0).all()
    assert (rgb >= 0).all() and (rgb <= 1).all()
    # solid interiors and empty space both exist (sharp scene, not a haze)
    assert (sig > 200).mean() > 0.01
    assert (sig < 1.0).mean() > 0.5
    # texture produces real color variation inside shapes
    inside = sig > 200
    assert rgb[:, inside].std() > 0.05


def test_hard_dataset_small():
    ds = make_hard_dataset(n_frames=3, H=24, W=24, num_steps=96)
    assert ds.images.shape == (3, 24, 24, 3)
    img = ds.images
    assert np.isfinite(img).all()
    # views contain both background (white) and foreground structure
    assert img.std() > 0.05
