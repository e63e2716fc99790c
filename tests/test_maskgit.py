"""MaskGIT generator: sampling produces valid in-vocabulary tokens."""
import jax
import jax.numpy as jnp
import numpy as np

from sic_tpu.models.maskgit import MaskGITGenerator, MaskGITSpec, generate


def test_maskgit_generate():
    spec = MaskGITSpec(codebook_size=32, condition_num_classes=10,
                       image_seq_len=8, hidden=64, num_layers=2, num_heads=2)
    model = MaskGITGenerator(spec)
    cond = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8), jnp.int32), cond,
                        jnp.zeros((2,), bool))
    ids = generate(model, params, jax.random.PRNGKey(1), cond,
                   guidance_scale=2.0, num_sample_steps=4)
    ids = np.asarray(ids)
    assert ids.shape == (2, 8)
    assert ids.min() >= 0 and ids.max() < spec.codebook_size
    assert not np.any(ids == spec.mask_token_id)

    # deterministic given the rng
    ids2 = np.asarray(generate(model, params, jax.random.PRNGKey(1), cond,
                               guidance_scale=2.0, num_sample_steps=4))
    np.testing.assert_array_equal(ids, ids2)
