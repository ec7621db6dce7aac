"""Masking-op tests (parity with reference model/functions/masking.py)."""

import jax.numpy as jnp
import numpy as np

from speech2text_tpu.ops import masking


def test_non_pad_mask():
    m = masking.make_non_pad_mask(jnp.array([3, 1, 4]), 5)
    expect = np.array([
        [1, 1, 1, 0, 0],
        [1, 0, 0, 0, 0],
        [1, 1, 1, 1, 0],
    ], bool)
    np.testing.assert_array_equal(np.asarray(m), expect)
    np.testing.assert_array_equal(
        np.asarray(masking.make_pad_mask(jnp.array([3, 1, 4]), 5)), ~expect)


def test_subsequent_mask():
    m = np.asarray(masking.subsequent_mask(4))
    assert m[0, 0] and not m[0, 1]
    assert m[3].all()
    np.testing.assert_array_equal(m, np.tril(np.ones((4, 4), bool)))


def test_subsequent_chunk_mask():
    m = np.asarray(masking.subsequent_chunk_mask(6, chunk_size=2))
    # within-chunk lookahead allowed
    assert m[0, 1]
    assert not m[1, 2]
    assert m[4, 0]  # unlimited left context
    m2 = np.asarray(masking.subsequent_chunk_mask(6, 2, num_left_chunks=1))
    assert not m2[4, 0]
    assert m2[4, 2]


def test_chunk_causal_mask_dynamic():
    # full attention when chunk_size <= 0
    m = np.asarray(masking.chunk_causal_mask(4, jnp.int32(-1)))
    assert m.all()
    m2 = np.asarray(masking.chunk_causal_mask(4, jnp.int32(2), jnp.int32(0)))
    assert m2[1, 0] and not m2[2, 1]


def test_add_optional_chunk_mask():
    npm = masking.make_non_pad_mask(jnp.array([4, 2]), 4)
    am = np.asarray(masking.add_optional_chunk_mask(npm, 2, -1))
    assert am.shape == (2, 4, 4)
    assert not am[1, 1, 2]  # padding blocked
    assert not am[0, 1, 2]  # future chunk blocked
    assert am[0, 2, 1]
