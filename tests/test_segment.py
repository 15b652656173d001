"""Unit tests for segment ops against plain-numpy references."""
import jax.numpy as jnp
import numpy as np

from kagnn_tpu.ops import segment


def test_segment_sum(rng):
    data = rng.normal(size=(50, 4)).astype(np.float32)
    ids = rng.integers(0, 10, 50)
    out = segment.segment_sum(jnp.asarray(data), jnp.asarray(ids), 10)
    ref = np.zeros((10, 4), np.float32)
    for i, s in enumerate(ids):
        ref[s] += data[i]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_mean_masked(rng):
    data = rng.normal(size=(30, 3)).astype(np.float32)
    ids = rng.integers(0, 5, 30)
    mask = rng.random(30) > 0.3
    out = segment.segment_mean(jnp.asarray(data), jnp.asarray(ids), 5,
                               mask=jnp.asarray(mask))
    ref = np.zeros((5, 3), np.float32)
    cnt = np.zeros(5, np.float32)
    for i, s in enumerate(ids):
        if mask[i]:
            ref[s] += data[i]
            cnt[s] += 1
    ref = ref / np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_softmax_masked(rng):
    logits = rng.normal(size=(40, 2)).astype(np.float32)
    ids = rng.integers(0, 8, 40)
    mask = rng.random(40) > 0.25
    w, _ = segment.segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 8,
                                   mask=jnp.asarray(mask))
    w = np.asarray(w)
    # invalid edges get zero weight
    assert np.all(w[~mask] == 0)
    # per segment, weights of valid edges sum to 1 (where any exist)
    for s in range(8):
        sel = (ids == s) & mask
        if sel.any():
            np.testing.assert_allclose(w[sel].sum(0), np.ones(2), rtol=1e-5)


def test_segment_softmax_with_self_logit(rng):
    logits = rng.normal(size=(20,)).astype(np.float32)
    ids = rng.integers(0, 4, 20)
    mask = np.ones(20, bool)
    self_logits = rng.normal(size=(4,)).astype(np.float32)
    w_e, w_s = segment.segment_softmax(
        jnp.asarray(logits), jnp.asarray(ids), 4, mask=jnp.asarray(mask),
        extra_logits=jnp.asarray(self_logits))
    w_e, w_s = np.asarray(w_e), np.asarray(w_s)
    for s in range(4):
        sel = ids == s
        total = w_e[sel].sum() + w_s[s]
        np.testing.assert_allclose(total, 1.0, rtol=1e-5)
        # matches explicit softmax over [edges..., self]
        all_logits = np.concatenate([logits[sel], [self_logits[s]]])
        expect = np.exp(all_logits - all_logits.max())
        expect /= expect.sum()
        np.testing.assert_allclose(w_s[s], expect[-1], rtol=1e-4)
