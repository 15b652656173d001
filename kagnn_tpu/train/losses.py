"""Masked losses and metrics over padded batches.

Reference protocols: masked cross-entropy for node classification
(node_classification_clean/utils.py:125-132), NLL on log-softmax outputs for
graph classification (graph_classification_utils.py:45-55), L1/MAE for
regression (optuna_zinc.py:53).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def masked_softmax_cross_entropy(logits: Array, labels: Array,
                                 mask: Array) -> Array:
    """Mean CE over rows where mask is True."""
    ll = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    m = mask.astype(logits.dtype)
    return (ll * m).sum() / jnp.maximum(m.sum(), 1.0)


def masked_nll(log_probs: Array, labels: Array, mask: Array) -> Array:
    """Mean negative log-likelihood of integer labels over masked rows
    (inputs already log-softmaxed, like the reference's F.nll_loss usage)."""
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    m = mask.astype(log_probs.dtype)
    return -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)


def masked_l1(pred: Array, target: Array, mask: Array) -> Array:
    """Mean absolute error over masked rows. pred (N, 1) or (N,), target
    broadcastable."""
    pred = pred.reshape(pred.shape[0], -1)
    target = target.reshape(target.shape[0], -1).astype(pred.dtype)
    err = jnp.abs(pred - target).mean(axis=-1)
    m = mask.astype(pred.dtype)
    return (err * m).sum() / jnp.maximum(m.sum(), 1.0)


def masked_accuracy(logits: Array, labels: Array, mask: Array) -> Array:
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * mask.astype(jnp.float32)
    return correct.sum() / jnp.maximum(mask.sum().astype(jnp.float32), 1.0)
