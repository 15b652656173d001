"""MaskedBatchNorm parity with torch BatchNorm1d restricted to valid rows."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kagnn_tpu.ops.norm import MaskedBatchNorm

torch = pytest.importorskip("torch")


def test_train_step_matches_torch(rng):
    f, n, pad = 5, 17, 24
    x = rng.normal(size=(n, f)).astype(np.float32)
    xp = np.zeros((pad, f), np.float32)
    xp[:n] = x
    mask = np.arange(pad) < n

    bn_t = torch.nn.BatchNorm1d(f)
    bn_t.train()
    with torch.no_grad():
        want = bn_t(torch.tensor(x)).numpy()

    bn = MaskedBatchNorm(f)
    vs = bn.init(jax.random.key(0), jnp.asarray(xp), mask=jnp.asarray(mask),
                 use_running_average=False)
    out, mut = bn.apply(vs, jnp.asarray(xp), mask=jnp.asarray(mask),
                        use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out)[:n], want, rtol=1e-4, atol=1e-5)
    # running stats match torch's (momentum 0.1, unbiased var)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               bn_t.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_eval_uses_running_stats(rng):
    f = 4
    x = rng.normal(size=(10, f)).astype(np.float32)
    bn = MaskedBatchNorm(f)
    vs = bn.init(jax.random.key(0), jnp.asarray(x), use_running_average=False)
    out = bn.apply(vs, jnp.asarray(x), use_running_average=True)
    # running stats at init are mean 0 var 1 -> identity modulo eps
    np.testing.assert_allclose(np.asarray(out), x / np.sqrt(1 + 1e-5),
                               rtol=1e-5, atol=1e-5)
