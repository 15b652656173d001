"""AttentionWithFastKANTransform parity vs the reference torch module."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/node_classification_clean")
try:
    from fastkan import AttentionWithFastKANTransform as TorchAttn
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kagnn_tpu.kan.layers import AttentionWithFastKANTransform  # noqa: E402
from kagnn_tpu.utils import port  # noqa: E402


def test_attention_parity(rng):
    torch.manual_seed(0)
    qd, kd, vd, hd, H = 8, 6, 6, 4, 2
    ref = TorchAttn(qd, kd, vd, hd, H, gating=True)
    B, Lq, Lk = 3, 5, 7
    q = rng.normal(size=(B, Lq, qd)).astype(np.float32)
    k = rng.normal(size=(B, Lk, kd)).astype(np.float32)
    v = rng.normal(size=(B, Lk, vd)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(q), torch.tensor(k), torch.tensor(v)).numpy()

    mod = AttentionWithFastKANTransform(qd, kd, vd, hd, H, gating=True)
    sd = ref.state_dict()
    params = {}
    for name in ("linear_q", "linear_k", "linear_v", "linear_o", "linear_g"):
        params[name] = port.port_fastkan_layer(sd, prefix=f"{name}.")
    out = mod.apply({"params": params}, jnp.asarray(q), jnp.asarray(k),
                    jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)
