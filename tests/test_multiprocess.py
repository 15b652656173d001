"""True multi-PROCESS distributed path (VERDICT round-3 item 7): 2 local
processes x 4 virtual CPU devices each, wired with
jax.distributed.initialize + a local coordinator, running the halo-partition
train step over the 2-process 8-device mesh.

This exercises the one link the virtual single-process mesh cannot: jit
with non-fully-addressable shardings, cross-process collectives, and
dist/init.py's initialize() with num_processes > 1 — i.e. the pod-slice
story end-to-end minus the physical ICI.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["KAGNN_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["KAGNN_COORD"],
    num_processes=2, process_id=int(os.environ["KAGNN_PID"]))
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import optax
from jax.sharding import Mesh

from kagnn_tpu.data.synthetic import community_node_graph
from kagnn_tpu.dist.halo import build_halo_plan, make_halo_node_step
from kagnn_tpu.graphs import single_graph
from kagnn_tpu.models import NodeClassifier
from kagnn_tpu.train import create_train_state

d = community_node_graph(n_nodes=96, n_classes=3, num_features=6, seed=5)
g = single_graph(d["senders"], d["receivers"], nodes=d["nodes"], y=d["y"],
                 edge_pad_multiple=128)
model = NodeClassifier(conv_type="gin", architecture="fastkan", mp_layers=2,
                       num_features=6, hidden_channels=8, num_classes=3,
                       skip=False, grid_size=4, dropout=0.0)
tx = optax.sgd(1e-2)
state, _ = create_train_state(model, jax.random.key(0), g, tx)
mask = np.asarray(g.node_mask)
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("graph",))
plan = build_halo_plan(g, 8)
step, evaluate = make_halo_node_step(model, tx, mesh, plan, g, mask)
key = jax.random.key(3)
losses = []
for _ in range(3):
    state, loss = step(state, key)
    losses.append(float(loss))
ev_loss, ev_acc = evaluate(state, np.asarray(g.node_mask))
print(json.dumps({"pid": int(os.environ["KAGNN_PID"]),
                  "losses": losses, "eval_loss": float(ev_loss),
                  "eval_acc": float(ev_acc)}), flush=True)
"""


def test_two_process_halo_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ, KAGNN_REPO=repo,
                   KAGNN_COORD=f"127.0.0.1:{port}", KAGNN_PID=str(pid),
                   XLA_FLAGS="--xla_force_host_platform_device_count=4")
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        assert p.returncode == 0, err[-3000:]
        rec = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
        assert rec, out
        outs.append(rec[-1])
    import numpy as np

    # both controllers observe the SAME replicated loss trajectory
    np.testing.assert_allclose(outs[0]["losses"], outs[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(outs[0]["eval_acc"], outs[1]["eval_acc"])
    assert all(np.isfinite(outs[0]["losses"]))
    # and the model actually trains
    assert outs[0]["losses"][-1] < outs[0]["losses"][0]
