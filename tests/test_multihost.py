"""Multi-host (DCN) execution of the sharded train step.

The reference delegates multi-GPU to PyTorch-Lightning ('dp'/'ddp'+NCCL,
/root/reference/train.py:451-458); our analogue is jax.distributed +
the same pjit program (cli/train.py ANIMNERF_MULTIHOST). This test runs
it for real: TWO OS processes, each owning 4 virtual CPU devices, form
one 8-device mesh via jax.distributed.initialize and train the tiny
flagship rig for 3 steps. Every process must see the same losses, and
they must match a single-process 8-device run bit-for-bit (same global
mesh, same program, gradient psum over DCN instead of in-process).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import json, os, sys

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
coord = sys.argv[3]
out_path = sys.argv[4]
n_local = int(sys.argv[5])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={n_local}").strip()

import jax
jax.config.update("jax_platforms", "cpu")
if n_procs > 1:
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_procs, process_id=proc_id)
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(out_path)))  # repo root
sys.path.insert(0, os.path.join(os.path.dirname(out_path), "tests"))

from test_parallel import _tiny_setup  # noqa: E402
from animnerf_tpu.models.body_params import init_body_params  # noqa: E402
from animnerf_tpu.parallel.mesh import make_mesh  # noqa: E402
from animnerf_tpu.parallel.train_pjit import make_sharded_train_step  # noqa: E402

cfg, system, num_joints, batch = _tiny_setup(B=8, n_rays=32)
mesh = make_mesh()  # all 8 GLOBAL devices
rng = jax.random.PRNGKey(0)
body_params = init_body_params(cfg.num_frames, pose_dim=3 * (num_joints - 1))
state = system.init_state(rng, body_params, steps_per_epoch=10)
tx = system.make_optimizer(steps_per_epoch=10)
train_step, place_state, place_batch = make_sharded_train_step(system, tx, mesh)
state = place_state(state)

losses = []
key = jax.random.PRNGKey(7)
for i in range(3):
    b = dict(batch)
    b["rays"] = batch["rays"] + 1e-4 * i
    state, metrics = train_step(state, place_batch(b), key)
    losses.append(float(np.asarray(jax.device_get(metrics["loss"]))))

with open(out_path + f".{proc_id}", "w") as f:
    json.dump({"losses": losses}, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, n_procs: int, n_local: int):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    out = str(tmp_path / "out.json")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # conftest's 8-dev flag must not leak
    env.pop("JAX_PLATFORMS", None)
    # out_path's parent dir is used by the worker to find the repo root
    outp = os.path.join(repo, f".multihost_test_{n_procs}")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(n_procs), coord, outp,
             str(n_local)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(n_procs)
    ]
    outs = []
    for i, p in enumerate(procs):
        so, se = p.communicate(timeout=900)
        assert p.returncode == 0, (
            f"proc {i} failed:\n{so.decode()[-2000:]}\n{se.decode()[-4000:]}")
    results = []
    for i in range(n_procs):
        with open(outp + f".{i}") as f:
            results.append(json.load(f))
        os.remove(outp + f".{i}")
    return results


def test_two_process_dcn_matches_single_process(tmp_path):
    two = _run_workers(tmp_path, n_procs=2, n_local=4)
    one = _run_workers(tmp_path, n_procs=1, n_local=8)

    # both DCN processes observe identical metrics
    np.testing.assert_allclose(two[0]["losses"], two[1]["losses"], rtol=0)
    # and the 2-process global mesh equals the single-process 8-device mesh
    np.testing.assert_allclose(two[0]["losses"], one[0]["losses"],
                               rtol=1e-6, atol=1e-7)
    # training actually progressed
    assert two[0]["losses"][0] != two[0]["losses"][-1]
