"""Multi-host training entry: two CPU processes form a jax.distributed
cluster (SURVEY §2.10) and run the full synthetic train loop over a mesh
spanning both hosts — per-host batches assembled into global arrays, grad
psum + contrastive all-gather across the process boundary."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

# compile-heavy end-to-end tier (see pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

CHILD = """
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})

from mdt_policy_tpu.training import (DataConfig, DistributedConfig, RunConfig,
                                     TrainerConfig, train)
from test_training_cli import TINY_OVERRIDES  # noqa: E402 (tests on path)

pid = int(sys.argv[1])
cfg = RunConfig(
    agent="mdtv", log_dir=sys.argv[3], run_name="mh",
    data=DataConfig(root_data_dir=None, synthetic_static_hw=32,
                    synthetic_gripper_hw=32),
    trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=1, steps_per_epoch=2,
                          limit_val_batches=1, seed=0, log_every=1,
                          keep_checkpoints=0),
    distributed=DistributedConfig(enabled=True,
                                  coordinator_address=sys.argv[2],
                                  num_processes=2, process_id=pid),
    agent_overrides=TINY_OVERRIDES,
)
state = train(cfg)
assert jax.process_count() == 2, jax.process_count()
assert int(state.step) == 2
print(f"MH-OK pid={{pid}} devices={{jax.device_count()}}")
"""


def test_two_process_cpu_multihost_train(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "child.py"
    script.write_text(CHILD.format(repo=str(REPO)))
    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = f"{REPO}:{REPO}/tests"
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), addr,
                          str(tmp_path / "runs")],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"MH-OK pid={i} devices=4" in out, out[-1500:]
