"""Multi-host helpers, exercised in their single-process degenerate forms
(the cross-host semantics ride the same GSPMD machinery the 8-virtual-device
mesh tests cover; see parallel/multihost.py docstring)."""

import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from pytorch_nested_unet_tpu.parallel import make_mesh
from pytorch_nested_unet_tpu.parallel.multihost import (
    global_batch_slice, initialize_distributed, make_global_array,
)

pytestmark = pytest.mark.slow  # multi-minute: see pyproject fast lane


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False  # no runtime reinit single-host


def test_global_batch_slice_single_process():
    per, offset = global_batch_slice(16)
    assert (per, offset) == (16, 0)


def test_global_batch_slice_multi_process(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert global_batch_slice(16) == (4, 8)
    with pytest.raises(ValueError, match="not divisible"):
        global_batch_slice(10)


def test_make_global_array_shards_over_mesh():
    mesh = make_mesh(axis_sizes=(8,), axis_names=("data",))
    local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = make_global_array(local, mesh, PartitionSpec("data", None))
    assert arr.shape == (16, 3)
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_two_process_training_matches_single_process(tmp_path):
    """REAL multi-host training: two OS processes form a jax.distributed
    runtime over CPU+Gloo, train the same job on a cross-process
    {'data': 2} mesh, and must reproduce the single-process run's losses
    (GSPMD data-parallel changes nothing but the reduction layout). Only
    process 0 writes the capsule."""
    import socket
    import subprocess
    import sys as _sys

    import cv2
    import pandas as pd

    rng = np.random.default_rng(3)
    img_dir = tmp_path / "inputs" / "synth" / "images"
    mask_dir = tmp_path / "inputs" / "synth" / "masks" / "0"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    for i in range(12):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        yy, xx = np.mgrid[0:32, 0:32]
        cy, cx = rng.integers(10, 22, 2)
        mask = (((yy - cy) ** 2 + (xx - cx) ** 2) < 25).astype(np.uint8) * 255
        img[mask > 0] = 220
        cv2.imwrite(str(img_dir / f"im{i:02d}.png"), img)
        cv2.imwrite(str(mask_dir / f"im{i:02d}.png"), mask)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def args(name):
        return [_sys.executable, os.path.join(os.path.dirname(__file__),
                                              "..", "train.py"),
                f"--data_dir={tmp_path / 'inputs'}",
                f"--output_dir={tmp_path / name}",
                "--dataset=synth", "--arch=UNet", "--name=run",
                "--input_w=32", "--input_h=32", "--epochs=2", "--batch_size=8",
                "--optimizer=Adam", "--precision=fp32", "--platform=cpu"]

    env = {k: v for k, v in os.environ.items() if k != "JAX_NUM_PROCESSES"}
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    procs = []
    try:
        for pid in range(2):
            e = dict(env, JAX_PROCESS_ID=str(pid))
            procs.append(subprocess.Popen(args("mh"), env=e,
                                          stdout=subprocess.PIPE,
                                          stderr=subprocess.STDOUT, text=True))
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        # a hung collective (or a stolen port) must not leak two live
        # train.py processes into the rest of the suite
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    assert "multi-host: process 0/2" in outs[0]
    assert "mesh: {'data': 2}" in outs[0]  # one device per process, spanned

    run = tmp_path / "mh" / "run"
    assert (run / "log.csv").is_file() and (run / "model.msgpack").is_file()

    # single-process reference with identical seed/config; --mesh=data=1
    # keeps it on the same per-step pjit path (and RNG key schedule) as the
    # distributed run — the 1-device default would take the epoch-scan path
    sp = subprocess.run(args("sp") + ["--mesh=data=1"], env=dict(os.environ),
                        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                        text=True, timeout=900)
    assert sp.returncode == 0, sp.stdout[-3000:]
    a = pd.read_csv(run / "log.csv")
    b = pd.read_csv(tmp_path / "sp" / "run" / "log.csv")
    for col in ("loss", "val_loss"):
        np.testing.assert_allclose(a[col], b[col], rtol=2e-4, atol=2e-5,
                                   err_msg=col)
    # IoU thresholds sigmoid(logit) at 0.5 — a discontinuous metric: the
    # cross-process reduction layout reassociates float sums, and on a
    # barely-trained model many pixels sit at the threshold, so single-ulp
    # drift flips whole pixels. Losses above pin the numerics; IoU gets a
    # discontinuity allowance.
    for col in ("iou", "val_iou"):
        np.testing.assert_allclose(a[col], b[col], atol=0.02, err_msg=col)


def test_multihost_resume_broadcasts_process0_state(tmp_path):
    """Preemption-resume without a shared filesystem: only process 0 has
    last.msgpack (it is the only writer); on --resume every process must
    adopt process 0's broadcast state instead of silently starting from
    epoch 0 (which would desynchronize the SPMD schedule)."""
    import socket
    import subprocess
    import sys as _sys

    import cv2
    import pandas as pd

    rng = np.random.default_rng(5)
    img_dir = tmp_path / "inputs" / "synth" / "images"
    mask_dir = tmp_path / "inputs" / "synth" / "masks" / "0"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    for i in range(12):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"im{i:02d}.png"), img)
        cv2.imwrite(str(mask_dir / f"im{i:02d}.png"),
                    ((img[:, :, 0] > 128) * 255).astype(np.uint8))

    def run_two(extra):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = {k: v for k, v in os.environ.items() if k != "JAX_NUM_PROCESSES"}
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        procs = []
        try:
            for pid in range(2):
                # per-process output dirs = no shared filesystem
                a = [_sys.executable,
                     os.path.join(os.path.dirname(__file__), "..", "train.py"),
                     f"--data_dir={tmp_path / 'inputs'}",
                     f"--output_dir={tmp_path / f'out{pid}'}",
                     "--dataset=synth", "--arch=UNet", "--name=run",
                     "--input_w=32", "--input_h=32", "--batch_size=8",
                     "--optimizer=Adam", "--precision=fp32",
                     "--platform=cpu"] + extra
                procs.append(subprocess.Popen(
                    a, env=dict(env, JAX_PROCESS_ID=str(pid)),
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    text=True))
            outs = [p.communicate(timeout=900)[0] for p in procs]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        return outs

    run_two(["--epochs=2"])
    assert (tmp_path / "out0" / "run" / "last.msgpack").is_file()
    assert not (tmp_path / "out1" / "run" / "last.msgpack").exists()

    outs = run_two(["--epochs=4", "--resume=true"])
    for pid, out in enumerate(outs):
        assert "resumed from epoch 1" in out, f"proc {pid}:\n{out[-2000:]}"
    log = pd.read_csv(tmp_path / "out0" / "run" / "log.csv")
    assert list(log["epoch"]) == [0, 1, 2, 3]


def test_two_process_tensor_parallel_matches_single_process(tmp_path):
    """Tensor parallelism across processes: a {'data': 1, 'model': 2} mesh
    spanning two hosts shards conv out-channels + optimizer state over the
    cross-process backend, and must reproduce the single-process losses
    (the activation collectives are numerically transparent)."""
    import socket
    import subprocess
    import sys as _sys

    import cv2
    import pandas as pd

    rng = np.random.default_rng(9)
    img_dir = tmp_path / "inputs" / "synth" / "images"
    mask_dir = tmp_path / "inputs" / "synth" / "masks" / "0"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    for i in range(12):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        yy, xx = np.mgrid[0:32, 0:32]
        cy, cx = rng.integers(10, 22, 2)
        mask = (((yy - cy) ** 2 + (xx - cx) ** 2) < 25).astype(np.uint8) * 255
        img[mask > 0] = 220
        cv2.imwrite(str(img_dir / f"im{i:02d}.png"), img)
        cv2.imwrite(str(mask_dir / f"im{i:02d}.png"), mask)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def args(name, extra):
        return [_sys.executable, os.path.join(os.path.dirname(__file__),
                                              "..", "train.py"),
                f"--data_dir={tmp_path / 'inputs'}",
                f"--output_dir={tmp_path / name}",
                "--dataset=synth", "--arch=UNet", "--name=run",
                "--input_w=32", "--input_h=32", "--epochs=2", "--batch_size=8",
                "--optimizer=Adam", "--precision=fp32",
                "--platform=cpu"] + extra

    env = {k: v for k, v in os.environ.items() if k != "JAX_NUM_PROCESSES"}
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    procs = []
    try:
        for pid in range(2):
            e = dict(env, JAX_PROCESS_ID=str(pid))
            procs.append(subprocess.Popen(
                args("tp_mh", ["--mesh=data=1,model=2"]), env=e,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    assert "mesh: {'data': 1, 'model': 2}" in outs[0]

    sp = subprocess.run(args("tp_sp", ["--mesh=data=1"]), env=dict(os.environ),
                        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                        text=True, timeout=900)
    assert sp.returncode == 0, sp.stdout[-3000:]
    a = pd.read_csv(tmp_path / "tp_mh" / "run" / "log.csv")
    b = pd.read_csv(tmp_path / "tp_sp" / "run" / "log.csv")
    for col in ("loss", "val_loss"):
        np.testing.assert_allclose(a[col], b[col], rtol=2e-4, atol=2e-5,
                                   err_msg=col)
    for col in ("iou", "val_iou"):  # thresholded metric: ulp drift flips pixels
        np.testing.assert_allclose(a[col], b[col], atol=0.02, err_msg=col)
