"""AsyncCheckpointer: overlapped checkpoint writes (TPU-production addition;
the reference's Lightning/torch.save paths block the step loop)."""
import json
import os
import threading
import time

import numpy as np
import pytest

from vavae_tpu.train import checkpoint as ckpt_lib


def _state():
    return {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.asarray(5, np.int32)}


def test_save_overlaps_and_wait_is_durable(tmp_path, monkeypatch):
    gate = threading.Event()
    real = ckpt_lib._write_state_file

    def gated(path, host_state):
        gate.wait(timeout=30)
        real(path, host_state)

    monkeypatch.setattr(ckpt_lib, "_write_state_file", gated)
    w = ckpt_lib.AsyncCheckpointer()
    path = w.save(str(tmp_path), 5, _state())
    # returned immediately; write is parked behind the gate
    assert path.endswith("0000005.safetensors")
    assert not os.path.exists(path)
    gate.set()
    w.wait()
    assert os.path.exists(path)
    restored = ckpt_lib.restore_checkpoint(path, _state())
    np.testing.assert_array_equal(restored["params"]["w"],
                                  np.arange(6, dtype=np.float32).reshape(2, 3))


def test_snapshot_is_consistent_despite_later_mutation(tmp_path, monkeypatch):
    """The host snapshot happens in save(); mutating the live arrays while
    the write is in flight must not leak into the file (donated-buffer
    semantics of the jitted step)."""
    gate = threading.Event()
    real = ckpt_lib._write_state_file
    monkeypatch.setattr(
        ckpt_lib, "_write_state_file",
        lambda p, s: (gate.wait(timeout=30), real(p, s))[-1])
    state = _state()
    w = ckpt_lib.AsyncCheckpointer()
    path = w.save(str(tmp_path), 5, state)
    state["params"]["w"][:] = -1  # trainer reuses the buffer
    gate.set()
    w.wait()
    restored = ckpt_lib.restore_checkpoint(path, _state())
    np.testing.assert_array_equal(restored["params"]["w"],
                                  np.arange(6, dtype=np.float32).reshape(2, 3))


def test_on_complete_runs_after_durable_write(tmp_path):
    w = ckpt_lib.AsyncCheckpointer()
    seen = {}

    def record():
        # the checkpoint file must already be in place (resume bookkeeping
        # may never outrun its checkpoint)
        seen["exists"] = os.path.exists(
            os.path.join(tmp_path, "0000005.safetensors"))
        with open(os.path.join(tmp_path, "epoch.json"), "w") as f:
            json.dump({"epochs_done": 1}, f)

    w.save(str(tmp_path), 5, _state(), config={"a": 1}, on_complete=record)
    w.wait()
    assert seen["exists"] is True
    assert json.load(open(tmp_path / "epoch.json"))["epochs_done"] == 1
    assert json.load(open(tmp_path / "config.json"))["a"] == 1


def test_writer_error_surfaces_on_next_call(tmp_path, monkeypatch):
    def boom(path, host_state):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt_lib, "_write_state_file", boom)
    w = ckpt_lib.AsyncCheckpointer()
    w.save(str(tmp_path), 1, _state())
    with pytest.raises(OSError, match="disk full"):
        w.wait()
    # error is cleared after being raised once
    monkeypatch.setattr(ckpt_lib, "_write_state_file",
                        lambda p, s: None)
    w.save(str(tmp_path), 2, _state())
    w.wait()


def test_second_save_drains_first(tmp_path, monkeypatch):
    order = []
    real = ckpt_lib._write_state_file

    def slow(path, host_state):
        time.sleep(0.1)
        order.append(os.path.basename(path))
        real(path, host_state)

    monkeypatch.setattr(ckpt_lib, "_write_state_file", slow)
    w = ckpt_lib.AsyncCheckpointer()
    w.save(str(tmp_path), 1, _state())
    w.save(str(tmp_path), 2, _state())  # must block until save 1 lands
    w.wait()
    assert order == ["0000001.safetensors", "0000002.safetensors"]
    assert ckpt_lib.latest_checkpoint(str(tmp_path)).endswith("0000002.safetensors")
