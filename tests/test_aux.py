"""Aux subsystem tests: profiling timers, host collectives (single
process), checkpoint manifest behavior, config round-trip."""

import time

import numpy as np

from icka_tpu.core.checkpoint import Checkpointer
from icka_tpu.core.config import (
    EncoderConfig,
    ICKAConfig,
    TrainConfig,
    from_json,
    to_json,
)
from icka_tpu.core.profiling import StepTimer, annotate, trace
from icka_tpu.parallel.collectives import (
    all_gather_objects,
    broadcast_object,
    psum_across_hosts,
)


def test_step_timer_excludes_compile():
    t = StepTimer(skip_first=1)
    t.step(10)          # "compile" step, excluded
    t.step(10)          # starts the clock
    time.sleep(0.05)
    t.step(10)
    assert 0 < t.items_per_sec < 10 / 0.045


def test_trace_noop_and_annotate():
    with trace(None):
        with annotate("region"):
            pass  # must not raise


def test_collectives_single_process():
    assert all_gather_objects({"a": 1}) == [{"a": 1}]
    assert broadcast_object("x") == "x"
    np.testing.assert_array_equal(psum_across_hosts(np.arange(3)),
                                  np.arange(3))


def test_config_json_roundtrip():
    cfg = ICKAConfig.tiny()
    text = to_json(cfg)
    back = from_json(ICKAConfig, text)
    assert back == cfg
    assert isinstance(back.embedding, EncoderConfig)
    t = TrainConfig(learning_rate=1e-4)
    assert from_json(TrainConfig, to_json(t)) == t


def test_checkpointer_keep_n(tmp_path):
    import jax.numpy as jnp
    ck = Checkpointer(str(tmp_path), keep_n=2)
    state = {"w": jnp.ones(3)}
    for step in range(4):
        ck.save(state, step=step)
    assert ck.manifest["steps"] == [2, 3]
    import os
    files = os.listdir(tmp_path)
    assert "state_step3.msgpack" in files
    assert "state_step0.msgpack" not in files
    restored, step = ck.resume({"w": jnp.zeros(3)})
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones(3))
