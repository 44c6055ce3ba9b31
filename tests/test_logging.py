"""Metrics sinks (VERDICT r2 item 7 — the reference's opt-in swanlab
analog, reference train_rqvae.py:102-106): JSONL default unchanged,
``sink="tensorboard"`` adds a TB event stream without touching JSONL."""
import io
import json
import os

import pytest

from rqvae_tpu.utils.logging import MetricsLogger


def test_jsonl_default(tmp_path):
    p = tmp_path / "m.jsonl"
    lg = MetricsLogger(path=str(p), every=2)
    lg.log(2, {"loss": 1.5})
    lg.log(3, {"loss": 9.0})   # skipped (every=2)
    lg.log(3, {"loss": 2.5}, force=True)
    lg.close()
    recs = [json.loads(x) for x in p.read_text().splitlines()]
    assert [r["loss"] for r in recs] == [1.5, 2.5]
    assert recs[0]["step"] == 2


def test_tensorboard_sink_writes_event_file(tmp_path):
    tb = tmp_path / "tb"
    lg = MetricsLogger(
        stream=io.StringIO(), sink="tensorboard", tensorboard_dir=str(tb)
    )
    lg.log(1, {"loss": 1.0, "note": "a-string"})
    lg.log(2, {"loss": 0.5})
    lg.close()
    files = os.listdir(tb)
    assert any(f.startswith("events.out.tfevents") for f in files)
    # the scalars are really in the event file
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tb))
    acc.Reload()
    vals = acc.Scalars("loss")
    assert [(v.step, v.value) for v in vals] == [(1, 1.0), (2, 0.5)]


def test_tensorboard_dir_defaults_next_to_jsonl(tmp_path):
    p = tmp_path / "logs" / "m.jsonl"
    os.makedirs(p.parent)
    lg = MetricsLogger(path=str(p), sink="tensorboard")
    lg.log(1, {"x": 1.0})
    lg.close()
    assert os.path.isdir(tmp_path / "logs" / "tb")
    assert json.loads(p.read_text())["x"] == 1.0


def test_unknown_sink_rejected():
    with pytest.raises(AssertionError):
        MetricsLogger(sink="swanlab")
