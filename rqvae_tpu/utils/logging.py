"""Metrics sinks: stdout JSONL (always) + optional TensorBoard.

Parity: the reference logs to SwanLab behind an opt-in config flag
(reference train_rqvae.py:102-106, train_decoder.py:81-85). Here the default
sink is machine-readable JSONL on stdout/file — the same metric names and
semantics — and ``sink="tensorboard"`` additionally streams every scalar to
a TensorBoard event file (torch.utils.tensorboard writer; no torch autograd
involvement — it is a pure event-file encoder). The JSONL stream is never
disabled: it is the parity contract and what the tests parse.
"""
from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional

SINKS = ("jsonl", "tensorboard")


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None,
                 every: int = 1, sink: str = "jsonl",
                 tensorboard_dir: Optional[str] = None):
        assert sink in SINKS, f"unknown metrics sink {sink!r} (use {SINKS})"
        self._file = open(path, "a") if path else None
        self._stream = stream if stream is not None else sys.stdout
        self._every = max(1, every)
        self._t0 = time.monotonic()
        self._tb = None
        if sink == "tensorboard":
            from torch.utils.tensorboard import SummaryWriter

            import os

            tb_dir = tensorboard_dir or (
                os.path.join(os.path.dirname(path), "tb") if path else "tb"
            )
            self._tb = SummaryWriter(log_dir=tb_dir)

    def log(self, step: int, metrics: dict, force: bool = False) -> None:
        if not force and step % self._every:
            return
        record = {
            "step": int(step),
            "wall_s": round(time.monotonic() - self._t0, 3),
            **{k: _jsonable(v) for k, v in metrics.items()},
        }
        line = json.dumps(record)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        else:
            print(line, file=self._stream, flush=True)
        if self._tb is not None:
            for k, v in record.items():
                if k != "step" and isinstance(v, float):
                    self._tb.add_scalar(k, v, global_step=int(step))

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb is not None:
            self._tb.close()


def _jsonable(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)
