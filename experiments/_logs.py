"""Shared helpers for the experiments/ report scripts.

These scripts run as ``python experiments/<script>.py`` (sys.path[0] is
experiments/), so siblings import this module directly: ``from _logs
import json_lines``.
"""
from __future__ import annotations

import json


def json_lines(path):
    """Yield the JSON records in a mixed log file (progress lines, tracebacks
    and other non-JSON noise from the train loops / queue runner skipped)."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue
