"""Metric logging sinks.

The reference logs through Lightning's ``self.log_dict`` into injected
loggers (TensorBoard; SURVEY §5). Here: composable host-side sinks fed by
the training loop's ``log_fn`` — JSONL (machine-readable run history), CSV,
and stdout pretty-printing. Keys follow the reference naming
(``train/<name>``, ``val/<name>``).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


def _scalar(v):
    try:
        return round(float(v), 6)
    except (TypeError, ValueError):
        return str(v)


class JSONLLogger:
    """One JSON object per record, appended to a file."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._t0 = time.time()

    def __call__(self, record: dict) -> None:
        out = {"wall_time": round(time.time() - self._t0, 3)}
        out.update({k: _scalar(v) for k, v in record.items()})
        with self.path.open("a") as f:
            f.write(json.dumps(out) + "\n")


class CSVLogger:
    """Wide CSV with a stable, growing header."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._columns: list[str] = []
        self._rows: list[dict] = []

    def __call__(self, record: dict) -> None:
        row = {k: _scalar(v) for k, v in record.items()}
        self._rows.append(row)
        for k in row:
            if k not in self._columns:
                self._columns.append(k)
        with self.path.open("w") as f:
            f.write(",".join(self._columns) + "\n")
            for r in self._rows:
                f.write(",".join(str(r.get(c, "")) for c in self._columns) + "\n")


class StdoutLogger:
    def __init__(self, stream=None):
        self.stream = stream or sys.stdout

    def __call__(self, record: dict) -> None:
        parts = [f"{k}={_scalar(v)}" for k, v in record.items()]
        print("  ".join(str(p) for p in parts), file=self.stream)


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = loggers

    def __call__(self, record: dict) -> None:
        for lg in self.loggers:
            lg(record)
