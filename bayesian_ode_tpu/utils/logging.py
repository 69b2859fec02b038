"""Structured JSONL run logging.

Replaces the reference's per-iteration prints and `arr_closure` list
callbacks (langevin.py:124-127, gp.py:355-357) with machine-readable
records; one JSON object per line.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self._fh = None
        if path is not None:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")

    def log(self, record: Dict[str, Any]):
        record = {"ts": time.time(), **record}
        line = json.dumps(record, default=_jsonable)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line)

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _jsonable(x):
    try:
        import numpy as np

        arr = np.asarray(x)
        if arr.ndim == 0:
            return arr.item()
        return arr.tolist()
    except Exception:
        return float(x)
