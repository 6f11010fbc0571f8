"""Structured logging for the CLI jobs.

The reference logs via bare print() statements scattered through the
job scripts (reference: src/download_and_predict_job.py:1086,2069 and
throughout). Here every job funnels through ``setup_logging``, which
emits either human-readable lines (default) or machine-parseable JSON
lines (``TTC_LOG_FORMAT=json`` or ``setup_logging(json_lines=True)``)
suitable for fleet-level aggregation (CloudWatch/Stackdriver ingest of
the per-instance logs the fleet supervisor tails).

JSON records carry: ts (unix float), level, logger, msg (formatted),
plus any ``extra={"ttc": {...}}`` dict merged at the top level — the
StageTimer report uses this to emit per-stage timings as data rather
than a pretty-printed block.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        out = {
            "ts": round(record.created, 3),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        ttc_extra = getattr(record, "ttc", None)
        if isinstance(ttc_extra, dict):
            out.update(ttc_extra)
        if record.exc_info:
            out["exc"] = self.formatException(record.exc_info)
        return json.dumps(out)


def setup_logging(level: int = logging.INFO,
                  json_lines: bool | None = None,
                  stream=None) -> None:
    """Configure the root logger once per process.

    json_lines=None reads TTC_LOG_FORMAT (``json`` -> JSON lines,
    anything else -> human). Idempotent: repeated calls reconfigure
    the handler rather than stacking duplicates.
    """
    if json_lines is None:
        json_lines = os.environ.get("TTC_LOG_FORMAT", "").lower() == "json"

    root = logging.getLogger()
    root.setLevel(level)
    for h in list(root.handlers):
        if getattr(h, "_ttc_handler", False):
            root.removeHandler(h)
    handler = logging.StreamHandler(stream or sys.stderr)
    handler._ttc_handler = True
    if json_lines:
        handler.setFormatter(JsonFormatter())
    else:
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s",
            datefmt="%H:%M:%S"))
    root.addHandler(handler)
    # basicConfig in library callers becomes a no-op now that a handler
    # exists, so double-configuration can't duplicate lines.


def log_event(logger: logging.Logger, msg: str, **fields) -> None:
    """Log with structured fields (flattened into JSON records)."""
    fields.setdefault("event_ts", round(time.time(), 3))
    logger.info(msg, extra={"ttc": fields})
