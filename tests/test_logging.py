"""Structured logging: JSON-lines mode, extra-field merge, idempotent
reconfiguration (reference has print()-based logging only —
src/download_and_predict_job.py:1086,2069)."""
import io
import json
import logging

from ttc.utils.logging import log_event, setup_logging


def _capture(json_lines):
    buf = io.StringIO()
    setup_logging(json_lines=json_lines, stream=buf)
    return buf


def test_json_lines_record_fields():
    buf = _capture(True)
    log = logging.getLogger("ttc.test")
    log.info("tile %s done", "3X7Y")
    rec = json.loads(buf.getvalue().strip())
    assert rec["msg"] == "tile 3X7Y done"
    assert rec["level"] == "INFO"
    assert rec["logger"] == "ttc.test"
    assert isinstance(rec["ts"], float)


def test_log_event_merges_fields():
    buf = _capture(True)
    log_event(logging.getLogger("ttc.test"), "stage done",
              stage="ard", seconds=12.5)
    rec = json.loads(buf.getvalue().strip())
    assert rec["stage"] == "ard"
    assert rec["seconds"] == 12.5


def test_stagetimer_report_is_structured():
    from ttc.utils.profiling import StageTimer

    buf = _capture(True)
    timer = StageTimer("unit")
    timer.record("ard", 1.25)
    timer.record("predict", 0.5)
    timer.log_report()
    rec = json.loads(buf.getvalue().strip())
    assert rec["timer"] == "unit"
    assert rec["stages_s"] == {"ard": 1.25, "predict": 0.5}
    assert rec["counts"] == {"ard": 1, "predict": 1}


def test_reconfigure_does_not_stack_handlers():
    buf1 = _capture(True)
    buf2 = _capture(False)
    log = logging.getLogger("ttc.test")
    log.info("only once")
    assert buf1.getvalue() == ""          # old handler removed
    assert buf2.getvalue().count("only once") == 1
    # restore default for other tests
    setup_logging(json_lines=False)
