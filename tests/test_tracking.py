"""Tracking fan-out logger: backend selection, graceful degradation, and
config flattening (verl utils/tracking.py:24-117 parity)."""
import json

from vla_rft_tpu.utils.tracking import Tracking, _flatten, reduce_metrics


def test_unknown_and_missing_backends_degrade(capsys):
    t = Tracking("p", "e", ["console", "mlflow", "swanlab", "bogus"], config={"a": 1})
    t.log({"m": 1.0}, 3)
    t.finish()
    out = capsys.readouterr().out
    assert "[step 3] m:1" in out
    assert "unavailable" in out or "skipping" in out


def test_jsonl_backend_roundtrip(tmp_path):
    t = Tracking("p", "exp", ["jsonl"], log_dir=str(tmp_path))
    t.log({"loss": 0.5, "note": "x"}, 7)
    t.finish()
    rec = json.loads((tmp_path / "exp.jsonl").read_text().strip())
    assert rec["step"] == 7 and rec["loss"] == 0.5


def test_flatten_nested_config():
    flat = _flatten({"a": {"b": 1, "c": {"d": 2}}, "e": 3})
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}


def test_reduce_metrics_lists_and_scalars():
    out = reduce_metrics({"a": [1.0, 3.0], "b": 2, "c": "skip-me"})
    assert out["a"] == 2.0 and out["b"] == 2.0 and "c" not in out
