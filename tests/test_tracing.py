"""Tracing/metrics utility tests."""

import json

from qwen3_asr_rs_tpu.utils.tracing import Timings, dump_metrics, stage_timer


def test_stage_timer_accumulates():
    t = Timings()
    with stage_timer("alpha", t):
        pass
    with stage_timer("alpha", t):
        pass
    with stage_timer("beta", t):
        pass
    assert t.counts["alpha"] == 2
    assert t.counts["beta"] == 1
    assert "alpha" in t.summary()


def test_dump_metrics(tmp_path):
    with stage_timer("gamma_stage"):
        pass
    out = tmp_path / "m.json"
    data = dump_metrics(str(out))
    assert "gamma_stage" in data
    on_disk = json.loads(out.read_text())
    assert on_disk["gamma_stage"]["count"] >= 1
