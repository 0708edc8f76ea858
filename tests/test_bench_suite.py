"""Smoke the bench suite: every sub-benchmark runs and emits valid JSON.

Guards bench.py --all against bit-rot (it is not otherwise exercised in
CI); tiny sizes so this stays cheap on CPU. The headline bench_jax path is
covered indirectly through the fused-step tests.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _lines(capsys):
    # generation prints progress lines ("Successfully saved midi file");
    # only the JSON metric lines matter here
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
           if l.startswith("{")]
    for rec in out:
        assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
        assert rec["value"] > 0
    return {r["metric"]: r for r in out}


def test_bench_des_emits_json(capsys):
    bench.bench_des(customers=1500)
    recs = _lines(capsys)
    assert "des_engine_customers_per_sec_logged" in recs


def test_bench_mel_and_roll_emit_json(capsys):
    bench.bench_mel()
    bench.bench_roll(B=2, E=64)
    recs = _lines(capsys)
    assert recs["mel_5s_216f_ms"]["unit"] == "ms"
    assert recs["piano_roll_ms_per_roll"]["unit"] == "ms"


def test_bench_host_stage_emits_json(capsys):
    bench.bench_host_stage(B=2)
    recs = _lines(capsys)
    assert recs["mmgan_host_stage_s_per_batch"]["unit"] == "s"


def test_bench_serving_emits_json(capsys):
    bench.bench_serving(n_requests=2)
    recs = _lines(capsys)
    assert recs["serve_warm_latency_p50_s"]["unit"] == "s"
