"""Profiler + CLI glue coverage."""

import time

from tinychatengine_tpu.chat import _gen_config
from tinychatengine_tpu.utils.profiler import Profiler


def test_profiler_sections_and_turn_report():
    p = Profiler()
    with p.section("decode", flops=1e9):
        time.sleep(0.01)
    with p.section("decode", flops=1e9):
        time.sleep(0.01)
    rep = p.report()
    assert "decode" in rep and "GOPs" in rep
    turn = p.report_turn(2)
    assert "ms/token" in turn and "2 tokens" in turn
    p.ttft_s = 0.123
    assert "TTFT 123 ms" in p.report_turn(2)
    p.reset()
    assert p.report_turn(2) == "Inference latency: n/a"


def test_family_generation_defaults():
    """chat.cc per-family defaults (chat.cc:245-251,372-381,525-530)."""
    assert _gen_config("llama3_8b").temp == 0.7
    assert _gen_config("llama2_7b").temp == 0.2
    assert _gen_config("mistral_7b").temp == 0.3
    assert _gen_config("starcoder_15.5b").top_k == 0
    assert _gen_config("opt_6.7b").temp == _gen_config("unknown").temp
