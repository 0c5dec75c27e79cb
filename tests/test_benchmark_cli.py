"""benchmark CLI smoke tests on the virtual CPU mesh (the perf numbers
come from the real chip; here the harnesses must build, shard, run)."""

import pytest

pytestmark = pytest.mark.heavy


def test_benchmark_scaling_mode(capsys):
    """--mode scaling: tp=1 vs tp=2 decode through the TP deploy layout
    (the BASELINE north-star measurement harness — numbers are
    meaningful on real multi-chip ICI; here it must compile + execute)."""
    from awq_tpu.benchmark import main

    assert main([
        "--geometry", "tiny", "--mode", "scaling", "--tp_max", "2",
        "--steps", "2", "--runs", "1", "--max_seq_len", "512",
        "--context", "4",
    ]) == 0
    out = capsys.readouterr().out
    assert "scaling tp=1" in out and "scaling tp=2" in out
    assert "efficiency" in out


def test_benchmark_decode_with_mesh(capsys):
    """--mesh 1,2 single-stream decode through the deploy layout."""
    from awq_tpu.benchmark import main

    assert main([
        "--geometry", "tiny", "--mode", "decode", "--mesh", "1,2",
        "--steps", "2", "--runs", "1", "--max_seq_len", "512",
        "--context", "4",
    ]) == 0
    out = capsys.readouterr().out
    assert "decode:" in out
