"""Full CLI pipeline end to end, offline: HF dir (+fast tokenizer built
from scratch) -> awq search -> real quant -> dump -> reload -> local-corpus
perplexity. This is the P1 driver flow (`awq/entry.py` §3.1 + §3.2) in one
test."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from awq_tpu.entry import main  # noqa: E402


def _make_tokenizer(tmp):
    """Char-level fast tokenizer built offline via `tokenizers`."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(i): i for i in range(32, 127)}
    vocab["<unk>"] = 127
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<unk>"
    )
    fast.save_pretrained(tmp)
    return fast


def test_cli_full_pipeline(tmp_path):
    d = str(tmp_path / "hf")
    os.makedirs(d)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).save_pretrained(d)
    _make_tokenizer(d)

    awq_path = str(tmp_path / "awq.pkl")
    ckpt = str(tmp_path / "ckpt-w4")
    corpus = str(tmp_path / "corpus.txt")
    with open(corpus, "w") as f:
        f.write("the quick brown fox jumps over the lazy dog. " * 300)

    # search + dump
    assert main([
        "--model_path", d, "--dtype", "float32",
        "--w_bit", "4", "--q_group_size", "32",
        "--run_awq", "--dump_awq", awq_path,
        "--calib_data", "synthetic", "--n_samples", "2",
        "--calib_block_size", "32",
    ]) == 0
    assert os.path.exists(awq_path)

    # apply + real quant + dump
    assert main([
        "--model_path", d, "--dtype", "float32",
        "--w_bit", "4", "--q_group_size", "32",
        "--load_awq", awq_path, "--q_backend", "real",
        "--dump_quant", ckpt,
    ]) == 0
    assert os.path.exists(ckpt + ".safetensors")

    # reload + local-corpus ppl
    assert main([
        "--load_quant", ckpt, "--model_path", d,
        "--tasks", "wikitext", "--eval_corpus", corpus,
        "--eval_seqlen", "64", "--eval_windows", "2",
    ]) == 0


def test_cli_mesh_shards_eval(tmp_path, monkeypatch):
    """--mesh 1,8 must actually change parameter placement for the eval
    (the TPU counterpart of the reference's accelerate dispatch,
    awq/entry.py:166-186)."""
    import jax
    import awq_tpu.parallel as par
    from awq_tpu.config import ModelConfig, QuantConfig
    from awq_tpu.models import init_params, quantize_params
    from awq_tpu.utils.checkpoint import save_checkpoint

    d = str(tmp_path / "tok")
    os.makedirs(d)
    _make_tokenizer(d)
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
        max_position_embeddings=256, dtype="float32",
    )
    qcfg = QuantConfig(w_bit=4, group_size=32)
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(0)), qcfg)
    ckpt = str(tmp_path / "ckpt-w4")
    save_checkpoint(ckpt, params, cfg, qcfg)
    corpus = str(tmp_path / "corpus.txt")
    with open(corpus, "w") as f:
        f.write("pack my box with five dozen liquor jugs. " * 200)

    seen = {}
    real_shard = par.shard_params

    def spy(p, mesh):
        out = real_shard(p, mesh)
        qw = out["layers"]["wq"].qweight
        seen["n_dev"] = len(qw.sharding.device_set)
        seen["spec"] = tuple(qw.sharding.spec)
        return out

    monkeypatch.setattr(par, "shard_params", spy)
    assert main([
        "--load_quant", ckpt, "--model_path", d,
        "--tasks", "wikitext", "--eval_corpus", corpus,
        "--eval_seqlen", "64", "--eval_windows", "1",
        "--mesh", "1,8",
    ]) == 0
    assert seen["n_dev"] == 8, seen
    assert "tp" in seen["spec"], seen  # qweight OC axis is tensor-sharded


def test_cli_fake_vs_real_backend_consistency(tmp_path, capsys):
    """--q_backend fake and real must report (nearly) the same ppl: the
    pseudo-quantized weights ARE the dequantized packed weights, so any
    systematic gap means the runtime kernels diverge from the quant math
    (the reference's implicit kernel test, SURVEY §4)."""
    import re

    d = str(tmp_path / "hf")
    os.makedirs(d)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    transformers.LlamaForCausalLM(cfg).save_pretrained(d)
    _make_tokenizer(d)
    corpus = str(tmp_path / "corpus.txt")
    with open(corpus, "w") as f:
        f.write("pack my box with five dozen liquor jugs. " * 300)
    awq_path = str(tmp_path / "awq.pkl")

    assert main([
        "--model_path", d, "--dtype", "float32",
        "--w_bit", "4", "--q_group_size", "32",
        "--run_awq", "--dump_awq", awq_path,
        "--calib_data", "synthetic", "--n_samples", "2",
        "--calib_block_size", "32",
    ]) == 0
    capsys.readouterr()

    def ppl_of(backend):
        assert main([
            "--model_path", d, "--dtype", "float32",
            "--w_bit", "4", "--q_group_size", "32",
            "--load_awq", awq_path, "--q_backend", backend,
            "--tasks", "wikitext", "--eval_corpus", corpus,
            "--eval_seqlen", "64", "--eval_windows", "2",
        ]) == 0
        out = capsys.readouterr().out
        m = re.search(r"wikitext-2 ppl = ([0-9.]+)", out)
        assert m, out
        return float(m.group(1))

    fake = ppl_of("fake")
    real = ppl_of("real")
    assert np.isclose(fake, real, rtol=2e-3), (fake, real)
